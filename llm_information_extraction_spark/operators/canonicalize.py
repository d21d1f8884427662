"""Canonicalization: connected components over the alias-similarity graph.

The reference's canonical maps (evaluation_gpt4_vs_gpt5.py:99-127) are a
hand-maintained union-find: alias → canonical. At corpus scale the same
structure is the transitive closure of the alias edge list (exact map
edges + fuzzy ≥0.95 links), i.e. connected components. We compute them
with the **large-star / small-star** alternating DataFrame-join algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
— a published public algorithm), which converges in O(log² n) rounds and
needs only groupBy/join primitives:

- large-star: every node connects its *larger* neighbors to its current
  minimum neighbor;
- small-star: every node connects its *smaller-or-equal* neighbors to the
  minimum.

Each round is one shuffle; ``localCheckpoint`` truncates the lineage so
the plan doesn't grow across iterations (SURVEY §4 requirement). Node ids
are strings (entity surfaces); ordering is lexicographic, so the
component representative — the entity id — is the lexicographically
smallest member, which is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ensure_checkpoint_dir(sc, checkpoint_dir: str) -> None:
    """Point the context's reliable-checkpoint directory at
    ``checkpoint_dir`` unless it already is.

    ``setCheckpointDir`` is CONTEXT-WIDE state: every job sharing the
    SparkContext checkpoints under the new directory for the rest of its
    lifetime. Callers (CC, PageRank) accept that — the docstrings say
    so — but repeated calls with the same path must not keep re-pointing
    it: Spark materializes a fresh UUID subdirectory per call, so the
    check compares the requested path against the PARENT of the current
    (qualified) checkpoint dir. The requested path is fully QUALIFIED
    through the Hadoop FileSystem first (scheme + authority), so the
    same path string on a different filesystem — ``/x`` local vs
    ``hdfs:///x`` — is correctly treated as different and re-pointed.
    """
    cur = sc.getCheckpointDir()  # e.g. 'file:/x/y/<uuid>' or None
    if cur is not None:
        jvm = sc._jvm
        want_p = jvm.org.apache.hadoop.fs.Path(checkpoint_dir)
        want_q = str(
            want_p.getFileSystem(sc._jsc.hadoopConfiguration()).makeQualified(
                want_p
            )
        )
        parent = cur.rstrip("/").rsplit("/", 1)[0]
        if parent.rstrip("/") == want_q.rstrip("/"):
            return
    sc.setCheckpointDir(checkpoint_dir)


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected, deduped, self-loop-free (src < dst) edge list."""
    e = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return e.filter(F.col("src") != F.col("dst")).dropDuplicates()


def _edge_stats(e: DataFrame) -> tuple:
    """(count, order-independent checksum) of the edge set — one job.

    Equal stats between rounds ⟺ the edge set is stable (up to a ~2⁻⁶⁴
    checksum collision; the alternation is monotone, so a collision
    would only end one round early on an already-star-shaped graph).
    Replaces the two ``exceptAll().limit(1).count()`` jobs per round the
    round-1 convergence check ran.
    """
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: order-independent and overflow-free under
        # ANSI mode (a plain long sum of 2⁶³-scale hashes overflows)
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("chk"),
    ).first()
    return (row["n"], row["chk"])


def _local_components(spark, edge_rows) -> DataFrame:
    """Driver-side union-find over a BOUNDED edge list (the small-graph
    fast path of :func:`connected_components`). Min-root union keeps
    every set's root at its lexicographically smallest node id, so the
    output is identical to the distributed large-star/small-star result:
    (node, component = min id in the component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    return spark.createDataFrame(rows, "node string, component string")


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    local_threshold: int = 100_000,
) -> DataFrame:
    """edges(src string, dst string) → (node string, component string).

    component = min node id in the component. Isolated nodes (no edges)
    are the caller's concern — join the result back with a coalesce.

    ``local_threshold``: a graph with at most this many DISTINCT edges
    is solved by driver-side union-find instead of the iterative
    star-contraction loop. Each distributed round costs several
    shuffles plus a checkpoint, which only pays off on graphs too big
    to hold in driver memory; below the threshold (100k edges ≈ a few
    MB of short ids — broadcast-build scale, not a corpus collect) the
    local path returns identical components in milliseconds. The check
    is a bounded ``limit(threshold+1)`` read of the already-materialized
    canonical edge set, so huge graphs pay one short-circuiting scan,
    not a count. 0 disables (always iterate — used by tests to pin the
    distributed path).

    ``checkpoint_dir``: when set (a cluster-visible path, e.g. HDFS/S3),
    per-round lineage truncation uses reliable ``checkpoint()`` instead of
    ``localCheckpoint()`` — local checkpoint blocks die with their
    executor, so on a multi-hour CC run one lost executor would restart
    the whole loop. Local (the default) is right for single-node runs.
    NOTE: setting it re-points the SparkContext's checkpoint directory,
    which is CONTEXT-WIDE — other jobs on the shared context checkpoint
    there afterwards (skipped when the context already points at the
    requested path).
    """
    if checkpoint_dir is not None:
        _ensure_checkpoint_dir(
            edges.sparkSession.sparkContext, checkpoint_dir
        )

    def _ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = _ckpt(_canonical_edges(edges))
    if local_threshold:
        # ONE bounded read decides empty/local/distributed (round 6:
        # the separate isEmpty() job was redundant — an empty head IS
        # the empty check on this path)
        head = e.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            # the checkpointed edge blocks have no reader after this
            # point — release them now (streaming dedup calls CC every
            # micro-batch; waiting for driver GC would accumulate one
            # materialized edge set per batch in the block manager)
            e.unpersist()
            if not head:
                return edges.sparkSession.createDataFrame(
                    [], "node string, component string"
                )
            return _local_components(edges.sparkSession, head)
    elif e.isEmpty():
        spark = edges.sparkSession
        return spark.createDataFrame([], "node string, component string")

    prev_stats = _edge_stats(e)
    for _ in range(max_iterations):
        # -- large-star ----------------------------------------------------
        # neighborhoods in both directions
        nbrs = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = nbrs.groupBy("src").agg(F.min("dst").alias("m"))
        mins = mins.withColumn("m", F.least("src", "m"))
        large = (
            nbrs.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))  # larger neighbors only
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        e1 = _canonical_edges(large.union(e))

        # -- small-star ----------------------------------------------------
        nbrs = e1.union(
            e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = nbrs.groupBy("src").agg(F.min("dst").alias("m"))
        mins = mins.withColumn("m", F.least("src", "m"))
        small = (
            nbrs.join(mins, "src")
            .filter(F.col("dst") <= F.col("src"))  # smaller-or-equal neighbors
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        e2 = _ckpt(_canonical_edges(small.union(e1)))

        # converged when the edge set is a star forest pointing at minima
        # (stable between rounds) — one aggregate job, not two exceptAlls
        cur_stats = _edge_stats(e2)
        # e2 is materialized: the previous round's checkpoint blocks are
        # dead weight — release them or k iterations hold k edge-set
        # copies in the block manager (OOMs large graphs in local mode)
        e.unpersist()
        e = e2
        if cur_stats == prev_stats:
            break
        prev_stats = cur_stats

    # after convergence every edge is (member, component-min)
    nodes = e.select(F.col("dst").alias("node")).union(
        e.select(F.col("src").alias("node"))
    ).distinct()
    comp = e.union(e.select("dst", "src")).groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("component")
    )
    return (
        nodes.join(comp, "node", "left")
        .select(
            "node",
            F.least(F.coalesce("component", "node"), F.col("node")).alias("component"),
        )
    )


def resolve_entity_ids(
    triples: DataFrame, entities: DataFrame
) -> DataFrame:
    """Rewrite triple objects to entity ids (graph materialization step,
    SURVEY §2.7): join canonical object → entities(entity_id) per field.

    Non-vocabulary predicates (yes/no fields, free-text comparisons) keep
    their object as-is with a null entity_id. Broadcast join — entities
    is a dimension.
    """
    dim = F.broadcast(
        entities.select(
            F.col("field").alias("pred"),
            F.col("canonical").alias("__canon"),
            F.col("entity_id"),
        ).dropDuplicates(["pred", "__canon"])
    )
    return (
        triples.join(
            dim,
            (triples["pred"] == dim["pred"]) & (triples["obj"] == dim["__canon"]),
            "left",
        )
        .select(triples["doc_id"], triples["pred"], triples["obj"], "entity_id")
    )


def build_entities(
    vocab_df: DataFrame,
    fuzzy_links: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Materialize the ``entities`` table from alias edges.

    vocab_df: (field, surface, canonical) — each row is an edge
    surface↔canonical. fuzzy_links (optional): (field, surface, canonical,
    score) edges discovered by LSH linking. Output:

        entities(entity_id string, field string, canonical string,
                 aliases array<string>, n_aliases int)

    entity_id = lexicographically-smallest alias in the component, scoped
    per field (tract aliases never merge with disease aliases).
    """
    base = vocab_df.select("field", "surface", "canonical")
    if fuzzy_links is not None:
        base = base.unionByName(
            fuzzy_links.select("field", "surface", "canonical")
        )
    # scope components per field by prefixing node ids with the field
    edges = base.select(
        F.concat_ws("\x1f", "field", "surface").alias("src"),
        F.concat_ws("\x1f", "field", "canonical").alias("dst"),
    )
    cc = connected_components(edges, checkpoint_dir=checkpoint_dir)
    # isolated nodes (self-loop-only aliases, e.g. surface == canonical)
    # are dropped by CC; restore them with component = themselves
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    cc = all_nodes.join(cc, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
    members = cc.select(
        F.split_part("node", F.lit("\x1f"), F.lit(1)).alias("field"),
        F.split_part("node", F.lit("\x1f"), F.lit(2)).alias("alias"),
        F.split_part("component", F.lit("\x1f"), F.lit(2)).alias("entity_id"),
    )
    # representative canonical = the most frequent canonical among member
    # rows of vocab (deterministic tiebreak by value)
    canon_votes = base.join(
        members,
        (base["field"] == members["field"]) & (base["surface"] == members["alias"]),
    ).select(members["field"], "entity_id", base["canonical"])
    top_canon = (
        canon_votes.groupBy("field", "entity_id", "canonical")
        .count()
        .groupBy("field", "entity_id")
        .agg(
            F.max_by(
                "canonical", F.struct(F.col("count"), F.col("canonical"))
            ).alias("canonical")
        )
    )
    return (
        members.groupBy("field", "entity_id")
        .agg(F.array_sort(F.collect_set("alias")).alias("aliases"))
        .join(top_canon, ["field", "entity_id"], "left")
        .select(
            "entity_id",
            "field",
            F.coalesce("canonical", "entity_id").alias("canonical"),
            "aliases",
            F.size("aliases").alias("n_aliases"),
        )
    )
