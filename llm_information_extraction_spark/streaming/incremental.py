"""Incremental (streaming) triple extraction.

The reference is strictly batch (SURVEY §2: no streaming semantics), so
this is an *extension*: new document files landing in a directory are
extracted incrementally with Structured Streaming. The transformation
chain is byte-identical to the batch path — the same payload expressions
and the same mapInPandas extractor run inside ``foreachBatch``.

The sink is idempotent under micro-batch REPLAY, which foreachBatch does
not guarantee by itself: each batch overwrites its own
``batch_id=<N>`` partition directory, so a crash after the write but
before the checkpoint commit re-runs the batch into the same directory
instead of appending duplicates (the standard exactly-once foreachBatch
recipe). Readers get ``batch_id`` back as a discovered partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extraction import extract_triples
from ..operators.linking import link_mentions, vocabulary_df
from ..operators.payload import build_payload
from ..sources.synthetic import DOCUMENTS_SCHEMA


def incremental_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "full_text",
    available_now: bool = True,
):
    """Stream documents(doc_id, spans[]) parquet files → triples parquet.

    ``available_now=True`` processes the current backlog and stops
    (batch-equivalent semantics, used by tests); ``False`` runs
    continuously. Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    vdf = vocabulary_df(spark)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = link_mentions(
            extract_triples(build_payload(batch_df, mode=mode)), vdf
        )
        # overwrite-per-batch-directory = replay-idempotent commit
        triples.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )

    return _start_foreach(stream, process_batch, checkpoint_dir, available_now)


def incremental_unique_documents(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming CROSS-BATCH exact dedup: the stateful operator a 100 TB
    ingest pipeline runs in front of extraction.

    ``dropDuplicates`` on a streaming DataFrame keeps the seen-key set in
    the state store (checkpointed, survives restarts), so a document
    whose content fingerprint arrived in ANY earlier micro-batch is
    suppressed — not just within the batch. State holds only the 32-char
    fingerprint per distinct document, never text. The sink is Spark's
    transactional file sink (_spark_metadata commit log → exactly-once).

    Returns the StreamingQuery; output rows are (doc_id, fp, payload).
    """
    from ..functions.textmetrics import doc_fingerprint
    from ..operators.payload import build_payload

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    with_fp = build_payload(stream).select(
        "doc_id", doc_fingerprint("payload").alias("fp"), "payload"
    )
    unique = with_fp.dropDuplicates(["fp"])
    writer = (
        unique.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _sig_est_jaccard(a, b, num_hashes: int):
    """Signature-estimated Jaccard: fraction of matching minhash slots
    (unbiased estimator, stderr ≈ 1/sqrt(num_hashes))."""
    from pyspark.sql import functions as F

    matches = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return matches.cast("double") / num_hashes


def _read_store_older_than(
    spark: SparkSession, state_dir: str, batch_id: int
) -> DataFrame | None:
    """Read a batch_id-partitioned state store restricted to STRICTLY
    older batches (a replayed batch must never see its own rows), or
    None when the store doesn't exist yet (first batch).

    Only the path-missing case means "no store yet"; any other read
    failure (corrupt footer, permissions, botched compaction) must FAIL
    the batch so the checkpoint retries — swallowing it would silently
    disable cross-batch dedup. Shared by every streaming dedup variant
    so the error-class match lives in exactly one place.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    try:
        return spark.read.parquet(state_dir).filter(
            F.col("batch_id") < F.lit(batch_id)
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        return None


def _start_foreach(stream, process_batch, checkpoint_dir: str, available_now: bool):
    """Common foreachBatch writer tail for the streaming dedup ops."""
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_fuzzy_unique_documents(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    available_now: bool = True,
):
    """Streaming CROSS-BATCH near-duplicate (MinHash) dedup.

    Exact streaming dedup (:func:`incremental_unique_documents`) only
    catches byte-identical content; this operator suppresses a NEAR-dup
    arriving any number of micro-batches later. State is a compact
    on-disk signature store — (id, sig array<bigint>) parquet partitioned
    by batch_id: 64 longs per surviving doc, never text. Per micro-batch:

    1. sign incoming docs with the batch MinHash operators;
    2. within-batch: banded-bucket candidates → signature-estimated
       Jaccard ≥ threshold edges → connected components → keep min id;
    3. cross-batch: incoming buckets equi-join the store's buckets
       restricted to ``batch_id < current`` — a REPLAYED batch never
       sees its own signatures — estimate ≥ threshold drops the newcomer;
    4. survivors overwrite ``output/batch_id=N``; their signatures
       overwrite ``state/batch_id=N``. Both replay-idempotent (the
       standard exactly-once foreachBatch recipe).

    Similarity is the SIGNATURE estimate (matching-slot fraction): the
    store deliberately holds no text to re-verify against. Callers
    needing exact-Jaccard confirmation keep a doc store and run
    ``minhash_verified_pairs`` offline.

    At 100 TB the store is bucket-partitioned so step 3 prunes partitions
    instead of scanning all signatures; recomputing store buckets per
    batch is the local-mode simplification. Run
    :func:`compact_signature_store` periodically (between stream runs) to
    bound the partition count.
    """
    from pyspark.sql import functions as F

    from ..operators.canonicalize import connected_components
    from ..operators.dedup import _banded_buckets

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import minhash_signature, word_shingles

        docs = build_payload(batch_df).select("doc_id", "payload")
        # row-local HOF signatures: identical values to the explode+agg
        # path (same hash family), ~3x faster on the short documents of
        # a micro-batch, and zero shuffle (see minhash_signature's
        # measured crossover note — explode+agg wins only on large
        # corpora with big payloads)
        sig = docs.select(
            F.col("doc_id").alias("id"),
            minhash_signature(
                word_shingles("payload", n), num_hashes, seed
            ).alias("sig"),
        ).cache()
        buckets = _banded_buckets(sig, num_hashes, bands)

        # -- within-batch: est-Jaccard edges → CC → keep min id ------------
        cand = (
            buckets.alias("a")
            .join(
                buckets.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        edges = (
            cand.join(sig.withColumnsRenamed({"id": "id_a", "sig": "sig_a"}), "id_a")
            .join(sig.withColumnsRenamed({"id": "id_b", "sig": "sig_b"}), "id_b")
            .filter(
                _sig_est_jaccard(F.col("sig_a"), F.col("sig_b"), num_hashes)
                >= threshold
            )
            .select(
                F.col("id_a").cast("string").alias("src"),
                F.col("id_b").cast("string").alias("dst"),
            )
        )
        cc = connected_components(edges)
        in_batch_losers = cc.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        survivors = sig.join(
            in_batch_losers.withColumnsRenamed({"doc_id": "id"}), "id", "left_anti"
        )

        # -- cross-batch: store buckets (strictly older batches) ------------
        store = _read_store_older_than(spark, state_dir, batch_id)
        if store is not None and not store.isEmpty():
            old_sig = store.select("id", "sig")
            old_buckets = _banded_buckets(old_sig, num_hashes, bands)
            new_buckets = _banded_buckets(survivors, num_hashes, bands)
            hits = (
                new_buckets.alias("nw")
                .join(
                    old_buckets.alias("od"),
                    (F.col("nw.band") == F.col("od.band"))
                    & (F.col("nw.bucket") == F.col("od.bucket")),
                )
                .select(
                    F.col("nw.id").alias("new_id"),
                    F.col("od.id").alias("old_id"),
                )
                .distinct()
                .join(
                    survivors.withColumnsRenamed({"id": "new_id", "sig": "sig_n"}),
                    "new_id",
                )
                .join(
                    old_sig.withColumnsRenamed({"id": "old_id", "sig": "sig_o"}),
                    "old_id",
                )
                .filter(
                    _sig_est_jaccard(F.col("sig_n"), F.col("sig_o"), num_hashes)
                    >= threshold
                )
                .select(F.col("new_id").alias("id"))
                .distinct()
            )
            survivors = survivors.join(hits, "id", "left_anti")

        survivors = survivors.cache()
        # overwrite-per-batch-directory = replay-idempotent commit
        docs.join(
            survivors.select(F.col("id").alias("doc_id")), "doc_id", "leftsemi"
        ).write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")
        survivors.write.mode("overwrite").parquet(
            f"{state_dir}/batch_id={batch_id}"
        )
        sig.unpersist()
        survivors.unpersist()

    return _start_foreach(stream, process_batch, checkpoint_dir, available_now)


def compact_signature_store(spark: SparkSession, state_dir: str) -> int:
    """Merge all ``batch_id=K`` partitions of a signature store into the
    single highest partition; returns the surviving batch_id.

    Safe ONLY between stream runs (no concurrent writer): every id keeps
    a row, and future batches N > max read ``batch_id < N`` which still
    matches everything — replay of any batch ≤ max cannot occur because
    those batches are already committed in the stream checkpoint.

    Crash-safe ordering — duplicates are harmless to the dedup semantics
    (candidate hits are set-joined), loss is not, so the merged rows are
    ADDED to the surviving partition before anything is deleted:

    1. write the deduped merge to a sibling staging dir (the leading
       underscore keeps it out of Spark partition discovery);
    2. move its part-files INTO ``batch_id=<max>`` (crash mid-move →
       duplicate rows at worst, every id still present somewhere);
    3. delete the older partitions and the staging dir (crash mid-delete
       → leftover duplicates, again harmless; re-running compaction
       cleans up).
    """
    import glob
    import os
    import shutil
    import uuid

    parts = sorted(glob.glob(f"{state_dir}/batch_id=*"))
    if len(parts) <= 1:
        return int(parts[0].rsplit("=", 1)[1]) if parts else -1
    max_id = max(int(p.rsplit("=", 1)[1]) for p in parts)
    # schema-agnostic: works for the MinHash store (id, sig) and the
    # embedding store (id, v) alike — everything but the partition
    # column survives, one row per id
    merged = (
        spark.read.parquet(state_dir)
        .drop("batch_id")
        .dropDuplicates(["id"])
    )
    staging = f"{state_dir}/_compacting"
    merged.write.mode("overwrite").parquet(staging)
    keep = f"{state_dir}/batch_id={max_id}"
    for f in glob.glob(f"{staging}/part-*"):
        shutil.move(f, os.path.join(keep, f"compact-{uuid.uuid4().hex}-{os.path.basename(f)}"))
    for p in parts:
        if p != keep:
            shutil.rmtree(p)
    shutil.rmtree(staging)
    return max_id


def incremental_unique_embeddings(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    schema: str = "vec_id bigint, embedding array<double>",
    available_now: bool = True,
):
    """Streaming CROSS-BATCH embedding near-dup dedup (cosine ≥
    ``threshold``) — the third member of the streaming dedup trio
    (exact fingerprints / MinHash text / embeddings).

    State is (id, v array<double>) parquet partitioned by batch_id — the
    full vector is stored (a 64-dim embedding is ~0.5 KB, cheaper than a
    re-embeddable document), so candidate verification is EXACT cosine,
    unlike the MinHash store's signature estimate. Blocking is RP-LSH
    sign buckets over ``num_tables`` independent hyperplane tables
    (union of seeds): per-table recall at cosine 0.95 with 12 planes is
    ~(1−θ/π)¹² ≈ 0.28, four tables ≈ 0.73; raise ``num_tables`` for
    higher recall, every candidate is exactly verified so precision is
    1.0 regardless. Replay-idempotence follows the same recipe as the
    MinHash variant: per-batch_id overwrites, store reads restricted to
    strictly-older batches; :func:`compact_signature_store` bounds the
    partition count (schema-agnostic). Within-batch cluster
    representatives keep the LEXICOGRAPHICALLY smallest id (ids are
    handled as strings, like every dedup operator here) — zero-pad
    numeric ids upstream if numeric-min semantics matter; the output id
    column is string for the same reason. As there, recomputing the store's
    buckets per batch is the local-mode simplification — at 100 TB the
    store is bucket-partitioned so step 3 prunes partitions instead of
    scanning every stored vector.
    """
    from pyspark.sql import functions as F

    from ..operators.canonicalize import connected_components
    from ..operators.similarity import cosine_sim, rp_lsh_buckets

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def tagged_buckets(vecs: DataFrame) -> DataFrame:
        parts = [
            rp_lsh_buckets(
                vecs, dim, num_planes, "id", "v", seed + 1000 * t
            ).select("id", F.lit(t).alias("tbl"), "bucket")
            for t in range(num_tables)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        vecs = batch_df.select(
            F.col(batch_df.columns[0]).cast("string").alias("id"),
            F.col(batch_df.columns[1]).cast("array<double>").alias("v"),
        ).cache()
        # fail FAST on a dim mismatch: zip_with would pad with nulls,
        # every plane dot would be NULL, every vector would land in
        # bucket 0 of every table, and the candidate self-join would
        # silently go quadratic
        n_bad = vecs.filter(F.size("v") != dim).count()
        if n_bad:
            raise ValueError(
                f"batch {batch_id}: {n_bad} vectors whose length != dim={dim}"
            )
        bk = tagged_buckets(vecs)

        # within-batch: bucket candidates → exact cosine → CC → keep min
        cand = (
            bk.alias("a")
            .join(
                bk.alias("b"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        edges = (
            cand.join(vecs.withColumnsRenamed({"id": "id_a", "v": "v_a"}), "id_a")
            .join(vecs.withColumnsRenamed({"id": "id_b", "v": "v_b"}), "id_b")
            .filter(cosine_sim(F.col("v_a"), F.col("v_b")) >= threshold)
            .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        )
        losers = connected_components(edges).filter(
            F.col("node") != F.col("component")
        ).select(F.col("node").alias("id"))
        survivors = vecs.join(losers, "id", "left_anti")

        # cross-batch: strictly-older stored vectors only (replay-safe)
        store = _read_store_older_than(spark, state_dir, batch_id)
        if store is not None and not store.isEmpty():
            old = store.select("id", "v")
            hits = (
                tagged_buckets(survivors).alias("nw")
                .join(
                    tagged_buckets(old).alias("od"),
                    (F.col("nw.tbl") == F.col("od.tbl"))
                    & (F.col("nw.bucket") == F.col("od.bucket")),
                )
                .select(
                    F.col("nw.id").alias("new_id"),
                    F.col("od.id").alias("old_id"),
                )
                .distinct()
                .join(
                    survivors.withColumnsRenamed({"id": "new_id", "v": "v_n"}),
                    "new_id",
                )
                .join(old.withColumnsRenamed({"id": "old_id", "v": "v_o"}), "old_id")
                .filter(cosine_sim(F.col("v_n"), F.col("v_o")) >= threshold)
                .select(F.col("new_id").alias("id"))
                .distinct()
            )
            survivors = survivors.join(hits, "id", "left_anti")

        survivors = survivors.cache()
        survivors.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )
        survivors.write.mode("overwrite").parquet(
            f"{state_dir}/batch_id={batch_id}"
        )
        vecs.unpersist()
        survivors.unpersist()

    return _start_foreach(stream, process_batch, checkpoint_dir, available_now)
