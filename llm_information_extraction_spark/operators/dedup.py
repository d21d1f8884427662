"""Deduplication operators for large-scale training-data pipelines.

All hot paths are pure Catalyst expressions (whole-stage codegen, zero
Python): shingling, MinHash signatures, SimHash bits, Jaccard via
set-similarity joins. Only the final connected-components grouping runs
the iterative join loop from :mod:`.canonicalize`.

Scale notes (100 TB):
- exact dedup shuffles 16-byte md5 keys, never documents;
- MinHash banding turns the O(n²) pair space into per-band groupBys;
  band keys are salted into the shuffle naturally (hash partitioning);
- candidate verification recomputes true n-gram Jaccard only on pairs
  that share a band — the classic MinHash+LSH recipe (Broder '97,
  Leskovec-Rajaraman-Ullman ch.3);
- SimHash uses 64-bit signatures + lossless multi-table blocking with
  ≥16-bit composite keys (Manku-Jain-Sadhwani, WWW'07): d ≤ 3 keys on
  one 16-bit block (4 tables), d ≤ 6 on 2-of-8-block 16-bit composites
  (≤28 tables); looser budgets are refused (MinHash is the right tool).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textmetrics import doc_fingerprint


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (fingerprint, n_docs, keep_id, doc_ids) for groups with >1 doc.
    """
    fp = df.select(
        F.col(id_col).alias("doc_id"), doc_fingerprint(text_col).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one row (min id) per distinct normalized text."""
    with_fp = df.withColumn("__fp", doc_fingerprint(text_col))
    keep = with_fp.groupBy("__fp").agg(F.min(F.col(id_col)).alias(id_col))
    return with_fp.join(keep, [ "__fp", id_col]).drop("__fp")


# ---------------------------------------------------------------------------
# shingling (shared)
# ---------------------------------------------------------------------------
def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text.

    The words array is BOUND ONCE via a single-element-array transform
    scope before the per-shingle lambda runs. Without that, Catalyst
    re-evaluates the whole normalize+split subtree for EVERY shingle
    (no common-subexpression elimination across higher-order-function
    lambda boundaries), which is O(doc_len · n_words) per document —
    measured 50×+ slower on multi-KB documents.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " ")), " "
    )

    def build(ws: Column) -> Column:
        n_sh = F.greatest(F.size(ws) - n + 1, F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
            )
        )

    return F.transform(F.array(words), build)[0]


# ---------------------------------------------------------------------------
# n-gram Jaccard set-similarity self-join
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All document pairs with word-``n``-gram Jaccard ≥ threshold.

    Exact (not approximate): explode shingles → equi-join on shingle →
    per-pair intersection counts → |A∩B| / (|A|+|B|−|A∩B|). The shuffle
    key is the shingle, so common shingles fan out — at scale, drop
    ultra-frequent shingles first (stop-shingle filtering) or use
    :func:`minhash_dedup_groups`. Returns (id_a, id_b, jaccard), id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("shingles")
    ).withColumn("size", F.size("shingles"))
    tok = sh.select("id", "size", F.explode("shingles").alias("shingle"))
    a = tok.select(
        F.col("id").alias("id_a"), F.col("size").alias("size_a"), "shingle"
    )
    b = tok.select(
        F.col("id").alias("id_b"), F.col("size").alias("size_b"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c") / (F.col("size_a") + F.col("size_b") - F.col("c"))
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-window document fingerprinting)
# ---------------------------------------------------------------------------
def ordered_word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles in DOCUMENT ORDER (duplicates kept) — the
    winnowing input, unlike :func:`word_shingles`'s distinct set."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " ")), " "
    )

    def build(ws: Column) -> Column:
        n_sh = F.greatest(F.size(ws) - n + 1, F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        )

    return F.transform(F.array(words), build)[0]


def winnow_fingerprints(
    col: Column | str, n: int = 3, window: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken,
    SIGMOD'03 — the MOSS algorithm): hash the ordered n-gram sequence,
    slide a ``window``-wide frame over it, keep each frame's MINIMUM
    hash, dedupe. Guarantee: two documents sharing any token run of
    length ≥ window + n − 1 share at least one fingerprint, while only
    ~2/(window+1) of positions are kept — the rolling-hash fingerprint
    family for partial-overlap (containment) detection, which set-level
    MinHash can't do.

    The hash is the first 8 md5 hex digits (portable: DuckDB/Postgres
    reproduce it bit-for-bit, so the operator is oracle-checkable).
    """
    sh = ordered_word_shingles(col, n)

    def build(hs: Column) -> Column:
        n_win = F.greatest(F.size(hs) - window + 1, F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda i: F.array_min(F.slice(hs, i, window)),
            )
        )

    hashes = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    return F.transform(F.array(hashes), build)[0]


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    partial-overlap (plagiarism/quotation/containment) candidates.

    One explode + equi-join on the fingerprint (the shuffle key), count
    per pair: the same bucketed shape as every other dedup join here —
    no all-pairs work. Returns (id_a, id_b, n_shared), id_a < id_b.
    """
    fp = df.select(
        F.col(id_col).alias("id"),
        F.explode(winnow_fingerprints(text_col, n, window)).alias("fp"),
    )
    a = fp.select(F.col("id").alias("id_a"), "fp")
    b = fp.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------
def minhash_signature(
    shingles: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """array<bigint> MinHash signature as a per-row column expression.

    h_i(S) = min over shingles of xxhash64(xxhash64(shingle), seed+i) —
    one base hash per shingle, then ``num_hashes`` cheap re-hashes
    (overflow-free under ANSI mode, unlike an affine family). Prefer
    :func:`minhash_signatures` (explode + groupBy) on large corpora: it
    runs in whole-stage codegen with map-side partial aggregation,
    whereas array higher-order functions are interpreted per element.
    Measured (round 3, local[32], warm best-of-2): this HOF form is ~3×
    faster on short documents (0.28 s vs 0.89 s over sf0.1's ~90-word
    docs — per-row overhead dominates there), while explode+agg wins on
    the 400k-doc larger-payload corpus (18.4 s vs 20.7 s) and is the
    scale default.
    """
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))

    # bind the seeds array ONCE via the single-element-array transform
    # scope — referencing the computed sequence inside the aggregate
    # lambda would re-materialize the 64-element array per shingle
    # (no CSE across HOF lambda boundaries)
    def build(seeds: Column) -> Column:
        init = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
        return F.aggregate(
            hashes,
            init,
            lambda acc, h: F.zip_with(
                acc, seeds, lambda m, i: F.least(m, F.xxhash64(h, i))
            ),
        )

    return F.transform(
        F.array(F.sequence(F.lit(seed), F.lit(seed + num_hashes - 1))), build
    )[0]


#: Spark XXH64 primes (org.apache.spark.sql.catalyst.expressions.XXH64 —
#: the standard public xxHash64 constants)
_XXH_PRIMES = (
    0x9E3779B185EBCA87,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x85EBCA77C2B2AE63,
    0x27D4EB2F165667C5,
)


def _minhash_sigs_arrow(
    df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int,
    seed: int
) -> DataFrame:
    """(id, sig array<bigint>) — value-identical to the HOF/explode
    flavors, with the ``num_hashes`` re-hash + min folds vectorized in
    numpy (guide §4.2: hand whole Arrow batches to native code).

    The per-shingle base hash stays in the JVM
    (``transform(shingles, xxhash64)``); the Python side replays Spark's
    ``xxhash64(h, seed+i)`` column fold — ``hashInt(seed+i,
    hashLong(h, 42))``, the second operand being an *int* literal in
    the expression flavors — over uint64 arrays. The hash's mixing of
    its *input* is independent of its seed argument, so the inner
    ``hashLong(h, 42)`` is computed once per shingle and the outer
    fold's input-mix ``(seed+i)·P1`` once per i: ~8 vector ops per
    (shingle, i) instead of one interpreted expression tree. Exact
    equality with the expression flavors is pinned by
    ``test_minhash_row_wise_signatures_value_equal``. Seeds outside
    int32 would take Spark's long-literal path instead — refused here
    rather than silently diverging.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType, True),
            StructField("sig", ArrayType(LongType()), True),
        ]
    )
    hs_df = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles(text_col, n), lambda s: F.xxhash64(s)
        ).alias("hs"),
    )
    p1, p2, p3, p4, p5 = (np.uint64(p) for p in _XXH_PRIMES)

    def rotl(x, r):
        r = np.uint64(r)
        return (x << r) | (x >> (np.uint64(64) - r))

    def fmix(h):
        h ^= h >> np.uint64(33)
        h *= p2
        h ^= h >> np.uint64(29)
        h *= p3
        h ^= h >> np.uint64(32)
        return h

    if not (-(2**31) <= seed and seed + num_hashes - 1 < 2**31):
        raise ValueError(
            "minhash seed range must fit int32 (the expression flavors "
            "hash the seed as an int literal)"
        )
    # outer hash is hashInt(seed+i, inner): its input mix is constant
    # per i — (seed+i as uint32) · P1
    seeds = np.arange(seed, seed + num_hashes, dtype=np.int64) & np.int64(
        0xFFFFFFFF
    )
    k1s = seeds.astype(np.uint64) * p1
    init = np.int64(2**63 - 1)

    def run(batches):
        for pdf in batches:
            nrows = len(pdf)
            if not nrows:
                continue
            hs = [
                np.asarray(x if x is not None else [], dtype=np.int64)
                for x in pdf["hs"]
            ]
            lens = np.fromiter((len(x) for x in hs), dtype=np.int64,
                               count=nrows)
            sig_mat = np.full((nrows, num_hashes), init, dtype=np.int64)
            nonempty = lens > 0
            if nonempty.any():
                flat = np.concatenate([x for x in hs if len(x)])
                h = flat.view(np.uint64)
                # inner = hashLong(h, 42), once per shingle
                inner = np.uint64(42) + p5 + np.uint64(8)
                inner = inner ^ (rotl(h * p2, 31) * p1)
                inner = rotl(inner, 27) * p1 + p4
                inner = fmix(inner)
                # outer (hashInt) seed-side state, once per shingle
                acc = inner + p5 + np.uint64(4)
                starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(lens[nonempty][:-1], out=starts[1:])
                rows = np.nonzero(nonempty)[0]
                for i in range(num_hashes):
                    x = rotl(acc ^ k1s[i], 23) * p2 + p3
                    x = fmix(x).view(np.int64)
                    sig_mat[rows, i] = np.minimum.reduceat(x, starts)
            yield pd.DataFrame(
                {"id": pdf["id"], "sig": list(sig_mat)}
            )

    return hs_df.mapInPandas(run, schema=out_schema)


def _signatures_from_tokens(
    tok: DataFrame, num_hashes: int, seed: int
) -> DataFrame:
    """(id, shingle) token rows → (id, sig array<bigint>)."""
    hashed = tok.select("id", F.xxhash64("shingle").alias("h"))
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(seed + i))).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    sig = hashed.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def _doc_tokens(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )


def drop_frequent_shingles(
    tok: DataFrame, max_doc_freq: float
) -> DataFrame:
    """Stop-shingle filtering: drop shingles present in more than
    ``max_doc_freq`` of documents BEFORE MinHashing.

    Boilerplate shingles dominate signatures (they win the min for many
    permutations across many docs), which is what chains whole
    template-heavy corpora into one LSH component (see
    BENCH/dedup_scale.md). Removing corpus-frequent shingles makes the
    signature reflect each document's DISTINCTIVE content — the standard
    web-dedup mitigation. Two extra codegen aggregations, shuffling only
    (shingle, count) pairs.

    ``max_doc_freq`` is honored APPROXIMATELY near the cutoff: the doc
    count it scales comes from ``approx_count_distinct`` (HLL, ~5% rsd),
    so a shingle whose document frequency sits within a few percent of
    the threshold may land on either side. That is fine for the
    boilerplate-removal purpose (boilerplate is orders of magnitude above
    any sane cutoff); pass an exact-counted threshold yourself if you
    need a hard fraction.
    """
    # HLL cardinality, not distinct().count(): the doc count only scales
    # a threshold, and approx_count_distinct is one map-side-combining
    # aggregate instead of a corpus-wide distinct shuffle
    n_docs = F.broadcast(
        tok.agg(F.approx_count_distinct("id").alias("__n"))
    )
    rare = (
        tok.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(n_docs)
        .filter(F.col("__df") <= F.col("__n") * max_doc_freq)
        .select("shingle")
    )
    return tok.join(rare, "shingle", "leftsemi")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
    row_wise: bool = False,
) -> DataFrame:
    """(id, sig array<bigint>) via explode → hash → 64 min-aggregates.

    The whole computation is codegen'd: one shuffle keyed by id with
    map-side combine (each partition pre-reduces to one row per id).
    Same hash family as :func:`minhash_signature`.

    ``row_wise=True`` computes the SAME values per row, with no
    shuffle: since round 6 via :func:`_minhash_sigs_arrow` (JVM base
    hashes + the 64 re-hash/min folds vectorized in numpy over Arrow
    batches — measured 3.3 s → ~0.9 s over sf1.0's 50k short docs,
    where the round-5 interpreted HOF flavor already beat explode+agg).
    Identical shingles (``word_shingles`` feeds all flavors) and an
    exact replay of the xxhash64 fold keep the paths value-equal
    (pinned by ``test_minhash_row_wise_signatures_value_equal``), so
    the choice is purely a performance knob. explode+agg remains the
    default — one shuffle with map-side combine, entirely codegen, the
    shape that holds on large-payload corpora (round-3 measurement:
    18.4 s vs 20.7 s at 400k docs) and at 100 TB.
    """
    if row_wise:
        return _minhash_sigs_arrow(
            df, id_col, text_col, n, num_hashes, seed
        )
    return _signatures_from_tokens(
        _doc_tokens(df, id_col, text_col, n), num_hashes, seed
    )


def _banded_buckets(
    sig: DataFrame, num_hashes: int, bands: int, keep: tuple[str, ...] = ("id",)
) -> DataFrame:
    """(*keep, band, bucket) — one bucket key per signature band.

    ``keep`` lists the pass-through columns (default just ``id``; the
    streaming signature store also keeps ``sig`` so stored bucket rows
    carry their signature for in-join verification)."""
    rows_per_band = num_hashes // bands
    return sig.select(
        *keep,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(
        *keep, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _banded_slices(
    sig: DataFrame, num_hashes: int, bands: int
) -> tuple[DataFrame, list[str]]:
    """(id, band, b0..b{r-1}) — each band's RAW signature slice as the
    bucket key, no hash (round 6). Two docs collide on a band iff the
    slice values are equal — the exact LSH banding definition — which
    removes both the 2⁻⁶⁴ bucket-collision caveat and the per-row
    cast-to-string + concat + xxhash64 codegen of
    :func:`_banded_buckets`. The hashed form is kept for the streaming
    store, whose PERSISTED bucket keys must stay stable across
    versions. Returns (frame, key column names); the ≤ r·8-byte-wider
    shuffle key is noise next to the removed per-row work.
    """
    r = num_hashes // bands
    keys = [f"b{i}" for i in range(r)]
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    *[
                        F.element_at(F.col("sig"), b * r + i + 1).alias(
                            f"b{i}"
                        )
                        for i in range(r)
                    ],
                ),
            )
        ).alias("bb"),
    ).select(
        "id",
        F.col("bb.band").alias("band"),
        *[F.col(f"bb.b{i}").alias(f"b{i}") for i in range(r)],
    )
    return banded, keys


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    row_wise: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash.

    ``bands`` bands of ``num_hashes/bands`` rows each; docs sharing any
    band bucket become a candidate pair. Probability a pair with true
    Jaccard j collides: 1-(1-j^r)^b.

    Pair ENUMERATION is Θ(Σ bucket²): fine when duplicate clusters are
    small, quadratic when a template spawns thousands of near-copies —
    use :func:`minhash_dedup_groups_fast` for cluster-heavy corpora.
    """
    # cache: the banded self-join consumes this twice (both sides); one
    # row per doc, so the footprint is tiny relative to the corpus
    sig = minhash_signatures(
        df, id_col, text_col, n, num_hashes, seed, row_wise
    ).cache()
    banded, keys = _banded_slices(sig, num_hashes, bands)
    a = banded.select(F.col("id").alias("id_a"), "band", *keys)
    b = banded.select(F.col("id").alias("id_b"), "band", *keys)
    return (
        a.join(b, ["band", *keys])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    row_wise: bool = False,
) -> DataFrame:
    """Banded candidates verified by EXACT n-gram Jaccard →
    (id_a, id_b, jaccard), id_a < id_b, jaccard ≥ threshold.

    The verify join never shuffles shingle arrays: candidates fan out
    through an exploded (id, shingle) token table, so the per-pair
    payload is one shingle string per shared shingle (intersection
    counting by equi-join), then sizes join in per id. At 100 TB this is
    the difference between shuffling whole documents per candidate and
    shuffling only the shared tokens. With ``bands == num_hashes``
    (r = 1 rows/band) banding recall at j ≥ 0.5 is 1 − (1−j)^64 ≈ 1,
    making the output equal to the exact-Jaccard pair set — the
    configuration the driver oracle pins.
    """
    cands = minhash_candidate_pairs(
        df, id_col, text_col, n, num_hashes, bands, seed, row_wise
    ).cache()
    # only candidate-involved docs need their shingles re-derived: the
    # candidate id set is usually O(dup_rate·n) ≪ corpus, so the semi
    # join prunes the token table before the shingle shuffle. NO
    # broadcast hint and NO driver-side size gate: AQE sees the actual
    # candidate size at runtime and downgrades the semi join to
    # broadcast when it fits (same strategy as
    # minhash_dedup_groups_fast) — a count()-based gate would serialize
    # a blocking job in front of the verify plan for information AQE
    # already has.
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .union(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # semi-join BEFORE shingling (round 6): shingles are derived only
    # for candidate-involved docs, not the whole corpus — and if the
    # candidate set is ever corpus-sized, shuffling raw text is still
    # strictly fewer bytes than shuffling its n-times-larger exploded
    # shingle stream. The shingled candidate rows are cached: the
    # intersection join consumes them twice (id_a and id_b sides) and
    # re-deriving them costs a semi join + shingle build each time
    cand_sh = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__vt"))
        .join(cand_ids, "id", "leftsemi")
        .select("id", word_shingles("__vt", n).alias("__sh"))
        .cache()
    )
    # each token row carries its doc's |distinct shingle set| (8 bytes
    # per SHARED token row in the shuffle) so the per-pair sizes ride
    # through the intersection aggregate as min() of a per-id constant
    # — two fewer joins (and AQE broadcast waves) than joining a sizes
    # relation back in per side
    tok = cand_sh.select(
        "id", F.size("__sh").alias("sz"), F.explode("__sh").alias("shingle")
    )
    inter = (
        cands.join(
            tok.withColumnsRenamed({"id": "id_a", "sz": "size_a"}), "id_a"
        )
        .join(
            tok.withColumnsRenamed({"id": "id_b", "sz": "size_b"}),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("size_a").alias("size_a"),
            F.min("size_b").alias("size_b"),
        )
    )
    jac = F.col("c") / (F.col("size_a") + F.col("size_b") - F.col("c"))
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    row_wise: bool = False,
) -> DataFrame:
    """Near-duplicate clusters: MinHash banding → exact Jaccard verify →
    connected components. Returns (doc_id, group_id); group_id = min id
    of the cluster; singletons omitted."""
    from .canonicalize import connected_components

    verified = minhash_verified_pairs(
        df, id_col, text_col, n, num_hashes, bands, threshold, seed, row_wise
    ).select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    cc = connected_components(verified)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("group_id")
    )


def minhash_dedup_groups_fast(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    verify_threshold: float | None = None,
    max_shingle_doc_freq: float | None = None,
    row_wise: bool = False,
) -> DataFrame:
    """Near-dup clusters for corpora with LARGE duplicate clusters —
    the web-scale production path.

    ``max_shingle_doc_freq`` applies :func:`drop_frequent_shingles`
    before signing, so boilerplate shingles stop dominating signatures
    (the chaining cause); a document whose every shingle is
    corpus-frequent carries no distinctive content and is left
    unclustered (run exact fingerprint dedup first — KGPipeline does).
    Stop-shingle filtering needs the exploded token table, so
    ``row_wise`` is IGNORED on that branch (the per-row signature
    cannot see corpus-level shingle frequencies).

    The pairwise path (:func:`minhash_dedup_groups`) enumerates candidate
    PAIRS, which is Θ(Σ cluster²): one 14k-copy boilerplate cluster alone
    yields 10⁸ pairs (measured on a 10⁵-doc synthetic corpus). This
    variant instead treats each (band, bucket) as a hyperedge: one
    aggregation collapses every bucket to STAR edges (member → bucket-min
    doc) — at most n·bands edges no matter how the clusters are shaped,
    equivalent to CC over the bipartite doc ↔ bucket graph but with
    doc-only nodes and a near-star start — the RefinedWeb/SlimPajama-
    style recipe.

    Precision equals banding precision (clusters are unions of shared
    buckets, no per-pair exact-Jaccard check). Pass ``verify_threshold``
    to additionally drop members whose exact n-gram Jaccard against
    their cluster REPRESENTATIVE (min doc id) falls below it — that's
    O(cluster size) verification work instead of O(cluster²). Two
    documented rep-verify caveats on bucket-CHAINED clusters: a
    legitimately chained member can sit below the pair threshold vs the
    representative, and a true duplicate PAIR whose members both fail
    verification against a distant rep leaves the output entirely — run
    exact fingerprint dedup first (KGPipeline's 'minhash' mode does)
    so exact copies can never escape that way.

    Returns (doc_id string, group_id string); singletons omitted.
    """
    from .canonicalize import connected_components

    if max_shingle_doc_freq is None:
        sig = minhash_signatures(
            df, id_col, text_col, n, num_hashes, seed, row_wise
        )
    else:
        # stop-shingle filtering needs the exploded token table, so the
        # row-wise flavor does not apply on this branch
        sig = _signatures_from_tokens(
            drop_frequent_shingles(
                _doc_tokens(df, id_col, text_col, n), max_shingle_doc_freq
            ),
            num_hashes,
            seed,
        )
    from pyspark.sql.window import Window

    banded, keys = _banded_slices(sig, num_hashes, bands)
    # collapse each band bucket to STAR edges member → bucket-min doc
    # via ONE bucket-partitioned window min: connectivity is
    # identical to the bipartite doc↔bucket graph (a bucket's members
    # stay joined through its min member), but CC then runs over
    # doc-only nodes — half the node count — and starts one hop from
    # star shape, so it converges in fewer large-star/small-star rounds.
    # A window (one exchange) rather than groupBy + self-join: the join
    # shape re-derived `banded` — and with it the whole signature
    # pipeline — on BOTH sides (measured 10.9 s vs 4.5 s at sf1.0 for
    # 2.5k edges)
    bucket_w = Window.partitionBy("band", *keys)
    # the window min runs on the NATIVE id type and the string cast
    # happens after: the bucket anchor only needs to be *consistent*
    # within the bucket for connectivity (every member joins through
    # it), so a numeric-min anchor yields the same components as a
    # lexicographic one, while the 800k-row/band-count shuffle sorts
    # 8-byte longs instead of strings. Representatives (group_id) are
    # still min STRING doc ids — computed downstream over docs_cc.
    edges = (
        banded.select("id", "band", *keys)
        .withColumn("dst", F.min("id").over(bucket_w))
        .filter(F.col("id") != F.col("dst"))
        .select(
            F.col("id").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
    )
    cc = connected_components(edges)
    docs_cc = cc.select(F.col("node").alias("doc_id"), "component")
    # representative + cluster size via ONE component-partitioned
    # window instead of groupBy + self-join: the join shape re-derived
    # the CC output subtree on both sides (two aggregate scans, twice
    # the plan), the window is one exchange over the grouped docs
    comp_w = Window.partitionBy("component")
    groups = (
        docs_cc.withColumn("group_id", F.min("doc_id").over(comp_w))
        .withColumn("sz", F.count(F.lit(1)).over(comp_w))
        .filter(F.col("sz") > 1)
        .select("doc_id", "group_id")
    )
    if verify_threshold is None:
        return groups

    # representative verify: exact n-gram Jaccard(member, rep) —
    # O(cluster) pairs, one per member. Round 6 shape: attach the two
    # raw texts per (member, rep) pair with two joins and compute the
    # Jaccard as ONE codegen projection (array_intersect over the
    # distinct shingle arrays, bound once via withColumn) — replacing a
    # 6-join token-table cascade that re-derived the exploded token
    # table three times (measured ~6 s → ~1 s at sf1.0 for 4.8k grouped
    # docs). Value-identical: word_shingles arrays are distinct, so
    # |array_intersect| equals the old equi-join intersection count and
    # the division is the same int/int double. Bytes at scale: each
    # member ships its text once — strictly fewer bytes than the old
    # full member token table (n shingles ≈ n× text bytes). NO
    # broadcast hints: the grouped set can be corpus-sized on
    # boilerplate-heavy corpora; AQE broadcasts when it turns out small
    txt = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("__vt"),
    )
    pairs = (
        groups.join(txt, "doc_id")
        .join(
            txt.select(
                F.col("doc_id").alias("group_id"),
                F.col("__vt").alias("__rvt"),
            ),
            "group_id",
        )
        .withColumn("__sh", word_shingles("__vt", n))
        .withColumn("__rsh", word_shingles("__rvt", n))
        .withColumn("__c", F.size(F.array_intersect("__sh", "__rsh")))
    )
    jac = F.col("__c") / (
        F.size("__sh") + F.size("__rsh") - F.col("__c")
    )
    verified = pairs.filter(
        (F.col("doc_id") == F.col("group_id")) | (jac >= verify_threshold)
    ).select("doc_id", "group_id")
    # post-verify singleton drop via a window, NOT groupBy + self-join:
    # the join re-computed the ENTIRE verify subtree (text joins, both
    # shingle builds, the intersection) on both sides — measured as the
    # two slowest stages of the whole query at 10x scale. The window is
    # one exchange over the already-verified (doc_id, group_id) rows.
    keep_w = Window.partitionBy("group_id")
    return (
        verified.withColumn("sz2", F.count(F.lit(1)).over(keep_w))
        .filter(F.col("sz2") > 1)
        .select("doc_id", "group_id")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(col: Column | str, n: int = 2) -> Column:
    """64-bit SimHash of word n-gram shingles — pure expressions.

    bit b of the signature = sign of Σ_shingles (±1 by bit b of
    xxhash64(shingle)). One ``aggregate`` pass with a 64-slot array
    accumulator of bit-sums, then folded back into a single long.
    """
    sh = word_shingles(col, n)
    bit_idx = F.sequence(F.lit(0), F.lit(63))
    sums = F.aggregate(
        sh,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                # getbit accepts a column bit position (shiftrightunsigned
                # in the Python API only takes int literals)
                lambda b: F.call_function("getbit", F.xxhash64(s), b).cast("long"),
            ),
            lambda a, bit: a + bit * 2 - 1,
        ),
    )
    # fold sign bits back into one 64-bit long (bit 63 = long sign bit)
    out = F.lit(0).cast("long")
    for b in range(64):
        mask = F.lit((1 << b) if b < 63 else -(2**63)).cast("long")
        out = out.bitwiseOR(
            F.when(F.element_at(sums, b + 1) >= 0, mask).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def _simhash_sigs_arrow_md5(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, sig bigint) — the md5 SimHash signature with the 64
    bit-count sums vectorized in numpy over Arrow batches (guide §4.2).

    The JVM computes ONE packed 64-bit value per shingle
    (``conv(hex[1:8]) << 32 | conv(hex[9:16])`` — hex digit i of a half
    sits at bits [4·(7−i), 4·(7−i)+3]); the Python side extracts bit
    ``3 − b%4`` of hex digit ``b//4`` with shifts and sums per document
    via ``reduceat``, then packs ``2·sum ≥ count`` into the signature —
    bit-identical to the 65-aggregate flavor (kept reachable as
    ``hash_fn='md5_agg'`` and pinned by
    ``test_simhash_md5_arrow_matches_agg``) and to the DuckDB oracle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType, True),
            StructField("sig", LongType(), True),
        ]
    )
    # round 6: shingling + md5 + 64-bit packing moved INTO the kernel —
    # the JVM ships only the normalized text (so the Python split sees
    # exactly word_shingles' input, the _gram_keys_arrow pattern) and
    # the md5 → conv(substring)×2 → shiftleft expression chain (the
    # cold-JIT-heaviest part of the query) disappears.
    # int.from_bytes(digest[:8], 'big') == conv(hex[1:8]) << 32 |
    # conv(hex[9:16]) — the same first 8 digest bytes big-endian.
    # Distinctness is set semantics; bit sums don't depend on order.
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    src = df.select(F.col(id_col).alias("id"), norm.alias("__t"))
    # bit b of the signature reads bit (3 - b%4) of hex digit b//4;
    # digit i of a 32-bit half occupies bits [4*(7 - i%8), ...+3], and
    # the first 8 digits live in the high half of the packed long
    shifts = np.array(
        [
            (32 if b < 32 else 0) + 4 * (7 - (b // 4) % 8) + (3 - b % 4)
            for b in range(64)
        ],
        dtype=np.uint64,
    )

    def run(batches):
        import hashlib

        md5 = hashlib.md5
        ib = int.from_bytes
        for pdf in batches:
            nrows = len(pdf)
            if not nrows:
                continue
            flat_list: list = []
            lens = np.empty(nrows, dtype=np.int64)
            for j, txt in enumerate(pdf["__t"]):
                ws = (txt or "").split(" ")
                seen = set()
                for i in range(max(len(ws) - n + 1, 1)):
                    g = " ".join(ws[i : i + n])
                    if g not in seen:
                        seen.add(g)
                        flat_list.append(
                            ib(md5(g.encode()).digest()[:8], "big")
                        )
                lens[j] = len(seen)
            sig = np.zeros(nrows, dtype=np.uint64)
            nonempty = lens > 0
            if nonempty.any():
                flat = np.array(flat_list, dtype=np.uint64)
                starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(lens[nonempty][:-1], out=starts[1:])
                rows = np.nonzero(nonempty)[0]
                cnt = lens[nonempty]
                one = np.uint64(1)
                for b in range(64):
                    bits = (flat >> shifts[b]) & one
                    sums = np.add.reduceat(bits.view(np.int64), starts)
                    sig[rows] |= (2 * sums >= cnt).astype(
                        np.uint64
                    ) << np.uint64(b)
            yield pd.DataFrame({"id": pdf["id"], "sig": sig.view(np.int64)})

    return src.mapInPandas(run, schema=out_schema)


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig bigint) via explode → hash → 64 sum-aggregates → pack.

    Same signature values as :func:`simhash64` (same shingles, same
    xxhash64 bits) but codegen-friendly: bit b is set iff
    Σ bit_b(h) * 2 > n_shingles (i.e. the ±1 sum is ≥ 0; ties → set,
    matching ``sum*2 - count >= 0``).

    ``hash_fn='md5'`` derives the 64 bits from the first 16 hex digits
    of ``md5(shingle)`` instead (bit b = bit ``3 - b%4`` of hex digit
    ``b//4``): md5 exists in DuckDB/Postgres/etc., so this variant is
    reproducible OUTSIDE Spark and drives the driver's bit-exact oracle.
    Since round 6 it runs through :func:`_simhash_sigs_arrow_md5`
    (bit-identical, numpy bit-count sums — measured 2.3 s → 0.9 s at
    sf1.0); ``hash_fn='md5_agg'`` keeps the 65-aggregate flavor
    reachable so the equality test pins the two. xxhash64 stays the
    default (one 64-bit hash, all codegen).
    """
    if hash_fn == "md5":
        return _simhash_sigs_arrow_md5(df, id_col, text_col, n)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    if hash_fn == "md5_agg":
        # parse the 16 hex digits as TWO 32-bit conv() calls instead of
        # sixteen single-digit ones (round 6: 14 fewer string parses per
        # shingle row — measured ~2.3x on the signature stage); hex
        # digit i of a half sits at bits [4*(7-i), 4*(7-i)+3] of its
        # 32-bit value, so every extracted bit is IDENTICAL to the
        # per-digit form (bit b = bit 3-b%4 of digit b//4)
        hexd = F.md5("shingle")
        src = exploded.select(
            "id",
            F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long").alias("h0"),
            F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long").alias("h1"),
        )

        def bit(b: int) -> Column:
            half, i = divmod(b // 4, 8)
            shift = 4 * (7 - i) + (3 - b % 4)
            return (
                F.shiftright(F.col(f"h{half}"), shift)
                .bitwiseAND(F.lit(1))
                .cast("long")
            )

    elif hash_fn == "xxhash64":
        src = exploded.select("id", F.xxhash64("shingle").alias("h"))

        def bit(b: int) -> Column:
            return F.shiftrightunsigned(F.col("h"), b).bitwiseAND(
                F.lit(1).cast("long")
            )

    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")

    aggs = [F.count(F.lit(1)).alias("cnt")] + [
        F.sum(bit(b)).alias(f"b{b}") for b in range(64)
    ]
    sums = src.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        mask = F.lit((1 << b) if b < 63 else -(2**63)).cast("long")
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{b}") * 2 >= F.col("cnt"), mask).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select("id", sig.alias("sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def _simhash_block_plan(
    max_hamming: int, min_key_bits: int = 16, max_tables: int = 70
) -> tuple[list[int], list[int], list[tuple[int, ...]]]:
    """Lossless multi-table blocking plan (Manku-Jain-Sadhwani, WWW'07).

    Split 64 bits into ``n_blocks`` blocks and key each table on a
    combination of ``key_blocks = n_blocks - max_hamming`` blocks: a pair
    within the Hamming budget corrupts ≤ max_hamming blocks, so at least
    one table's key blocks are all untouched — lossless by pigeonhole.

    Picks the smallest n_blocks whose key is ≥ ``min_key_bits`` wide
    (narrow keys degenerate the self-join toward O(n²/2^bits): the
    round-1 contiguous-band scheme at max_hamming=10 had ≤6-bit keys)
    and whose table count stays ≤ ``max_tables``. Raises for budgets
    where no such plan exists (max_hamming ≥ 7 with 16-bit keys) —
    MinHash-LSH is the right operator for loose thresholds.

    Returns (widths, offsets, tables) where tables enumerates the block
    index combinations.
    """
    from itertools import combinations
    from math import comb

    if max_hamming < 0:
        raise ValueError("max_hamming must be ≥ 0")
    for n_blocks in range(max_hamming + 1, 33):
        key_blocks = n_blocks - max_hamming
        if key_blocks * (64 // n_blocks) < min_key_bits:
            continue
        if comb(n_blocks, key_blocks) > max_tables:
            continue
        widths = [
            64 // n_blocks + (1 if i < 64 % n_blocks else 0)
            for i in range(n_blocks)
        ]
        offsets = [sum(widths[:i]) for i in range(n_blocks)]
        return widths, offsets, list(combinations(range(n_blocks), key_blocks))
    raise ValueError(
        f"no lossless SimHash blocking with ≥{min_key_bits}-bit keys and "
        f"≤{max_tables} tables exists for max_hamming={max_hamming}; use "
        "minhash_dedup_groups / minhash_verified_pairs for loose "
        "similarity budgets, or lower min_key_bits explicitly"
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n: int = 2,
    hash_fn: str = "xxhash64",
    min_key_bits: int = 16,
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ ``max_hamming`` —
    (id_a, id_b, hamming), id_a < id_b. Lossless (every qualifying pair
    is emitted): candidates come from the multi-table wide-key blocking
    of :func:`_simhash_block_plan`, then the exact Hamming filter.

    Each table is one shuffle keyed by (table, key) with ≥
    ``min_key_bits``-bit keys, so per-bucket collision lists stay
    O(n/2^bits) and the self-join cost is O(tables · n) rows in, not
    O(n²/buckets) out — the property that makes this safe at 100 TB.
    """
    widths, offsets, tables = _simhash_block_plan(max_hamming, min_key_bits)

    def block_val(k: int) -> Column:
        v = F.shiftrightunsigned(F.col("sig"), offsets[k])
        if widths[k] < 64:
            v = v.bitwiseAND(F.lit((1 << widths[k]) - 1).cast("long"))
        return v

    def table_key(blocks: tuple[int, ...]) -> Column:
        key = F.lit(0).cast("long")
        for k in blocks:
            key = F.shiftleft(key, widths[k]).bitwiseOR(block_val(k))
        return key

    # cached: the banded self-join reads it for both sides
    sig = simhash_signatures(df, id_col, text_col, n, hash_fn).cache()
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("band"), table_key(blocks).alias("key")
                    )
                    for t, blocks in enumerate(tables)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "key"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------
def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns (zip_with dot
    + aggregate norms, all JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine ≥ threshold — brute-force O(n²) variant.

    Correctness baseline for small n; the scale path is
    :func:`..operators.similarity.rp_lsh_near_dup_pairs` (random
    hyperplane bucketing before the exact check).
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("v_a"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("v_b"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine_sim(F.col("v_a"), F.col("v_b")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
