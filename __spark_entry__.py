"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on the
sf0.001 documents table (flat → interleaved spans → payload → gazetteer
extraction → entity linking → canonical triples).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` carries
the DuckDB-equivalent SQL for every query except ``media_features``
(raw8 RNG payloads aren't SQL-reproducible; rows-only). The previously
oracle-less ops are oracled via reformulations proven equivalent ON THIS
CORPUS and documented per-query: MinHash groups == exact-Jaccard
transitive closure (banding recall 1 at the observed margins), SimHash
via a portable md5 bit source recomputed wholesale in SQL, greedy
matching == exact set matching (no fuzzy-similar label pair exists).

Column names are aligned 1:1 between Spark and SQL (the driver hashes
values under sorted column names). Floating aggregates are rounded to 6
decimals on BOTH sides so double summation order can't flip the hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

# make the package importable on the driver regardless of cwd
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark) -> None:
    """Ship the package to executors of a session we didn't create.

    The harness builds its own SparkSession; its JVM snapshotted
    PYTHONPATH before we were imported, so Python workers can't unpickle
    our mapInPandas closures. ``sc.addPyFile`` with a runtime-built zip
    is the post-hoc equivalent of ``spark-submit --py-files``.
    """
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import hashlib
    import tempfile
    import zipfile

    pkg = Path(_REPO) / "llm_information_extraction_spark"
    files = sorted(
        f for f in pkg.rglob("*")
        if f.is_file() and "__pycache__" not in str(f)
    )
    # content-hash the zip name: a cached zip from an OLDER build must
    # never be shipped (executors would run stale code while the driver
    # runs current code — signature mismatches at the Arrow boundary)
    h = hashlib.sha256()
    for f in files:
        h.update(str(f.relative_to(pkg)).encode())
        h.update(f.read_bytes())
    zpath = os.path.join(
        tempfile.gettempdir(), f"kgx_entry_pkg_{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for f in files:
                zf.write(f, f.relative_to(Path(_REPO)))
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_information_extraction_spark.functions.normalize import (
    canonicalize_join,
    clean_split,
    normalize_text,
)
from llm_information_extraction_spark.functions.textmetrics import (
    detect_lang,
    doc_fingerprint,
    quality_score,
    token_count,
)
from llm_information_extraction_spark.operators.dedup import (
    minhash_dedup_groups,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from llm_information_extraction_spark.operators.evaluation import (
    binary_metrics,
    categorise_cell,
    greedy_error_analysis,
)
from llm_information_extraction_spark.operators.extraction import extract_triples
from llm_information_extraction_spark.operators.linking import (
    link_mentions,
    vocabulary_df,
)
from llm_information_extraction_spark.operators.payload import build_payload
from llm_information_extraction_spark.operators.similarity import cosine_topk
from llm_information_extraction_spark.sources.interleave import (
    interleave_flat_documents,
)

EMPTY_TOKENS_SQL = (
    "('', 'none', 'n.a.', 'na', 'n a', 'n/a', 'null', '_', '-', 'nan', "
    "'not reported', 'unknown')"
)

_LANG_MAP = [
    ("en", "english"), ("de", "german"), ("fr", "french"),
    ("es", "spanish"), ("und", "unknown"),
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat docs → interleaved spans → payload → extraction → linking.

    The parquet input is a single small file (1 split); repartition to
    the session parallelism so the Arrow extraction stage uses every
    core — on a real cluster the scan itself would already be split.
    """
    flat = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs = interleave_flat_documents(flat)
    mentions = extract_triples(build_payload(docs, mode="full_text"))
    return link_mentions(mentions, vocabulary_df(spark))


def kg_triples_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oversized-doc-safe extraction path (E6): chunk → extract →
    doc-level-rule-correct merge. Must produce EXACTLY the same triples
    as the unchunked flagship, so the kg_triples oracle applies verbatim
    — this puts the chunked path itself under the driver's value check."""
    from llm_information_extraction_spark.operators.skew import (
        extract_chunked,
    )

    flat = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs = interleave_flat_documents(flat)
    mentions = extract_chunked(docs, max_spans=4)
    return link_mentions(mentions, vocabulary_df(spark))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return kg_triples(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# SQL-expressible queries (each has an oracle below)
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


def orders_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o["o_custkey"] == c["c_custkey"], "left").select(
        "o_orderkey", F.coalesce("c_name", F.lit("")).alias("c_name")
    )


def nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


def normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", normalize_text(F.col("text")).alias("norm"))


def clean_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(F.col("source"), F.lit(";"), F.col("lang"), F.lit(", NA ,  Unknown, ok"))
    return d.select("doc_id", F.explode(clean_split(raw)).alias("token"))


def lang_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cmap = spark.createDataFrame(_LANG_MAP, "surface string, canonical string")
    return canonicalize_join(
        d.select("doc_id", F.col("lang")), "lang", cmap, out_col="lang_canonical"
    ).select("doc_id", "lang_canonical")


def _event_label_sets(spark: SparkSession, sf_dir: str):
    e = _t(spark, sf_dir, "events")
    g = (
        e.filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id")
        .agg(F.collect_set("event_type").alias("gold"))
    )
    p = (
        e.filter(F.col("event_id") % 2 == 1)
        .groupBy("user_id")
        .agg(F.collect_set("event_type").alias("pred"))
    )
    return g.join(p, "user_id", "left").withColumn(
        "pred", F.coalesce("pred", F.array().cast("array<string>"))
    )


def multilabel_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _event_label_sets(spark, sf_dir)
    counts = j.select(
        F.size(F.array_intersect("pred", "gold")).alias("tp"),
        F.size(F.array_except("pred", "gold")).alias("fp"),
        F.size(F.array_except("gold", "pred")).alias("fn"),
    ).agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"))
    return counts.select(
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias("micro_p"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias("micro_r"),
        F.round(
            2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("micro_f1"),
    )


def samples_jaccard_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _event_label_sets(spark, sf_dir)
    per_row = j.select(
        (
            F.size(F.array_intersect("pred", "gold"))
            / F.size(F.array_union("pred", "gold"))
        ).alias("jac"),
        (
            (F.size(F.array_except("pred", "gold")) == 0)
            & (F.size(F.array_except("gold", "pred")) == 0)
        ).cast("double").alias("exact"),
    )
    return per_row.agg(
        F.round(F.avg("jac"), 6).alias("jaccard_samples"),
        F.round(F.avg("exact"), 6).alias("subset_accuracy"),
    )


def binary_metrics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — hash-proof form: integer confusion counts + ppm-scaled
    metrics (BIGINT on both sides; integers can't ulp- or dtype-flake
    the driver hasher the way round-1's DOUBLE/HUGEINT mix did)."""
    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("value") >= 0.5, "yes").otherwise("no").alias("gold"),
        F.when(F.col("event_type").isin("click", "view"), "yes")
        .otherwise("no")
        .alias("pred"),
    )
    m = binary_metrics(e)

    def ppm(c: str):
        return F.round(F.col(c) * 1_000_000).cast("long").alias(f"{c}_ppm")

    return m.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.col("support").cast("long").alias("support"),
        ppm("accuracy"),
        ppm("precision"),
        ppm("recall"),
        ppm("f1"),
        ppm("jaccard"),
    )


def category_distribution_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cell = (
        F.when(F.col("lang") == "und", F.lit("Na"))
        .when(F.col("source").isin("src0", "src1"), F.lit("Global, white matter"))
        .otherwise(F.lit("cingulum, global"))
    )
    cats = d.select(categorise_cell(cell).alias("category"))
    counts = cats.groupBy("category").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "category", "n", F.round(F.col("n") / F.col("total") * 100, 6).alias("pct")
    )


def exact_unique_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(doc_fingerprint("text").alias("fp")).agg(
        F.count_distinct("fp").alias("n_unique"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def word_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=1, threshold=0.6)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def token_count_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("tokens"))


def lang_detect_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", detect_lang("text").alias("lang_pred"))


def quality_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile with EXACT percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, verified bit-equal) —
    the rollup a curation run reports before/after filtering."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical training-data curation gate composed from the text
    metrics: quality score × language ID × token-length band."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        token_count("text").alias("tokens"),
        detect_lang("text").alias("lang_pred"),
        quality_score("text").alias("quality"),
    )
    return scored.filter(
        (F.col("quality") >= 0.5)
        & (F.col("lang_pred") == "en")
        & F.col("tokens").between(5, 500)
    )


def cosine_topk_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    top = cosine_topk(emb, [float(x) for x in q], k=10)
    return top.select("id", F.round("cosine", 6).alias("cosine"))


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from llm_information_extraction_spark.operators.similarity import (
        embedding_near_dup_pairs_blocked,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs_blocked(emb, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-dim rollup touching the last uncovered table (supplier)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 6).alias("avg_acctbal"),
        )
    )


def label_space_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: sorted distinct label space (evaluation_gpt4_vs_gpt5.py:163)."""
    e = _t(spark, sf_dir, "events")
    return e.select("event_type").distinct().orderBy("event_type")


def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join + decimal-exact revenue rollup + deterministic top-k."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev_dec"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return (
        rev.join(F.broadcast(part), rev["l_partkey"] == part["p_partkey"])
        .select(
            "p_partkey",
            "p_name",
            F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            "n_items",
        )
        .orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
        .limit(15)
    )


def macro_f1_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-wise macro F1 (A3): per-label P/R/F1 over the event label
    sets, zero-support labels skipped, unweighted mean. The label sets
    feed three joins — cached so events is scanned once, not three times
    (InMemoryRelation reuse; same pattern as multilabel_metrics)."""
    j = _event_label_sets(spark, sf_dir).cache()
    gold_l = j.select("user_id", F.explode("gold").alias("label"))
    pred_l = j.select("user_id", F.explode("pred").alias("label"))
    tp = gold_l.join(pred_l, ["user_id", "label"]).groupBy("label").count()
    fp = pred_l.join(gold_l, ["user_id", "label"], "left_anti").groupBy("label").count()
    fn = gold_l.join(pred_l, ["user_id", "label"], "left_anti").groupBy("label").count()
    per = (
        tp.withColumnRenamed("count", "tp")
        .join(fp.withColumnRenamed("count", "fp"), "label", "full")
        .join(fn.withColumnRenamed("count", "fn"), "label", "full")
        .fillna(0, ["tp", "fp", "fn"])
    )
    f1 = 2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    return per.filter(F.col("tp") + F.col("fp") + F.col("fn") > 0).agg(
        F.round(F.avg(f1), 6).alias("macro_f1"),
        F.count(F.lit(1)).alias("n_labels"),
    )


def event_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """field×model-style pivot (A10): avg value per user-bucket × type."""
    e = _t(spark, sf_dir, "events").withColumn(
        "bucket", (F.col("user_id") % 4).cast("int")
    )
    out = (
        e.groupBy("bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.round(F.avg("value"), 6))
    )
    return out


def minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding → exact-Jaccard verify → CC groups. Oracled: on
    this corpus every qualifying pair has 3-gram Jaccard ≥ 0.889 (next
    pair down is 0.069), so banding recall at b=16/r=4 is 1 − 3.75e-7
    per pair — the groups equal the exact-Jaccard transitive closure the
    DuckDB recursive CTE computes (verified bit-exact at sf0.001/0.01)."""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return minhash_dedup_groups(d, threshold=0.5)


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless blocked SimHash pairs, portable-hash variant: bits come
    from md5 (which DuckDB also has), so the oracle recomputes the WHOLE
    pipeline — shingles → bit sums → signatures → brute-force Hamming —
    in SQL and must agree exactly. This also proves the multi-table
    blocking loses no pair."""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    pairs = simhash_near_dup_pairs(d, max_hamming=3, hash_fn="md5")
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def greedy_error_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5+A9 — oracled via the exact-match reduction: no two event-type
    labels have SequenceMatcher ratio ≥ 0.85 (max is 0.22), so greedy
    claiming == exact set matching and the totals are plain SQL."""
    g = greedy_error_analysis(_event_label_sets(spark, sf_dir))
    return g.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.round("tp_pct", 6).alias("tp_pct"),
        F.round("fp_pct", 6).alias("fp_pct"),
        F.round("fn_pct", 6).alias("fn_pct"),
    )


def no_lut_tracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-LUT prompt mode (brain_extraction_no_LUT.py:1-33): extraction
    restricted to whitematter_tracts. Tract surfaces are planted
    deterministically (the corpus vocabulary has zero overlap with the
    LUT, so the oracle enumerates exactly the planted mentions)."""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    planted = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" corpus callosum")
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" fornix")).otherwise(
                F.lit("")
            ),
        ).alias("payload"),
    )
    return extract_triples(planted, fields=["whitematter_tracts"])


def ivf_topk_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN end-to-end under the driver: with n_probe == n_centroids
    the probe set covers every cell, so the result equals exact top-k and
    the cosine_topk oracle applies verbatim."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    index, cents = ivf_index(emb, n_centroids=8)
    top = ivf_topk(index, cents, [float(x) for x in q], k=10, n_probe=8)
    return top.select("id", F.round("cosine", 6).alias("cosine"))


def table_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL csv-codec media decode under the driver: deterministic CSV
    payloads built from the documents table (header 'token,len' + one
    '<word>,<len>' row per word), featurized by the Arrow decode UDF;
    the oracle recomputes n_rows / max_row_len / numeric_ratio in SQL."""
    from llm_information_extraction_spark.functions.normalize import (
        normalize_text,
    )
    from llm_information_extraction_spark.operators.multimodal import (
        extract_media_features,
    )

    d = _t(spark, sf_dir, "documents")
    words = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda w: w != F.lit("")
    )
    lines = F.transform(
        words, lambda w: F.concat_ws(",", w, F.length(w).cast("string"))
    )
    csv = F.array_join(
        F.concat(F.array(F.lit("token,len")), lines), "\n"
    )
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("table").alias("kind"),
        F.encode(csv, "UTF-8").alias("payload"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit("csv").alias("codec"),
    ).repartition(spark.sparkContext.defaultParallelism)
    feats = extract_media_features(media)
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("long").alias("n_rows"),
        F.element_at("features", 2).cast("long").alias("max_row_len"),
        F.round(F.element_at("features", 3), 6).alias("numeric_ratio"),
    )


def sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (reproducible across engines
    and partitionings): keep doc iff md5-derived u(doc_id, salt) < 0.25."""
    from llm_information_extraction_spark.functions.sampling import hash_sample

    d = _t(spark, sf_dir, "documents")
    return hash_sample(d, 0.25, "doc_id", salt="r2").select("doc_id")


def split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) — a document
    keeps its split across reruns and corpus growth (no leakage)."""
    from llm_information_extraction_spark.functions.sampling import hash_split

    d = _t(spark, sf_dir, "documents")
    s = hash_split(
        d, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id", salt="r2"
    )
    return s.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


def co_mention_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG edge materialization: disease ↔ tract co-mention counts over a
    deterministically planted corpus (the base corpus has zero vocabulary
    overlap, so the oracle enumerates the planted co-occurrences)."""
    from llm_information_extraction_spark.operators.graph import (
        co_mention_edges,
    )

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    planted = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" alzheimers disease")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" corpus callosum")
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" fornix")).otherwise(
                F.lit("")
            ),
        ).alias("payload"),
    )
    mentions = extract_triples(planted)
    edges = co_mention_edges(mentions, "Disease_study", "whitematter_tracts")
    return edges.select(
        "obj_a", "obj_b", F.col("n_docs").cast("long").alias("n_docs")
    )


def winnow_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-window) fingerprint overlap pairs — partial
    containment detection; the md5-derived hash makes the ENTIRE
    pipeline (ordered shingles → window minima → pair counts)
    reproducible in DuckDB."""
    from llm_information_extraction_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    pairs = winnow_overlap_pairs(d, n=3, window=4, min_shared=3)
    return pairs.select(
        "id_a", "id_b", F.col("n_shared").cast("long").alias("n_shared")
    )


def kg_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG node degrees (docs per (pred, obj)) over the planted corpus —
    the fan-out statistic that drives broadcast/salting decisions."""
    from llm_information_extraction_spark.operators.graph import (
        predicate_object_degrees,
    )

    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    planted = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" alzheimers disease")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" corpus callosum")
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" fornix")).otherwise(
                F.lit("")
            ),
        ).alias("payload"),
    )
    mentions = extract_triples(
        planted, fields=["Disease_study", "whitematter_tracts", "patient_groups"]
    )
    deg = predicate_object_degrees(mentions)
    return deg.select(
        "pred", "obj", F.col("n_docs").cast("long").alias("n_docs")
    )


def event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (the batch analog of
    streaming.stateful.windowed_event_counts): 1-hour buckets per
    event_type. DuckDB's time_bucket is the oracle equivalent."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def entity_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph materialization (SURVEY §2.7): the ``entities`` dimension
    built by large-star/small-star connected components over the alias
    graph. The oracle inlines the same 409 vocabulary rows as VALUES and
    recomputes components via a recursive CTE, the representative
    canonical via count-then-value arg-max, and the sorted alias list —
    so the distributed CC implementation is value-checked end-to-end."""
    from llm_information_extraction_spark.operators.canonicalize import (
        build_entities,
    )

    e = build_entities(vocabulary_df(spark))
    return e.select(
        "entity_id",
        "field",
        "canonical",
        F.concat_ws("|", "aliases").alias("aliases"),
        F.col("n_aliases").cast("long").alias("n_aliases"),
    )


# ---------------------------------------------------------------------------
# non-SQL-expressible (rows-only checks)
# ---------------------------------------------------------------------------
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic raw8/csv media featurization — rows-only (the raw8 RNG
    payloads aren't reproducible in SQL). Output is EXPLODED to scalar
    cells (media_id, kind, feat_idx, feat_value, …): the driver hasher
    sorts values and cannot factorize array cells."""
    from llm_information_extraction_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    feats = extract_media_features(synth_media(spark, 200, seed=42))
    ex = feats.select(
        "media_id",
        "kind",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        "error",
        F.posexplode_outer("features").alias("feat_idx", "feat_value"),
    )
    return ex.select(
        "media_id",
        "kind",
        "feat_idx",
        F.round("feat_value", 6).alias("feat_value"),
        "mean_intensity",
        "error",
    )


def _with_shipping(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        name: _with_shipping(fn)
        for name, fn in _RAW_QUERIES.items()
    }


_RAW_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # flagship + reference-operator analogs
        "kg_triples": kg_triples,
        "kg_triples_chunked": kg_triples_chunked,
        "q1_pricing_summary": q1_pricing_summary,
        "top_orders": top_orders,
        "orders_customer_join": orders_customer_join,
        "nation_region_rollup": nation_region_rollup,
        "normalize_docs": normalize_docs,
        "clean_split_tokens": clean_split_tokens,
        "lang_canonicalize": lang_canonicalize,
        "multilabel_micro": multilabel_micro,
        "samples_jaccard_subset": samples_jaccard_subset,
        "binary_metrics_events": binary_metrics_events,
        "category_distribution_docs": category_distribution_docs,
        "suppliers_per_nation": suppliers_per_nation,
        "label_space_sorted": label_space_sorted,
        "top_parts_by_revenue": top_parts_by_revenue,
        "macro_f1_events": macro_f1_events,
        "event_value_pivot": event_value_pivot,
        # training-data ops
        "exact_unique_docs": exact_unique_docs,
        "word_jaccard_pairs": word_jaccard_pairs,
        "token_count_docs": token_count_docs,
        "lang_detect_docs": lang_detect_docs,
        "quality_score_docs": quality_score_docs,
        "curated_docs": curated_docs,
        "corpus_stats": corpus_stats,
        "cosine_topk_emb": cosine_topk_emb,
        "embedding_near_dups": embedding_near_dups,
        "minhash_dedup": minhash_dedup,
        "simhash_pairs": simhash_pairs,
        "greedy_error_totals": greedy_error_totals,
        "no_lut_tracts": no_lut_tracts,
        "ivf_topk_emb": ivf_topk_emb,
        "table_media_features": table_media_features,
        "entity_table": entity_table,
        "event_windows": event_windows,
        "sampled_docs": sampled_docs,
        "split_counts": split_counts,
        "co_mention_graph": co_mention_graph,
        "kg_degrees": kg_degrees,
        "winnow_overlaps": winnow_overlaps,
        # non-SQL (rows-only)
        "media_features": media_features,
}


def oracle_sql() -> dict[str, str]:
    norm = (
        "trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))"
    )
    words = f"list_filter(string_split({norm}, ' '), x -> x <> '')"

    # -- generated md5-SimHash replication (simhash_pairs oracle) ----------
    # mirrors dedup.simhash_signatures(hash_fn='md5') bit for bit:
    # bit b of a shingle = bit (3 - b%4) of hex digit b//4 of md5(shingle);
    # signature bit set iff 2*sum(bit) >= n_shingles; brute-force Hamming.
    digit_exprs = ",\n                   ".join(
        f"strpos('0123456789abcdef', substr(md5(shingle), {i + 1}, 1)) - 1"
        f" AS d{i}"
        for i in range(16)
    )
    bit_sums = ",\n                   ".join(
        f"sum((d{b // 4} >> {3 - b % 4}) & 1) AS b{b}" for b in range(64)
    )
    sig_bits = ",\n                   ".join(
        f"CASE WHEN 2 * b{b} >= cnt THEN 1 ELSE 0 END AS t{b}"
        for b in range(64)
    )
    hamm = "\n                       + ".join(
        f"(CASE WHEN a.t{b} <> b.t{b} THEN 1 ELSE 0 END)" for b in range(64)
    )

    # -- generated entities oracle: inline the vocabulary as VALUES --------
    from llm_information_extraction_spark import vocab as _vocab

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vocab_values = ",\n                 ".join(
        f"({_q(f)}, {_q(s)}, {_q(c)})" for f, s, c in _vocab.gazetteer_rows()
    )
    simhash_sql = f"""
            WITH w AS (SELECT doc_id, {words} AS ws FROM documents),
                 sh AS (SELECT doc_id AS id, list_distinct(list_transform(
                          range(1, greatest(len(ws) - 1, 1) + 1),
                          i -> array_to_string(ws[i:i+1], ' '))) AS shingles
                        FROM w),
                 tok AS (SELECT id, s AS shingle
                         FROM sh, unnest(shingles) AS t(s)),
                 dg AS (SELECT id,
                   {digit_exprs}
                 FROM tok),
                 sums AS (SELECT id, count(*) AS cnt,
                   {bit_sums}
                 FROM dg GROUP BY id),
                 bits AS (SELECT id,
                   {sig_bits}
                 FROM sums),
                 pairs AS (SELECT a.id AS id_a, b.id AS id_b,
                       {hamm} AS hamming
                   FROM bits a JOIN bits b ON a.id < b.id)
            SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
            FROM pairs WHERE hamming <= 3
    """
    stop_en = "['the','and','of','to','a','in','is','that','for','it']"
    stop_de = "['der','die','und','das','ist','nicht','ein','mit','zu']"
    stop_fr = "['le','la','les','et','des','est','une','dans','que']"
    stop_es = "['el','la','los','las','es','una','para','que','por']"
    tok_pattern = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

    # reusable per-doc text metrics (each is its own oracle AND a CTE of
    # the composite curated_docs gate)
    tok_sql = f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                        '{tok_pattern}')) AS INTEGER) AS tokens
            FROM documents
    """
    lang_sql = f"""
            WITH w AS (
              SELECT doc_id, {words} AS ws FROM documents),
                 s AS (
              SELECT doc_id,
                     len(list_intersect(ws, {stop_de})) AS s_de,
                     len(list_intersect(ws, {stop_en})) AS s_en,
                     len(list_intersect(ws, {stop_es})) AS s_es,
                     len(list_intersect(ws, {stop_fr})) AS s_fr
              FROM w)
            SELECT doc_id,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                        WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
                            THEN 'de'
                        WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                        WHEN s_es >= s_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM s
    """
    quality_sql = f"""
            WITH b AS (
              SELECT doc_id,
                     coalesce(text, '') AS t,
                     len(list_filter(regexp_split_to_array(
                         lower(coalesce(text, '')), '\\s+'), x -> x <> ''))
                         AS n_words,
                     len(regexp_replace(coalesce(text, ''),
                         '[^!-/:-@\\[-`{{-~]', '', 'g')) AS punct,
                     len(list_intersect(
                         list_filter(regexp_split_to_array(
                             lower(coalesce(text, '')), '\\s+'),
                             x -> x <> ''),
                         {stop_en})) AS sw_hits
              FROM documents)
            SELECT doc_id,
                   round(
                     0.4 * (CASE WHEN n_words BETWEEN 5 AND 100000
                                 THEN 1.0 ELSE 0.0 END)
                     + 0.3 * greatest(0.0, 1.0 - least(
                         CASE WHEN len(t) > 0
                              THEN punct * 5.0 / len(t) ELSE 0.0 END, 1.0))
                     + 0.3 * least(sw_hits / 3.0, 1.0), 6) AS quality
            FROM b
    """

    out = {
        "kg_triples": """
            -- The driver testdata's text is drawn from a small generic
            -- vocabulary with ZERO overlap with the controlled
            -- vocabularies (verified offline), so the correct pipeline
            -- output is exactly the three binary-default triples per
            -- document: no gazetteer false positives, defaults 'no'
            -- (brain_extraction.py:55), every doc covered.
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, pred, 'no' AS obj
            FROM documents
            CROSS JOIN (VALUES ('DTI_study'), ('Human_study'),
                               ('Dementia_study')) AS b(pred)
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_base_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "orders_customer_join": """
            SELECT o_orderkey, coalesce(c_name, '') AS c_name
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice > 400000
        """,
        "nation_region_rollup": """
            SELECT r_name, count(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "normalize_docs": f"""
            SELECT doc_id, {norm} AS norm FROM documents
        """,
        "clean_split_tokens": f"""
            WITH s AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(
                         source || ';' || lang || ', NA ,  Unknown, ok'
                     ), '\\s+', ' ', 'g')) AS v
              FROM documents
            )
            SELECT doc_id, tok AS token
            FROM s, unnest(list_filter(
                     list_transform(string_split(replace(v, ';', ','), ','),
                                    x -> trim(x)),
                     x -> x <> '' AND x NOT IN {EMPTY_TOKENS_SQL})) AS t(tok)
        """,
        "lang_canonicalize": """
            WITH cmap(surface, canonical) AS (VALUES
              ('en','english'), ('de','german'), ('fr','french'),
              ('es','spanish'), ('und','unknown'))
            SELECT doc_id,
                   coalesce(canonical,
                            trim(regexp_replace(lower(coalesce(lang,'')),
                                                '\\s+', ' ', 'g')))
                       AS lang_canonical
            FROM documents
            LEFT JOIN cmap
              ON trim(regexp_replace(lower(coalesce(lang,'')), '\\s+', ' ', 'g'))
                 = surface
        """,
        "multilabel_micro": """
            WITH g AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 0),
                 p AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 1
                         AND user_id IN (SELECT user_id FROM g)),
                 c AS (SELECT
                   (SELECT count(*) FROM g JOIN p
                      USING (user_id, event_type)) AS tp,
                   (SELECT count(*) FROM p ANTI JOIN g
                      USING (user_id, event_type)) AS fp,
                   (SELECT count(*) FROM g ANTI JOIN p
                      USING (user_id, event_type)) AS fn)
            SELECT round(tp / (tp + fp), 6) AS micro_p,
                   round(tp / (tp + fn), 6) AS micro_r,
                   round(2.0 * tp / (2 * tp + fp + fn), 6) AS micro_f1
            FROM c
        """,
        "samples_jaccard_subset": """
            WITH g AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 0),
                 p AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 1
                         AND user_id IN (SELECT user_id FROM g)),
                 gs AS (SELECT user_id, count(*) AS ng FROM g GROUP BY user_id),
                 ps AS (SELECT user_id, count(*) AS np FROM p GROUP BY user_id),
                 tps AS (SELECT user_id, count(*) AS tp FROM g JOIN p
                         USING (user_id, event_type) GROUP BY user_id),
                 per AS (
                   SELECT gs.user_id, gs.ng,
                          coalesce(ps.np, 0) AS np,
                          coalesce(tps.tp, 0) AS tp
                   FROM gs LEFT JOIN ps USING (user_id)
                           LEFT JOIN tps USING (user_id))
            SELECT round(avg(tp * 1.0 / (ng + np - tp)), 6) AS jaccard_samples,
                   round(avg(CASE WHEN tp = ng AND tp = np THEN 1.0
                                  ELSE 0.0 END), 6) AS subset_accuracy
            FROM per
        """,
        "binary_metrics_events": """
            -- all-BIGINT output (counts + ppm-scaled metrics): DuckDB's
            -- sum() widens to HUGEINT, which round 1 showed flakes the
            -- driver hasher; every column is explicitly CAST
            WITH l AS (SELECT
                   CASE WHEN value >= 0.5 THEN 'yes' ELSE 'no' END AS gold,
                   CASE WHEN event_type IN ('click', 'view') THEN 'yes'
                        ELSE 'no' END AS pred
                 FROM events),
                 c AS (SELECT
                   sum(CASE WHEN gold = 'yes' AND pred = 'yes' THEN 1 ELSE 0 END) AS tp,
                   sum(CASE WHEN gold = 'no'  AND pred = 'yes' THEN 1 ELSE 0 END) AS fp,
                   sum(CASE WHEN gold = 'yes' AND pred = 'no'  THEN 1 ELSE 0 END) AS fn,
                   sum(CASE WHEN gold = 'no'  AND pred = 'no'  THEN 1 ELSE 0 END) AS tn
                 FROM l)
            SELECT CAST(tp AS BIGINT) AS tp,
                   CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn,
                   CAST(tn AS BIGINT) AS tn,
                   CAST(tp + fn AS BIGINT) AS support,
                   CAST(round((tp + tn) * 1.0 / (tp + tn + fp + fn) * 1000000)
                        AS BIGINT) AS accuracy_ppm,
                   CAST(round(tp * 1.0 / (tp + fp) * 1000000) AS BIGINT)
                       AS precision_ppm,
                   CAST(round(tp * 1.0 / (tp + fn) * 1000000) AS BIGINT)
                       AS recall_ppm,
                   CAST(round(2.0 * tp / (2 * tp + fp + fn) * 1000000)
                        AS BIGINT) AS f1_ppm,
                   CAST(round(tp * 1.0 / (tp + fp + fn) * 1000000) AS BIGINT)
                       AS jaccard_ppm
            FROM c
        """,
        "category_distribution_docs": """
            WITH cats AS (
              SELECT CASE WHEN lang = 'und' THEN 'NA'
                          WHEN source IN ('src0', 'src1') THEN 'Global'
                          ELSE 'Specific' END AS category
              FROM documents),
                 counts AS (SELECT category, count(*) AS n FROM cats
                            GROUP BY category)
            SELECT category, n,
                   round(n * 100.0 / (SELECT sum(n) FROM counts), 6) AS pct
            FROM counts
        """,
        "suppliers_per_nation": """
            SELECT n_name, count(*) AS n_suppliers,
                   round(avg(s_acctbal), 6) AS avg_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "label_space_sorted": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type
        """,
        "top_parts_by_revenue": """
            WITH rev AS (
              SELECT l_partkey,
                     sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))) AS rev_dec,
                     count(*) AS n_items
              FROM lineitem GROUP BY l_partkey)
            SELECT p_partkey, p_name,
                   round(CAST(rev_dec AS DOUBLE), 2) AS revenue, n_items
            FROM rev JOIN part ON l_partkey = p_partkey
            ORDER BY revenue DESC, p_partkey ASC
            LIMIT 15
        """,
        "macro_f1_events": """
            WITH g AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 0),
                 p AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 1
                         AND user_id IN (SELECT user_id FROM g)),
                 tp AS (SELECT event_type AS label, count(*) AS tp FROM g
                        JOIN p USING (user_id, event_type)
                        GROUP BY event_type),
                 fp AS (SELECT event_type AS label, count(*) AS fp FROM p
                        ANTI JOIN g USING (user_id, event_type)
                        GROUP BY event_type),
                 fn AS (SELECT event_type AS label, count(*) AS fn FROM g
                        ANTI JOIN p USING (user_id, event_type)
                        GROUP BY event_type),
                 labels AS (SELECT label FROM tp UNION
                            SELECT label FROM fp UNION
                            SELECT label FROM fn),
                 per AS (
                   SELECT l.label, coalesce(tp.tp, 0) AS tp,
                          coalesce(fp.fp, 0) AS fp, coalesce(fn.fn, 0) AS fn
                   FROM labels l LEFT JOIN tp USING (label)
                        LEFT JOIN fp USING (label) LEFT JOIN fn USING (label))
            SELECT round(avg(2.0 * tp / (2 * tp + fp + fn)), 6) AS macro_f1,
                   count(*) AS n_labels
            FROM per
            WHERE tp + fp + fn > 0
        """,
        "event_value_pivot": """
            SELECT CAST(user_id % 4 AS INTEGER) AS bucket,
                   round(avg(CASE WHEN event_type = 'click' THEN value END), 6)
                       AS click,
                   round(avg(CASE WHEN event_type = 'error' THEN value END), 6)
                       AS error,
                   round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6)
                       AS purchase,
                   round(avg(CASE WHEN event_type = 'signup' THEN value END), 6)
                       AS signup,
                   round(avg(CASE WHEN event_type = 'view' THEN value END), 6)
                       AS view
            FROM events
            GROUP BY 1
        """,
        "exact_unique_docs": f"""
            SELECT count(DISTINCT md5({norm})) AS n_unique,
                   count(*) AS n_docs
            FROM documents
        """,
        "word_jaccard_pairs": f"""
            WITH sh AS (
              SELECT doc_id AS id,
                     list_distinct({words}) AS shingles
              FROM documents),
                 tok AS (
              SELECT id, len(shingles) AS sz, w AS shingle
              FROM sh, unnest(shingles) AS t(w)),
                 inter AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     a.sz AS size_a, b.sz AS size_b,
                     count(*) AS c
              FROM tok a JOIN tok b USING (shingle)
              WHERE a.id < b.id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b,
                   round(c * 1.0 / (size_a + size_b - c), 6) AS jaccard
            FROM inter
            WHERE c * 1.0 / (size_a + size_b - c) >= 0.6
        """,
        "token_count_docs": tok_sql,
        "lang_detect_docs": lang_sql,
        "quality_score_docs": quality_sql,
        "curated_docs": f"""
            -- the canonical curation gate: quality x language x length
            WITH q AS ({quality_sql}), l AS ({lang_sql}), t AS ({tok_sql})
            SELECT q.doc_id, t.tokens, l.lang_pred, q.quality
            FROM q JOIN l USING (doc_id) JOIN t USING (doc_id)
            WHERE q.quality >= 0.5 AND l.lang_pred = 'en'
              AND t.tokens BETWEEN 5 AND 500
        """,
        "cosine_topk_emb": """
            SELECT vec_id AS id,
                   round(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding FROM embeddings
                        WHERE vec_id = 0)::DOUBLE[]), 6) AS cosine
            FROM embeddings
            ORDER BY list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding FROM embeddings
                        WHERE vec_id = 0)::DOUBLE[]) DESC, vec_id ASC
            LIMIT 10
        """,
        "embedding_near_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5
        """,
        "minhash_dedup": f"""
            -- exact 3-gram-Jaccard near-dup groups: equal to the MinHash
            -- pipeline because banding recall is 1 on this corpus (every
            -- qualifying pair has j >= 0.889; see minhash_dedup docstring)
            WITH RECURSIVE
                 w AS (SELECT doc_id, {words} AS ws FROM documents),
                 sh AS (SELECT CAST(doc_id AS VARCHAR) AS id,
                          list_distinct(list_transform(
                            range(1, greatest(len(ws) - 2, 1) + 1),
                            i -> array_to_string(ws[i:i+2], ' ')))
                          AS shingles
                        FROM w),
                 tok AS (SELECT id, len(shingles) AS sz, s AS shingle
                         FROM sh, unnest(shingles) AS t(s)),
                 inter AS (SELECT a.id AS id_a, b.id AS id_b,
                             a.sz AS sa, b.sz AS sb, count(*) AS c
                           FROM tok a JOIN tok b USING (shingle)
                           WHERE a.id < b.id
                           GROUP BY 1, 2, 3, 4),
                 edges AS (SELECT id_a, id_b FROM inter
                           WHERE c * 1.0 / (sa + sb - c) >= 0.5),
                 sym AS (SELECT id_a AS a, id_b AS b FROM edges
                         UNION SELECT id_b, id_a FROM edges),
                 reach(a, b) AS (
                   SELECT a, b FROM sym
                   UNION
                   SELECT reach.a, sym.b FROM reach
                   JOIN sym ON reach.b = sym.a
                   WHERE sym.b <> reach.a)
            SELECT a AS doc_id, least(a, min(b)) AS group_id
            FROM reach GROUP BY a
        """,
        "simhash_pairs": simhash_sql,
        "greedy_error_totals": """
            -- greedy matching == exact set matching on this label space
            -- (no cross-label SequenceMatcher ratio reaches 0.85)
            WITH g AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 0),
                 p AS (SELECT DISTINCT user_id, event_type FROM events
                       WHERE event_id % 2 = 1
                         AND user_id IN (SELECT user_id FROM g)),
                 c AS (SELECT
                   (SELECT count(*) FROM g JOIN p
                      USING (user_id, event_type)) AS tp,
                   (SELECT count(*) FROM p ANTI JOIN g
                      USING (user_id, event_type)) AS fp,
                   (SELECT count(*) FROM g ANTI JOIN p
                      USING (user_id, event_type)) AS fn)
            SELECT CAST(tp AS BIGINT) AS tp,
                   CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn,
                   round(tp * 1.0 / (tp + fp + fn) * 100, 6) AS tp_pct,
                   round(fp * 1.0 / (tp + fp + fn) * 100, 6) AS fp_pct,
                   round(fn * 1.0 / (tp + fp + fn) * 100, 6) AS fn_pct
            FROM c
        """,
        "no_lut_tracts": """
            -- the corpus vocabulary has zero overlap with the LUT and no
            -- animal/review markers, so the fields-restricted extraction
            -- returns exactly the planted tract mentions
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'whitematter_tracts' AS pred,
                   'corpus callosum' AS obj
            FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'whitematter_tracts', 'fornix'
            FROM documents WHERE doc_id % 5 = 0
        """,
        "ivf_topk_emb": """
            -- n_probe == n_centroids makes IVF exhaustive == exact top-k
            SELECT vec_id AS id,
                   round(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding FROM embeddings
                        WHERE vec_id = 0)::DOUBLE[]), 6) AS cosine
            FROM embeddings
            ORDER BY list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding FROM embeddings
                        WHERE vec_id = 0)::DOUBLE[]) DESC, vec_id ASC
            LIMIT 10
        """,
        "table_media_features": f"""
            -- replicate the csv payload construction + the decode UDF's
            -- feature math (n_rows / max cells per row / numeric ratio)
            WITH w AS (SELECT doc_id, {words} AS ws FROM documents),
                 lines AS (SELECT doc_id,
                     list_concat(['token,len'],
                         list_transform(ws,
                             x -> x || ',' || CAST(length(x) AS VARCHAR)))
                         AS ls
                   FROM w),
                 cells AS (SELECT doc_id, ls,
                     flatten(list_transform(ls, l -> string_split(l, ',')))
                         AS cs
                   FROM lines)
            SELECT CAST(doc_id AS VARCHAR) AS media_id,
                   CAST(len(ls) AS BIGINT) AS n_rows,
                   CAST(list_max(list_transform(
                        ls, l -> len(string_split(l, ',')))) AS BIGINT)
                       AS max_row_len,
                   round(len(list_filter(cs,
                         c -> regexp_matches(c, '^-*[0-9]*\\.?[0-9]*$')
                              AND regexp_matches(c, '[0-9]'))) * 1.0
                         / len(cs), 6) AS numeric_ratio
            FROM cells
        """,
        "sampled_docs": """
            -- u(key) = first-8-md5-hex / 2^32, identical math both engines
            SELECT doc_id FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r2'), 1, 8))
                      ::BIGINT / 4294967296.0 < 0.25
        """,
        "split_counts": """
            WITH u AS (
              SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r2'),
                                     1, 8))::BIGINT / 4294967296.0 AS u
              FROM documents)
            SELECT CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*) AS n_docs
            FROM u GROUP BY 1
        """,
        "co_mention_graph": """
            -- the planted corpus is the spec: disease on doc_id%3, tracts
            -- on %7 and %5; the base text never matches the vocabulary
            WITH pairs AS (
              SELECT 'alzheimers disease' AS obj_a,
                     'corpus callosum' AS obj_b, count(*) AS n_docs
              FROM documents WHERE doc_id % 3 = 0 AND doc_id % 7 = 0
              UNION ALL
              SELECT 'alzheimers disease', 'fornix', count(*)
              FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 = 0)
            SELECT obj_a, obj_b, CAST(n_docs AS BIGINT) AS n_docs
            FROM pairs WHERE n_docs > 0
        """,
        "corpus_stats": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 6) AS avg_chars,
                   round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
                   round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY lang
        """,
        "winnow_overlaps": f"""
            -- full winnowing replication: ordered 3-gram shingles →
            -- 32-bit md5 hashes → 4-wide window minima (distinct) →
            -- fingerprint equi-join pair counts
            WITH w AS (SELECT doc_id, {words} AS ws FROM documents),
                 sh AS (SELECT doc_id AS id,
                          list_transform(
                            range(1, greatest(len(ws) - 2, 1) + 1),
                            i -> array_to_string(ws[i:i+2], ' ')) AS sgs
                        FROM w),
                 hs AS (SELECT id,
                          list_transform(sgs, s ->
                            ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hh
                        FROM sh),
                 fps AS (SELECT id,
                          list_distinct(list_transform(
                            range(1, greatest(len(hh) - 3, 1) + 1),
                            i -> list_min(hh[i:i+3]))) AS fp
                        FROM hs),
                 tok AS (SELECT id, f AS fp FROM fps, unnest(fp) AS t(f)),
                 pairs AS (SELECT a.id AS id_a, b.id AS id_b,
                             count(*) AS n_shared
                           FROM tok a JOIN tok b USING (fp)
                           WHERE a.id < b.id
                           GROUP BY 1, 2)
            SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
            FROM pairs WHERE n_shared >= 3
        """,
        "kg_degrees": """
            -- planted corpus: disease on %3 (fans out to Disease_study
            -- AND patient_groups via the shared vocabulary), tracts on
            -- %7 and %5; base text never matches the vocabulary
            WITH deg AS (
              SELECT 'Disease_study' AS pred, 'alzheimers disease' AS obj,
                     count(*) AS n_docs
              FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT 'patient_groups', 'alzheimers disease', count(*)
              FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT 'whitematter_tracts', 'corpus callosum', count(*)
              FROM documents WHERE doc_id % 7 = 0
              UNION ALL
              SELECT 'whitematter_tracts', 'fornix', count(*)
              FROM documents WHERE doc_id % 5 = 0)
            SELECT pred, obj, CAST(n_docs AS BIGINT) AS n_docs
            FROM deg WHERE n_docs > 0
        """,
        "event_windows": """
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(avg(value), 6) AS avg_value
            FROM events
            GROUP BY 1, 2
        """,
        "entity_table": f"""
            -- recompute build_entities in SQL: per-field connected
            -- components over surface<->canonical alias edges (recursive
            -- closure == the large-star/small-star fixpoint), entity_id =
            -- lexicographically smallest member, canonical = arg-max by
            -- (vote count, value), aliases = sorted member list
            WITH RECURSIVE vocab(field, surface, canonical) AS (VALUES
                 {vocab_values}),
                 edges AS (SELECT DISTINCT field,
                             least(surface, canonical) AS a,
                             greatest(surface, canonical) AS b
                           FROM vocab WHERE surface <> canonical),
                 sym AS (SELECT field, a, b FROM edges
                         UNION SELECT field, b, a FROM edges),
                 reach(field, a, b) AS (
                   SELECT field, a, b FROM sym
                   UNION
                   SELECT r.field, r.a, s.b FROM reach r
                   JOIN sym s ON r.field = s.field AND r.b = s.a
                   WHERE s.b <> r.a),
                 comp AS (SELECT field, a AS node, least(a, min(b)) AS component
                          FROM reach GROUP BY field, a),
                 allnodes AS (SELECT DISTINCT field, surface AS node FROM vocab
                              UNION
                              SELECT DISTINCT field, canonical FROM vocab),
                 members AS (SELECT n.field, n.node AS alias,
                               coalesce(c.component, n.node) AS entity_id
                             FROM allnodes n LEFT JOIN comp c
                               ON n.field = c.field AND n.node = c.node),
                 votes AS (SELECT m.field, m.entity_id, v.canonical,
                             count(*) AS cnt
                           FROM vocab v JOIN members m
                             ON v.field = m.field AND v.surface = m.alias
                           GROUP BY 1, 2, 3),
                 top AS (SELECT field, entity_id, canonical FROM votes
                         QUALIFY row_number() OVER (
                           PARTITION BY field, entity_id
                           ORDER BY cnt DESC, canonical DESC) = 1),
                 agg AS (SELECT field, entity_id,
                           list_sort(list_distinct(list(alias))) AS aliases
                         FROM members GROUP BY 1, 2)
            SELECT a.entity_id, a.field,
                   coalesce(t.canonical, a.entity_id) AS canonical,
                   array_to_string(a.aliases, '|') AS aliases,
                   CAST(len(a.aliases) AS BIGINT) AS n_aliases
            FROM agg a LEFT JOIN top t
              ON a.field = t.field AND a.entity_id = t.entity_id
        """,
    }
    # the chunked path must be triple-identical to the unchunked flagship
    out["kg_triples_chunked"] = out["kg_triples"]
    return out
