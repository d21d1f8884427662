"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on the
sf0.001 documents table (flat → interleaved spans → payload → gazetteer
extraction → entity linking → canonical triples).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` carries
the DuckDB-equivalent SQL for every SQL-expressible one. Non-SQL ops
(difflib fuzzy matching, xxhash-based MinHash/SimHash, LSH, the full KG
pipeline, multimodal decode) are listed without an oracle → the driver
records rows-only checks for them.

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
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), "kgx_entry_pkg.zip")
    if not os.path.exists(zpath):
        pkg = Path(_REPO) / "llm_information_extraction_spark"
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for f in pkg.rglob("*"):
                if f.is_file() and "__pycache__" not in str(f):
                    zf.write(f, f.relative_to(Path(_REPO)))
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
    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("value") >= 0.5, "yes").otherwise("no").alias("gold"),
        F.when(F.col("event_type").isin("click", "view"), "yes")
        .otherwise("no")
        .alias("pred"),
    )
    m = binary_metrics(e)
    return m.select(
        F.round("accuracy", 6).alias("accuracy"),
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
        F.round("jaccard", 6).alias("jaccard"),
        F.col("support").cast("long").alias("support"),
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
    sets, zero-support labels skipped, unweighted mean."""
    j = _event_label_sets(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# non-SQL-expressible (rows-only checks)
# ---------------------------------------------------------------------------
def minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_dedup_groups(d, threshold=0.5)


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, max_hamming=10)


def greedy_error_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return greedy_error_analysis(_event_label_sets(spark, sf_dir))


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from llm_information_extraction_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    return extract_media_features(synth_media(spark, 200, seed=42))


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
        "cosine_topk_emb": cosine_topk_emb,
        "embedding_near_dups": embedding_near_dups,
        # non-SQL (rows-only)
        "minhash_dedup": minhash_dedup,
        "simhash_pairs": simhash_pairs,
        "greedy_error_totals": greedy_error_totals,
        "media_features": media_features,
}


def oracle_sql() -> dict[str, str]:
    norm = (
        "trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))"
    )
    words = f"list_filter(string_split({norm}, ' '), x -> x <> '')"
    stop_en = "['the','and','of','to','a','in','is','that','for','it']"
    stop_de = "['der','die','und','das','ist','nicht','ein','mit','zu']"
    stop_fr = "['le','la','les','et','des','est','une','dans','que']"
    stop_es = "['el','la','los','las','es','una','para','que','por']"
    tok_pattern = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

    return {
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
            SELECT round((tp + tn) * 1.0 / (tp + tn + fp + fn), 6) AS accuracy,
                   round(tp * 1.0 / (tp + fp), 6) AS precision,
                   round(tp * 1.0 / (tp + fn), 6) AS recall,
                   round(2.0 * tp / (2 * tp + fp + fn), 6) AS f1,
                   round(tp * 1.0 / (tp + fp + fn), 6) AS jaccard,
                   (tp + fn) AS support
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
        "token_count_docs": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                        '{tok_pattern}')) AS INTEGER) AS tokens
            FROM documents
        """,
        "lang_detect_docs": f"""
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
        """,
        "quality_score_docs": f"""
            WITH b AS (
              SELECT doc_id,
                     coalesce(text, '') AS t,
                     len(list_filter(string_split(lower(coalesce(text, '')),
                                                  ' '), x -> x <> ''))
                         AS n_words_sp,
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
    }
