"""Skew handling: salted joins + oversized-document chunking.

North-rule requirements (SURVEY §4): hot entities and oversized documents
must not serialize the pipeline.

- **Hot keys in joins** → :func:`salted_join`: the skewed (big) side gets
  a deterministic salt in [0, buckets); the small side is replicated once
  per salt value; the join key becomes (key, salt), spreading one hot key
  over ``buckets`` shuffle partitions. AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, on in session.py) handles the
  same problem reactively at runtime; explicit salting is for when you
  know the skew up front (e.g. 'corpus callosum' dominating mentions).
- **Hot keys in aggregations** are already fine: hash aggregates do
  map-side partial aggregation, so a hot group reduces per-partition
  before the shuffle.
- **Oversized documents** → :func:`chunk_spans`: split a document's span
  sequence into ≤``max_spans`` chunks that are extracted independently
  and merged — exactly the reference's chunk semantics
  (``_merge_chunk_results``, /root/reference/main.py:168-175: per-field
  list union across chunks, then per-paper dedup at :201-203). Arrow
  batch sizes stay bounded no matter how large one document is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: list[Column | str], buckets: int) -> Column:
    """Salt in [0, buckets) derived from row content — stable across task
    retries (F.rand is not, which corrupts joins under speculation)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*cs), F.lit(buckets)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    buckets: int = 16,
    how: str = "inner",
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    ``salt_source`` names big-side columns that vary within a hot key
    (defaults to all non-key columns) so the salt actually spreads rows.
    """
    keys = [key] if isinstance(key, str) else list(key)
    src = salt_source or [c for c in big.columns if c not in keys]
    if not src:
        src = keys
    big_s = big.withColumn("__salt", deterministic_salt(src, buckets))
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>")),
    )
    out = big_s.join(small_s, [*keys, "__salt"], how)
    return out.drop("__salt")


def chunk_spans(
    docs: DataFrame,
    max_spans: int = 64,
    spans_col: str = "spans",
) -> DataFrame:
    """documents(doc_id, spans) → (doc_id, chunk_id, spans) with ≤max_spans
    spans per row, preserving document order within and across chunks.

    Downstream: build_payload + extract per chunk, then dedup on
    (doc_id, pred, obj) — the union-merge of the reference's
    _merge_chunk_results (main.py:168-175) composed with its per-paper
    dedup (main.py:201-203).
    """
    c = F.col(spans_col)
    ordered = F.array_sort(
        F.transform(
            c,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )

    # bind the sorted array ONCE (1-element-array transform scope):
    # referencing `ordered` inside the per-chunk lambda would re-sort the
    # whole span array for every chunk — exactly quadratic on the
    # oversized documents this operator exists for
    def build(ord_spans: Column) -> Column:
        n_chunks = F.greatest(
            F.ceil(F.size(ord_spans) / F.lit(max_spans)).cast("int"), F.lit(1)
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.transform(
                    F.slice(ord_spans, i * max_spans + 1, max_spans),
                    lambda s: F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                        s["offset"].alias("offset"),
                    ),
                ).alias("spans"),
            ),
        )

    chunks = F.transform(F.array(ordered), build)[0]
    return docs.select(
        "doc_id", F.explode(chunks).alias("__c")
    ).select("doc_id", F.col("__c.chunk_id").alias("chunk_id"),
             F.col("__c.spans").alias("spans"))


def extract_chunked(docs: DataFrame, max_spans: int = 64, mode: str = "full_text"):
    """Oversized-doc-safe extraction: chunk → payload → extract → merge.

    Returns the same (doc_id, pred, obj) contract as the unchunked path,
    and is EXACT (tested on marker-split corpora): per-surface matches
    union correctly because chunks cut at span boundaries and phrases
    never cross spans, but the animal/review pre-filter, study_type, and
    Human_study are DOC-level rules — a chunk can't see another chunk's
    markers. Those are re-resolved here from doc-level flag aggregates:

    - ``animal``/``review`` flags come from a JVM ``rlike`` over each
      chunk payload (same pattern strings as the extractor's rules),
      OR-ed per doc — one codegen'd aggregate, no second Python pass;
    - tracts are dropped for flagged docs (the MUST-return-[] rule,
      brain_extraction.py:35);
    - ``study_type = 'single study'`` rows are dropped when the doc is a
      review anywhere (the unchunked elif);
    - ``Human_study`` is recomputed as (humans mentioned anywhere) AND
      NOT (animal anywhere) — yes-wins merging would wrongly flip it to
      'yes' when one chunk has humans and another has the animal marker.
    """
    from ..functions.normalize import normalize_text
    from .extraction import extract_triples, marker_patterns, merge_binary_yes_wins
    from .payload import build_payload

    chunked = chunk_spans(docs, max_spans)
    payload = build_payload(chunked, mode=mode)

    pats = marker_patterns()
    norm = normalize_text(F.col("payload"))
    doc_flags = (
        payload.select(
            "doc_id",
            norm.rlike(pats["animal"]).alias("animal"),
            norm.rlike(pats["review"]).alias("review"),
        )
        .groupBy("doc_id")
        .agg(F.max("animal").alias("animal"), F.max("review").alias("review"))
    )

    mentions = extract_triples(payload).dropDuplicates(["doc_id", "pred", "obj"])
    merged = merge_binary_yes_wins(mentions).join(doc_flags, "doc_id", "left")
    animal = F.coalesce("animal", F.lit(False))
    review = F.coalesce("review", F.lit(False))
    corrected = merged.filter(
        ~((F.col("pred") == "whitematter_tracts") & (animal | review))
    ).filter(
        ~(
            (F.col("pred") == "study_type")
            & (F.col("obj") == "single study")
            & review
        )
    )

    has_humans = (
        mentions.filter(
            (F.col("pred") == "subjects") & (F.col("obj") == "humans")
        )
        .select("doc_id")
        .distinct()
        .withColumn("__h", F.lit(True))
    )
    human = doc_flags.join(has_humans, "doc_id", "left").select(
        "doc_id",
        F.lit("Human_study").alias("pred"),
        F.when(F.coalesce("__h", F.lit(False)) & ~F.col("animal"), "yes")
        .otherwise("no")
        .alias("obj"),
    )
    return (
        corrected.filter(F.col("pred") != "Human_study")
        .select("doc_id", "pred", "obj")
        .unionByName(human)
    )
