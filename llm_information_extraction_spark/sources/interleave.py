"""Adapter: flat document table → interleaved span-sequence table.

The driver's ``/root/testdata/sf*/documents.parquet`` is flat
(``doc_id, text, lang, source, n_chars``); the KG pipeline's input_hint
shape is ``documents(doc_id, spans array<struct<kind,text,media_ref,offset>>)``.
This deterministically re-expresses a flat doc as an interleaved sequence:
sentence-ish chunks become ``section`` spans and every k-th chunk is
followed by a synthetic ``table_ref`` media span derived from the doc id.

Pure column expressions (no Python): split → transform with index →
flatten. Deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleave_flat_documents(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    words_per_section: int = 24,
    media_every: int = 3,
) -> DataFrame:
    """(doc_id, text, ...) → (doc_id, spans) in the input_hint shape."""
    words = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")

    # bind the split ONCE (1-element-array transform scope) — referencing
    # `words` inside the per-section lambda re-splits the full text for
    # every section (no CSE across HOF lambda boundaries)
    def build_sections(ws):
        n_sections = F.greatest(
            F.ceil(F.size(ws) / F.lit(words_per_section)).cast("int"), F.lit(1)
        )
        return F.transform(
            F.sequence(F.lit(0), n_sections - 1),
            lambda i: F.concat_ws(
                " ", F.slice(ws, i * words_per_section + 1, words_per_section)
            ),
        )

    sections = F.transform(F.array(words), build_sections)[0]
    # each section yields [section_span] or [section_span, table_ref_span]
    nested = F.transform(
        sections,
        lambda s, i: F.when(
            (i % media_every) == media_every - 1,
            F.array(
                F.struct(
                    F.lit("section").alias("kind"),
                    s.alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
                F.struct(
                    F.lit("table_ref").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    F.concat(F.lit("tbl_"), (i / media_every).cast("int").cast("string")).alias(
                        "media_ref"
                    ),
                    F.lit(0).alias("offset"),
                ),
            ),
        ).otherwise(
            F.array(
                F.struct(
                    F.lit("section").alias("kind"),
                    s.alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            )
        ),
    )
    title_span = F.array(
        F.struct(
            F.lit("title").alias("kind"),
            F.concat(F.lit("document "), F.col(doc_id_col).cast("string")).alias(
                "text"
            ),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    flat = F.concat(title_span, F.flatten(nested))
    # re-number offsets densely in document order
    spans = F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return df.select(
        F.col(doc_id_col).cast("string").alias("doc_id"), spans.alias("spans")
    )
