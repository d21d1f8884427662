"""Span-sequence → extraction payload (pure column expressions).

Re-expresses the reference's payload builders over the flattened span
model (SURVEY §2.2 P1-P5):

- recursive empty-section pruning (``_clean_content``, main.py:64-80) →
  an array filter on ``spans`` (the flattened model removes the recursion);
- abstract-only projection (``_build_abstract_payload``, main.py:85-94) →
  ``kind IN ('title','abstract')`` filter;
- full-text payload assembly (``_build_fulltext_payload``, main.py:97-118)
  → ``array_sort`` by offset + ``concat_ws`` (the ``authors`` drop at
  main.py:103 is just column pruning here);
- mode dispatch (``ProcessingMode``, main.py:39-41) → a parameter.

The per-row span-sequence invariant (kind, text, media_ref, order) is
checkable via :func:`span_signature`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ABSTRACT_KINDS = ("title", "abstract")


def prune_empty_spans(spans: Column | str) -> Column:
    """Drop text spans whose text is NULL/empty; keep media spans.

    Parity with ``_clean_content`` (main.py:64-80), which removes empty
    sections but never removes table/figure references.
    """
    c = F.col(spans) if isinstance(spans, str) else spans
    return F.filter(
        c,
        lambda s: (s["media_ref"].isNotNull())
        | (s["text"].isNotNull() & (F.trim(s["text"]) != F.lit(""))),
    )


def _ordered(spans: Column) -> Column:
    # document order is the offset; array_sort on a struct-projected key
    return F.array_sort(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )


def build_payload(
    df: DataFrame,
    mode: str = "full_text",
    spans_col: str = "spans",
    out_col: str = "payload",
    as_json: bool = False,
) -> DataFrame:
    """Serialize each document's span sequence to one extraction payload.

    ``mode='abstract'`` keeps only title+abstract spans (main.py:85-94);
    ``mode='full_text'`` uses every pruned text span in document order
    (main.py:97-118). Media spans contribute their reference id as an
    inline marker (the reference serializes extracted table text; here the
    marker keeps the position in the sequence, and the media payload
    itself is handled by the multimodal operators).
    """
    if mode not in ("full_text", "abstract"):
        raise ValueError(f"unknown mode {mode!r}")
    spans = prune_empty_spans(spans_col)
    if mode == "abstract":
        spans = F.filter(spans, lambda s: s["kind"].isin(*ABSTRACT_KINDS))
    ordered = _ordered(spans)
    text_parts = F.transform(
        ordered,
        lambda s: F.when(
            s["text"].isNotNull(), F.concat(s["kind"], F.lit(": "), s["text"])
        ).otherwise(F.concat(F.lit("[media "), s["media_ref"], F.lit("]"))),
    )
    payload = F.concat_ws("\n", text_parts)
    if as_json:
        # the reference serializes the payload as a JSON object with a
        # 'body' field (json.dumps at main.py:94,118; the prompt reads
        # payload['body'], brain_extraction.py:5)
        payload = F.to_json(F.struct(payload.alias("body")))
    return df.withColumn(out_col, payload)


def span_signature(spans: Column | str) -> Column:
    """Canonical string of (kind, text, media_ref) in offset order.

    Two documents have equal span sequences iff their signatures match —
    the per-row invariant required by BASELINE.json input_hint.
    """
    c = F.col(spans) if isinstance(spans, str) else spans
    ordered = _ordered(c)
    return F.sha2(
        F.concat_ws(
            "\x1e",
            F.transform(
                ordered,
                lambda s: F.concat_ws(
                    "\x1f",
                    F.coalesce(s["kind"], F.lit("\x00")),
                    F.coalesce(s["text"], F.lit("\x00")),
                    F.coalesce(s["media_ref"], F.lit("\x00")),
                ),
            ),
        ),
        256,
    )
