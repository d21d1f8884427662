"""Mention-normalization column expressions (pure Catalyst, no Python UDFs).

Re-expresses the reference's scalar string helpers as whole-stage-codegen
friendly column expressions:

- ``normalize_text``  ← evaluation_gpt4_vs_gpt5.py:48-51 (F1 in SURVEY §2.4)
- ``is_empty_token``  ← :54-57 (P8)
- ``clean_split``     ← :59-64 (F2)
- ``canonicalize``    ← :66-70 (F3/F4) — expressed as a broadcast-join or a
  literal map lookup depending on map size
- PMC prefix strip    ← utils/data_preprocessing.py:40 (F6)

All functions take and return ``pyspark.sql.Column`` so they compose inside
``select``/``withColumn`` and stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..vocab import EMPTY_TOKENS


def normalize_text(col: Column | str) -> Column:
    """None→''; lowercase; strip; collapse internal whitespace.

    Parity: ``" ".join(str(x).lower().strip().split())`` with None/NaN → ''.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " "))


def is_empty_token(col: Column | str) -> Column:
    """True iff the normalized value is one of the EMPTY_TOKENS."""
    return normalize_text(col).isin(EMPTY_TOKENS)


def clean_split(col: Column | str) -> Column:
    """normalize → ';'→',' → split(',') → trim parts → drop empty tokens.

    Returns ``array<string>``. Parity with clean_split at
    evaluation_gpt4_vs_gpt5.py:59-64 including the whole-string empty check.
    """
    s = normalize_text(col)
    parts = F.split(F.regexp_replace(s, ";", ","), ",")
    trimmed = F.transform(parts, lambda p: F.trim(p))
    kept = F.filter(
        trimmed,
        lambda p: (p != F.lit("")) & ~p.isin(EMPTY_TOKENS),
    )
    # whole-string empty token ⇒ []
    return F.when(s.isin(EMPTY_TOKENS), F.array().cast("array<string>")).otherwise(kept)


def canonicalize_col(col: Column | str, cmap: dict[str, str]) -> Column:
    """Literal-map canonicalization: alias → canonical, identity if absent.

    For the reference's tiny (≤16 entry) maps a ``create_map`` literal is
    cheaper than a broadcast join — zero shuffle, folded into codegen.
    """
    norm = normalize_text(col)
    if not cmap:
        return norm
    m = F.create_map(*[F.lit(x) for kv in cmap.items() for x in kv])
    return F.coalesce(F.element_at(m, norm), norm)


def canonicalize_array(col: Column | str, cmap: dict[str, str]) -> Column:
    """Map canonicalization over an array column, dropping empty tokens.

    Parity with ``canonicalize_list`` (evaluation_gpt4_vs_gpt5.py:69-70).
    """
    c = F.col(col) if isinstance(col, str) else col
    kept = F.filter(c, lambda v: ~normalize_text(v).isin(EMPTY_TOKENS))
    if not cmap:
        return F.transform(kept, normalize_text)
    m = F.create_map(*[F.lit(x) for kv in cmap.items() for x in kv])
    return F.transform(
        kept, lambda v: F.coalesce(F.element_at(m, normalize_text(v)), normalize_text(v))
    )


def canonicalize_join(
    df: DataFrame,
    value_col: str,
    canon_df: DataFrame,
    out_col: str | None = None,
) -> DataFrame:
    """Broadcast-join canonicalization for large alias maps.

    ``canon_df`` has columns (surface, canonical). Map-side hash join —
    no shuffle of the fact side (J3 at corpus scale).
    """
    out = out_col or value_col
    canon = F.broadcast(
        canon_df.select(
            normalize_text("surface").alias("__surface"),
            normalize_text("canonical").alias("__canonical"),
        ).dropDuplicates(["__surface"])
    )
    joined = df.withColumn("__norm", normalize_text(value_col)).join(
        canon, F.col("__norm") == F.col("__surface"), "left"
    )
    return joined.withColumn(
        out, F.coalesce("__canonical", "__norm")
    ).drop("__surface", "__canonical", "__norm")


def strip_pmc_prefix(col: Column | str) -> Column:
    """'PMC12345' → '12345' (utils/data_preprocessing.py:40)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "^PMC", "")
