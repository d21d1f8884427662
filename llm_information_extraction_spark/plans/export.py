"""Edge exports: the reference's CSV/text output formats.

- :func:`triples_to_prediction_rows` — long-form triples → the wide
  prediction-row shape the reference writes (``_build_csv_row`` +
  ``_write_results_to_csv``, /root/reference/main.py:210-226): one row
  per document, columns ``PMID, title`` + the 15 extraction fields,
  multi-values ';'-joined, fixed column order. Values are sorted within
  a cell (the reference's ``list(set())`` order is nondeterministic —
  documented deviation).
- :func:`write_id_list` — the ``pmcid.txt`` id-list sink
  (utils/data_preprocessing.py:43).

Internally everything stays long-form/parquet; these exist only at the
edge (SURVEY §2.1 S5/S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vocab import EXTRACTION_FIELDS


def triples_to_prediction_rows(
    triples: DataFrame, titles: DataFrame | None = None
) -> DataFrame:
    """(doc_id, pred, obj) → (PMID, title, <15 field columns>).

    ``titles``: optional (doc_id, title) to join; missing titles → ''.
    """
    wide = (
        triples.groupBy("doc_id")
        .pivot("pred", EXTRACTION_FIELDS)
        .agg(F.concat_ws(";", F.array_sort(F.collect_list("obj"))))
        .na.fill("", EXTRACTION_FIELDS)
    )
    if titles is not None:
        wide = wide.join(
            titles.select("doc_id", "title"), "doc_id", "left"
        )
    else:
        wide = wide.withColumn("title", F.lit(""))
    return wide.select(
        F.col("doc_id").alias("PMID"),
        F.coalesce("title", F.lit("")).alias("title"),
        *EXTRACTION_FIELDS,
    )


def write_prediction_csv(rows: DataFrame, path: str) -> None:
    """Single-file CSV with the reference's header order (edge only —
    coalesce(1) is deliberate, this is a human-facing export)."""
    rows.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_id_list(df: DataFrame, id_col: str, path: str) -> None:
    """The pmcid.txt sink: one id per line."""
    df.select(F.col(id_col).cast("string")).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
