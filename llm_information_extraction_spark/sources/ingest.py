"""Raw-corpus ingest: the reference's preprocessing as declarative scans.

Covers SURVEY §2.1 S1-S3/S7 and §2.5 J1:

- S1/S2: JSON corpus load + numeric-filename ordering
  (``consolidate_json_files``, utils/data_preprocessing.py:106-115) —
  ``spark.read.json`` + ``input_file_name()`` + a parsed sort key;
- S3: per-file normalization (pmcid→PMID rename, PMID fallback from the
  filename — data_preprocessing.py:119-168) — ``coalesce`` +
  ``regexp_extract``; key reordering is cosmetic and dropped;
- J1: validated 1:1 left join (``process_data``,
  data_preprocessing.py:54-59) — join + an explicit duplicate-key guard
  (pandas' ``validate='1:1'``);
- flat-paper projection (``generate_json_file``,
  data_preprocessing.py:76-83): doc_id/title/keywords/abstract/body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import strip_pmc_prefix


def load_json_corpus(
    spark: SparkSession, path: str, multi_line: bool = True
) -> DataFrame:
    """Read a directory of per-paper JSON files, ordered by the numeric
    filename prefix (``01_36931328.json`` → 1), with PMID normalization.

    Column mapping (S3): PMID = metadata.PMID | pmcid | digits from the
    filename, in that priority (data_preprocessing.py:119-145).
    """
    df = spark.read.option("multiLine", multi_line).json(path)
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    file_prefix = F.regexp_extract(fname, r"^(\d+)_", 1)
    file_pmid = F.regexp_extract(fname, r"_(\d+)\.json$", 1)
    cols = set(df.columns)
    meta_pmid = (
        F.col("metadata.PMID")
        if "metadata" in cols and "PMID" in df.schema["metadata"].dataType.names
        else F.lit(None).cast("string")
    )
    pmcid = F.col("pmcid") if "pmcid" in cols else F.lit(None).cast("string")
    out = df.withColumn(
        "PMID",
        F.coalesce(
            meta_pmid.cast("string"),
            strip_pmc_prefix(pmcid.cast("string")),
            F.nullif(file_pmid, F.lit("")),
        ),
    ).withColumn(
        "_order", F.nullif(file_prefix, F.lit("")).cast("long")
    )
    return out.orderBy(F.col("_order").asc_nulls_last()).drop("_order")


def flat_papers(df: DataFrame) -> DataFrame:
    """Flat paper projection with the reference's coalesce fallbacks
    (P1, main.py:57-61): metadata field, else top-level field, else ''."""

    def pick(field: str):
        options = []
        if "metadata" in df.columns:
            meta_names = df.schema["metadata"].dataType.names
            if field in meta_names:
                options.append(F.col(f"metadata.{field}").cast("string"))
        if field in df.columns:
            options.append(F.col(field).cast("string"))
        options.append(F.lit(""))
        return F.coalesce(*options)

    return df.select(
        F.col("PMID").alias("doc_id"),
        pick("title").alias("title"),
        pick("keywords").alias("keywords"),
        pick("abstract").alias("abstract"),
        pick("body").alias("body"),
    )


def validated_one_to_one_join(
    left: DataFrame, right: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Left join with pandas' ``validate='1:1'`` semantics
    (data_preprocessing.py:54-59): raises if either side has duplicate
    keys. The guard is two cheap count-distinct aggregations, then the
    join proper."""
    for side, name in ((left, "left"), (right, "right")):
        dup = (
            side.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(f"{name} side has duplicate keys on {key!r}")
    return left.join(right, key, how)
