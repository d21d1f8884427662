"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the triples table is joined repeatedly on ``doc_id`` (gold
joins, per-doc rollups) and entities on ``entity_id``. Writing both
sides bucketed by the join key lets Spark's planner drop the Exchange on
both sides — the join runs bucket-by-bucket with zero network movement.
Works with the built-in (non-Hive) catalog via ``saveAsTable``.

The plan test (tests/test_bucketing.py) pins the property that matters:
joining two tables bucketed on the same key produces a SortMergeJoin
with NO Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        buckets, keys[0], *keys[1:]
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — planner elides both Exchanges.

    Disable broadcast for the join so the bucket-join path is actually
    exercised (otherwise a small side gets broadcast and the test proves
    nothing); callers at scale leave broadcast enabled and the planner
    picks whichever is cheaper.
    """
    return spark.table(left_table).join(
        spark.table(right_table),
        [key] if isinstance(key, str) else list(key),
        how,
    )
