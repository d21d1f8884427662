"""Bucketed co-located join: no Exchange on either side."""

import pytest
from pyspark.sql import functions as F

from llm_information_extraction_spark.sources.bucketing import (
    colocated_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_bucketed_a", "k", buckets=8)
    write_bucketed(b, "t_bucketed_b", "k", buckets=8)
    yield "t_bucketed_a", "t_bucketed_b"
    spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket co-location elides shuffles
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_needs_exchange(spark, bucketed_tables):
    """Control: the same join on raw DataFrames shuffles both sides."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10_000).select(F.col("id").alias("k"))
        b = spark.range(0, 5_000).select(F.col("id").alias("k"))
        plan = (
            a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
