"""Graph analytics over the materialized KG (SURVEY §2.7 extension).

Once extraction has produced the long-form ``(doc_id, pred, obj)``
triples table, the knowledge-graph EDGES between entity mentions are
plain relational algebra — co-occurrence within a document is a
doc-keyed self-join plus a count, which Spark executes as one shuffle
with map-side partial aggregation. No graph library needed; at 100 TB
the doc-keyed join partitions evenly because documents are the natural
sharding unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_mention_edges(
    mentions: DataFrame, pred_a: str, pred_b: str
) -> DataFrame:
    """Edges between objects of two predicates co-occurring in a doc.

    Returns (obj_a, obj_b, n_docs) — e.g. disease ↔ tract co-mention
    counts, the adjacency the reference's downstream analyses plot.
    Self-pairs are excluded when pred_a == pred_b; each doc contributes
    at most once per (obj_a, obj_b) pair.
    """
    a = (
        mentions.filter(F.col("pred") == pred_a)
        .select("doc_id", F.col("obj").alias("obj_a"))
        .distinct()
    )
    b = (
        mentions.filter(F.col("pred") == pred_b)
        .select("doc_id", F.col("obj").alias("obj_b"))
        .distinct()
    )
    pairs = a.join(b, "doc_id")
    if pred_a == pred_b:
        pairs = pairs.filter(F.col("obj_a") < F.col("obj_b"))
    return pairs.groupBy("obj_a", "obj_b").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def predicate_object_degrees(mentions: DataFrame) -> DataFrame:
    """Node degrees of the KG: per (pred, obj), in how many documents it
    appears — the fan-out statistic that decides broadcast vs shuffle
    strategies (and salting) for downstream joins against the graph."""
    return (
        mentions.select("pred", "obj", "doc_id")
        .distinct()
        .groupBy("pred", "obj")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
