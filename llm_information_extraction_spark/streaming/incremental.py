"""Incremental (streaming) triple extraction.

The reference is strictly batch (SURVEY §2: no streaming semantics), so
this is an *extension*: new document files landing in a directory are
extracted incrementally with Structured Streaming. The transformation
chain is byte-identical to the batch path — the same payload expressions
and the same mapInPandas extractor run inside ``foreachBatch``.

The sink is idempotent under micro-batch REPLAY, which foreachBatch does
not guarantee by itself: each batch overwrites its own
``batch_id=<N>`` partition directory, so a crash after the write but
before the checkpoint commit re-runs the batch into the same directory
instead of appending duplicates (the standard exactly-once foreachBatch
recipe). Readers get ``batch_id`` back as a discovered partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
        )
        # overwrite-per-batch-directory = replay-idempotent commit
        triples.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_unique_documents(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming CROSS-BATCH exact dedup: the stateful operator a 100 TB
    ingest pipeline runs in front of extraction.

    ``dropDuplicates`` on a streaming DataFrame keeps the seen-key set in
    the state store (checkpointed, survives restarts), so a document
    whose content fingerprint arrived in ANY earlier micro-batch is
    suppressed — not just within the batch. State holds only the 32-char
    fingerprint per distinct document, never text. The sink is Spark's
    transactional file sink (_spark_metadata commit log → exactly-once).

    Returns the StreamingQuery; output rows are (doc_id, fp, payload).
    """
    from ..functions.textmetrics import doc_fingerprint
    from ..operators.payload import build_payload

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    with_fp = build_payload(stream).select(
        "doc_id", doc_fingerprint("payload").alias("fp"), "payload"
    )
    unique = with_fp.dropDuplicates(["fp"])
    writer = (
        unique.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
