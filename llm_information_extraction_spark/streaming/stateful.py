"""Event-time streaming operators: watermarked windows + custom state.

Extensions beyond the (batch-only) reference, built on the events table
shape (event_id, ts, user_id, event_type, value, props):

- :func:`windowed_event_counts` — tumbling event-time windows with a
  watermark: late rows within the watermark still land in their window,
  rows older than the watermark are dropped, and a window is emitted
  (append mode) exactly once, when the watermark passes its end. This is
  the standard Structured Streaming recipe — state per open window only,
  so it runs at any scale.
- :func:`sessionize_users` — custom stateful operator via
  ``applyInPandasWithState``: gap-based user sessionization. State per
  user is one 4-tuple; sessions close by EVENT-TIME timeout (watermark
  passing last_event + gap), so idle users don't leak state. The pattern
  generalizes to any per-entity accumulator the built-in aggregates
  can't express.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    available_now: bool = True,
):
    """Tumbling-window counts/averages per event_type with late-data
    tolerance = ``watermark``. Append mode: each window row is final."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user gap sessionizer. Emits one row per CLOSED session."""
    gap_ms = 30 * 60 * 1000  # 30-minute inactivity gap

    def close(start_ms: int, last_ms: int, n: int, tot: float) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "session_start": pd.Timestamp(start_ms, unit="ms"),
                    "session_end": pd.Timestamp(last_ms, unit="ms"),
                    "n_events": n,
                    "total_value": tot,
                }
            ]
        )

    if state.hasTimedOut:
        start_ms, last_ms, n, tot = state.get
        state.remove()
        yield close(start_ms, last_ms, n, tot)
        return

    rows = pd.concat(list(pdfs))
    rows = rows.sort_values("ts")
    ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
    values = rows["value"].fillna(0.0).tolist()

    if state.exists:
        start_ms, last_ms, n, tot = state.get
    else:
        start_ms, last_ms, n, tot = ts_ms[0], ts_ms[0], 0, 0.0

    out: list[pd.DataFrame] = []
    for t, v in zip(ts_ms, values):
        if n > 0 and t - last_ms > gap_ms:
            out.append(close(start_ms, last_ms, n, tot))
            start_ms, n, tot = t, 0, 0.0
        # a late-but-within-watermark event from a later batch can
        # precede the stored session start: merging must pull the start
        # BACK, or session_start ends up later than its earliest event
        start_ms = min(start_ms, t)
        last_ms = max(last_ms, t)
        n += 1
        tot += float(v)

    state.update((start_ms, last_ms, n, tot))
    # close the session when the WATERMARK (event time, not wall clock)
    # passes last event + gap — idle users cost one tuple until then
    state.setTimeoutTimestamp(last_ms + gap_ms)
    yield from out


def sessionize_users(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Custom stateful operator: per-user session rows via
    ``applyInPandasWithState`` with event-time timeouts."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_windows(
    events,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """BATCH gap-based sessionization — the backfill/replay counterpart
    of :func:`sessionize_users` (same 30-minute-gap semantics at the
    default): one row per session with start/end/count/value-total.

    Pure DataFrame shape, ONE shuffle: a per-user window marks rows
    whose gap from the previous event exceeds ``gap_seconds`` —
    strictly-greater over MILLISECOND-truncated timestamps, which is
    exactly the streaming sessionizer's rule (it compares millisecond
    ints), so backfill and stream assign identical session membership;
    no floating-point boundary flips (pure integer interval
    arithmetic). Output start/end keep the events' full microsecond
    precision (the streaming emitter rounds its output to ms — the one
    cosmetic difference). A running sum of the marks numbers the
    sessions, and the session aggregate groups on
    (user, session_seq) — already co-located by the window's hash
    partitioning on user, so Catalyst adds no second exchange. Ordering
    ties on ts break by any residual column order; session membership is
    order-independent for equal timestamps (a zero gap never opens a
    session).

    ``total_value`` sums decimal(18,2)-cast values so the result is
    bit-deterministic under any aggregation order (the contract-oracle
    convention); returned as double.
    """
    from pyspark.sql.window import Window

    src = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    # the open flag must be a materialized column: a lag-window nested
    # inside the running-sum window is invalid. Both window expressions
    # share the (user_id, ts) sort, so Catalyst plans ONE exchange+sort.
    # The running sum's default RANGE frame makes tied timestamps peers
    # — a row tied with its session opener lands in that session
    # regardless of tie order (DuckDB's default frame agrees).
    flagged = src.withColumn(
        "opens",
        F.when(
            prev.isNull()
            # timestamp subtraction yields a day-time interval (exact
            # integer arithmetic, works for TIMESTAMP and TIMESTAMP_NTZ
            # alike — unix_micros rejects NTZ). Timestamps are
            # ms-TRUNCATED first because the streaming sessionizer
            # compares millisecond ints (_session_fn's ns // 1e6):
            # session membership must agree between backfill and stream,
            # so a sub-millisecond excess over the gap does NOT split
            # in either path
            | (
                (
                    F.date_trunc("millisecond", F.col("ts"))
                    - F.date_trunc("millisecond", prev)
                )
                > F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
            ),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn("session_seq", F.sum("opens").over(w))
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6
            ).alias("total_value"),
        )
    )
