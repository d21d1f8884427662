"""Event-time streaming semantics: watermarked windows + custom state.

Timestamps are hand-placed so watermark positions are exact:
- watermark = max(ts seen) − delay, checkpointed across runs;
- append-mode windows emit once the watermark passes their end;
- rows older than the watermark are DROPPED (late-data bound);
- applyInPandasWithState sessions close via event-time timeout.
"""

import datetime as dt

from llm_information_extraction_spark.streaming.stateful import (
    EVENTS_SCHEMA,
    sessionize_users,
    windowed_event_counts,
)


def _ev(eid, hhmm, user, etype, value):
    h, m = divmod(hhmm, 100)
    return (
        eid,
        dt.datetime(2024, 1, 1, h, m),
        user,
        etype,
        float(value),
        "{}",
    )


def _write(spark, rows, path):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_windowed_counts_emit_once_and_drop_too_late_rows(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: three clicks inside [10:00, 10:10) + a 11:00 row that
    # advances the watermark to 10:40 (delay 20 min)
    _write(
        spark,
        [
            _ev(1, 1001, 1, "click", 1.0),
            _ev(2, 1003, 2, "click", 2.0),
            _ev(3, 1005, 3, "click", 3.0),
            _ev(4, 1100, 4, "view", 9.0),
        ],
        in_dir,
    )
    q = windowed_event_counts(spark, in_dir, out, ckpt)
    q.awaitTermination(120)

    # batch 2: a too-late click at 10:02 (watermark already 10:40 →
    # dropped, must NOT bump the closed window) + a fresh 11:30 row
    _write(spark, [_ev(5, 1002, 5, "click", 99.0), _ev(6, 1130, 6, "view", 1.0)], in_dir)
    q2 = windowed_event_counts(spark, in_dir, out, ckpt)
    q2.awaitTermination(120)

    got = {
        (r["window_start"].time().isoformat(), r["event_type"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("10:00:00", "click", 3) in got  # NOT 4 — late row dropped
    assert ("11:00:00", "view", 1) in got  # closed by the 11:30 watermark
    assert not any(n == 4 for _, _, n in got)
    # the 11:30 window is still open (watermark 11:10) → not emitted
    assert not any(s == "11:30:00" for s, _, _ in got)


def test_sessionize_users_event_time_timeout(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # user 7: three events within the 30-min gap; user 8: one event;
    # user 99 at 13:00 pushes the watermark to 12:50 (delay 10 min),
    # far past both users' last_event + gap → their sessions time out
    _write(
        spark,
        [
            _ev(1, 1000, 7, "click", 1.0),
            _ev(2, 1002, 7, "view", 2.0),
            _ev(3, 1005, 7, "click", 3.0),
            _ev(4, 1001, 8, "view", 5.0),
            _ev(5, 1300, 99, "click", 0.0),
        ],
        in_dir,
    )
    q = sessionize_users(spark, in_dir, out, ckpt)
    q.awaitTermination(120)

    # second run: user 99 stays active (13:10 within gap) — only the
    # timed-out sessions of users 7 and 8 may ever be emitted
    _write(spark, [_ev(6, 1310, 99, "click", 0.0)], in_dir)
    q2 = sessionize_users(spark, in_dir, out, ckpt)
    q2.awaitTermination(120)

    rows = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {7, 8}
    s7 = rows[7]
    assert s7["n_events"] == 3 and s7["total_value"] == 6.0
    assert s7["session_start"].time().isoformat() == "10:00:00"
    assert s7["session_end"].time().isoformat() == "10:05:00"
    s8 = rows[8]
    assert s8["n_events"] == 1 and s8["total_value"] == 5.0


def test_sessionize_late_event_pulls_session_start_back(spark, tmp_path):
    """A late-but-within-watermark event that precedes the stored session
    start must LOWER session_start (merge via min), not leave the start
    later than the session's earliest event."""
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: user 7 at 10:10; watermark row 99 at 10:15 → wm 10:05
    _write(
        spark,
        [_ev(1, 1010, 7, "click", 1.0), _ev(2, 1015, 99, "click", 0.0)],
        in_dir,
    )
    q = sessionize_users(spark, in_dir, out, ckpt)
    q.awaitTermination(120)

    # batch 2: LATE event for user 7 at 10:07 (> wm 10:05, accepted);
    # merges into the open session and must pull its start back to 10:07
    _write(spark, [_ev(3, 1007, 7, "view", 2.0)], in_dir)
    q2 = sessionize_users(spark, in_dir, out, ckpt)
    q2.awaitTermination(120)

    # batch 3: 12:00 row pushes the watermark past last+gap → close all
    _write(spark, [_ev(4, 1200, 99, "click", 0.0)], in_dir)
    q3 = sessionize_users(spark, in_dir, out, ckpt)
    q3.awaitTermination(120)

    rows = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    s7 = rows[7]
    assert s7["n_events"] == 2 and s7["total_value"] == 3.0
    assert s7["session_start"].time().isoformat() == "10:07:00"
    assert s7["session_end"].time().isoformat() == "10:10:00"


def test_session_windows_batch_matches_streaming_semantics(spark):
    """The batch sessionizer (backfill path) applies the SAME 30-min-gap
    rule as the streaming stateful operator: on the corpus of
    test_sessionize_users_event_time_timeout it reproduces the closed
    sessions of users 7 and 8 exactly, plus user 99's still-open one
    (batch sees the whole history, so every session is emitted)."""
    from llm_information_extraction_spark.streaming.stateful import (
        session_windows,
    )

    events = spark.createDataFrame(
        [
            _ev(1, 1000, 7, "click", 1.0),
            _ev(2, 1002, 7, "view", 2.0),
            _ev(3, 1005, 7, "click", 3.0),
            _ev(4, 1001, 8, "view", 5.0),
            _ev(5, 1300, 99, "click", 0.0),
            _ev(6, 1310, 99, "click", 0.0),
            # a second user-7 session, two hours later
            _ev(7, 1200, 7, "view", 4.0),
        ],
        EVENTS_SCHEMA,
    )
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in session_windows(events).collect()
    }
    assert set(out) == {(7, 1), (7, 2), (8, 1), (99, 1)}
    s71 = out[(7, 1)]
    assert s71["n_events"] == 3 and s71["total_value"] == 6.0
    assert s71["session_start"].time().isoformat() == "10:00:00"
    assert s71["session_end"].time().isoformat() == "10:05:00"
    assert out[(7, 2)]["n_events"] == 1
    assert out[(8, 1)]["total_value"] == 5.0
    assert out[(99, 1)]["n_events"] == 2

    # the gap rule is strictly-greater over MILLISECOND-truncated
    # times — exactly what the streaming sessionizer compares (ms
    # ints), so backfill and stream agree on membership: an exact
    # 30-min gap merges, +1us still merges (sub-ms truncated away),
    # +1ms splits
    base = dt.datetime(2024, 1, 1, 9, 0)
    tight = spark.createDataFrame(
        [
            (1, base, 1, "a", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=30), 1, "a", 1.0, "{}"),
            (3, base + dt.timedelta(minutes=60, microseconds=1), 1, "a", 1.0, "{}"),
            (4, base + dt.timedelta(minutes=90, milliseconds=1, microseconds=1), 1, "a", 1.0, "{}"),
        ],
        EVENTS_SCHEMA,
    )
    sess = {
        r["session_seq"]: r["n_events"]
        for r in session_windows(tight).collect()
    }
    # only the +1ms gap opens a session: events 1-3 share session 1
    assert sess == {1: 3, 2: 1}

    # ONE exchange total: the session aggregate reuses the window's
    # hash partitioning on user_id (no second shuffle)
    plan = session_windows(events)._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, final
