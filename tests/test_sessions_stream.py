"""Custom streaming sessionizer: batch twin ≡ native session_window,
and the stream (state + event-time timeout across micro-batches) ≡ the
batch twin — a session spanning two micro-batches must come out merged,
and quiet keys must be reaped by the watermark timeout, not retained.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from orionld_to_hive_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

BASE = datetime(2024, 1, 1)

# (user, ts_offset_s, value); gap = 30 s.
# u1: two sessions (0-10, 100-105); the first session SPANS the batch
# split at t=5. u2: one session, then goes quiet — only the flush
# event's watermark advance closes it.
EVENTS = [
    ("u1", 0, 1.0),
    ("u1", 5, 2.0),
    ("u2", 3, 5.0),
    # ---- batch split ----
    ("u1", 10, 3.0),
    ("u1", 100, 4.0),
    ("u1", 105, 5.0),
    ("u2", 8, 7.0),
]
# watermark-advancing sentinel, far past every session's gap
FLUSH = [("zz_flush", 10_000, 0.0)]


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, BASE + timedelta(seconds=s), v) for u, s, v in rows],
        "user STRING, ts TIMESTAMP, value DOUBLE",
    )


def test_batch_twin_matches_native_session_window(spark):
    df = _df(spark, EVENTS)
    got = {
        (r.user, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in sessionize_batch(df, "user", "ts", "value").collect()
    }
    native = (
        df.groupBy("user", F.session_window("ts", "30 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert len(got) == len(native) == 3
    for r in native:
        key = (r.user, r.w.start)
        assert key in got
        # native session_window end = last_ts + gap; ours = last event ts
        assert got[key][0] + timedelta(seconds=30) == r.w.end
        assert got[key][1] == r.n
        assert abs(got[key][2] - r.s) < 1e-9


def test_stream_merges_cross_batch_sessions_and_reaps_quiet_keys(
    spark, tmp_path
):
    d = tmp_path / "sess_in"
    d.mkdir()
    batch1 = EVENTS[:3]
    batch2 = EVENTS[3:]
    for i, batch in enumerate([batch1, batch2, FLUSH]):
        _df(spark, batch).coalesce(1).write.parquet(str(d / f"b{i}"))

    src = (
        spark.readStream.schema(_df(spark, batch1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    q = (
        sessionize_stream(src, "user", "ts", "value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.user, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in spark.sql(
            "SELECT * FROM sess_out WHERE user <> 'zz_flush'"
        ).collect()
    }
    batch = {
        (r.user, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in sessionize_batch(
            _df(spark, EVENTS), "user", "ts", "value"
        ).collect()
    }
    assert streamed == batch
    # the cross-batch u1 session came out merged: 3 events, values 1+2+3
    u1_first = streamed[("u1", BASE)]
    assert u1_first[1] == 3 and abs(u1_first[2] - 6.0) < 1e-9
    # u2 (quiet after batch 2) was closed by the timeout, not dropped
    assert ("u2", BASE + timedelta(seconds=3)) in streamed


def test_stream_survives_events_older_than_watermark_minus_gap(
    spark, tmp_path
):
    # ADVICE r3: applyInPandasWithState does not pre-filter late rows,
    # so an event whose last_ts + gap is at or below the current
    # watermark used to call setTimeoutTimestamp with a past timestamp
    # — an IllegalArgumentException that kills the query. The clamp to
    # watermark + 1 must keep the query alive and still close the
    # session on the next watermark advance.
    d = tmp_path / "late_in"
    d.mkdir()
    batches = [
        [("wm", 10_000, 0.0)],           # watermark jumps to ~9999 s
        [("u9", 5, 1.0), ("u9", 8, 2.0)],  # 30 s gap ended ~9966 s ago
        [("wm", 20_000, 0.0)],           # advance again: reap u9
    ]
    for i, batch in enumerate(batches):
        _df(spark, batch).coalesce(1).write.parquet(str(d / f"b{i}"))

    src = (
        spark.readStream.schema(_df(spark, batches[0]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    q = (
        sessionize_stream(src, "user", "ts", "value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_late")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None, q.exception()
    rows = spark.sql(
        "SELECT * FROM sess_late WHERE user = 'u9'"
    ).collect()
    # the late session still comes out, closed by the clamped timeout
    assert len(rows) == 1
    assert rows[0].n_events == 2 and abs(rows[0].sum_value - 3.0) < 1e-9
