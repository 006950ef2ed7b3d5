"""Streaming-lag operator: batch twin ≡ window-lag formulation, and the
stream with state across micro-batches ≡ the batch twin on the
concatenated input (the predecessor of a batch-2 event is remembered
from batch 1).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql import Window

from orionld_to_hive_spark.streaming.transitions import (
    transitions_batch,
    transitions_stream,
)

BASE = datetime(2024, 1, 1)

# (user, ts_offset_s, type) — user u2 goes quiet for batch 2's start
EVENTS = [
    ("u1", 0, "view"),
    ("u1", 1, "click"),
    ("u2", 1, "view"),
    ("u1", 2, "purchase"),
    ("u2", 5, "click"),
    ("u1", 6, "view"),
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, BASE + timedelta(seconds=s), s, t) for u, s, t in rows],
        "user STRING, ts TIMESTAMP, off LONG, etype STRING",
    )


def test_batch_twin_equals_window_lag(spark):
    df = _df(spark, EVENTS)
    got = {
        (r.user, r.off): r.prev_etype
        for r in transitions_batch(df, "user", "ts", "etype").collect()
    }
    w = Window.partitionBy("user").orderBy("ts")
    want = {
        (r.user, r.off): r.prev
        for r in df.withColumn("prev", F.lag("etype").over(w)).collect()
    }
    assert got == want


def test_stream_state_carries_predecessor_across_batches(spark, tmp_path):
    d = tmp_path / "trans_in"
    d.mkdir()
    batch1 = [e for e in EVENTS if e[1] <= 2]
    batch2 = [e for e in EVENTS if e[1] > 2]
    for i, batch in enumerate([batch1, batch2]):
        _df(spark, batch).coalesce(1).write.parquet(str(d / f"b{i}"))

    src = (
        spark.readStream.schema(_df(spark, batch1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    q = (
        transitions_stream(src, "user", "ts", "etype")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_trans"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user, r.off): r.prev_etype
        for r in spark.sql("SELECT * FROM trans_out").collect()
    }
    batch = {
        (r.user, r.off): r.prev_etype
        for r in transitions_batch(_df(spark, EVENTS), "user", "ts", "etype").collect()
    }
    assert streamed == batch
    # u2's batch-2 click must see the batch-1 view as predecessor
    assert streamed[("u2", 5)] == "view"
