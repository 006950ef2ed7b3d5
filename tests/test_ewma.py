"""Units for the per-key EWMA anomaly scorer (batch twin + streaming
state carry-over)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from orionld_to_hive_spark.streaming.ewma import (
    EWMA_ALPHA,
    ewma_batch,
    ewma_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("entityid", T.StringType()),
        T.StructField("event_s", T.DoubleType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = 1700000000.0
# steady readings then a spike: the spike must flag, nothing else.
EVENTS = [
    ("A", BASE + 0, 10.0),
    ("A", BASE + 1, 10.2),
    ("A", BASE + 2, 9.9),
    ("A", BASE + 3, 10.1),
    ("A", BASE + 4, 50.0),
    ("A", BASE + 5, 10.0),
    ("B", BASE + 0, 5.0),
    ("B", BASE + 1, 5.0),
]


def _with_ts(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "event_ts", F.timestamp_seconds("event_s")
    )


def _reference_scan(values):
    ewma, ewvar, n = 0.0, 0.0, 0
    out = []
    for x in values:
        if n == 0:
            ewma, ewvar, flag = x, 0.0, False
        else:
            resid = x - ewma
            flag = n >= 3 and abs(resid) > 3.0 * math.sqrt(ewvar)
            ewma = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * ewma
            ewvar = EWMA_ALPHA * resid * resid + (1 - EWMA_ALPHA) * ewvar
        n += 1
        out.append((ewma, flag))
    return out


def test_ewma_batch_matches_sequential_reference(spark):
    df = _with_ts(spark, EVENTS)
    got = {
        (r.entityid, r.event_s): (r.ewma, r.is_anomaly)
        for r in ewma_batch(df, "entityid", "event_ts", "value").collect()
    }
    a_vals = [v for e, _, v in EVENTS if e == "A"]
    for (ts_off, (ewma, flag)) in zip(range(6), _reference_scan(a_vals)):
        ge, gf = got[("A", BASE + ts_off)]
        assert abs(ge - ewma) < 1e-9 and gf == flag
    # the spike at +4 is the ONLY anomaly
    anomalies = [k for k, (_, f) in got.items() if f]
    assert anomalies == [("A", BASE + 4)]


def test_ewma_stream_state_equals_batch_on_concatenation(spark, tmp_path):
    d = tmp_path / "ewma_in"
    d.mkdir()
    batch1 = [e for e in EVENTS if e[1] <= BASE + 2]
    batch2 = [e for e in EVENTS if e[1] > BASE + 2]
    for i, batch in enumerate([batch1, batch2]):
        _with_ts(spark, batch).coalesce(1).write.parquet(str(d / f"b{i}"))

    src = (
        spark.readStream.schema(_with_ts(spark, batch1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    q = (
        ewma_stream(src, "entityid", "event_ts", "value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.entityid, r.event_s): (r.ewma, r.is_anomaly)
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }
    batch = {
        (r.entityid, r.event_s): (r.ewma, r.is_anomaly)
        for r in ewma_batch(
            _with_ts(spark, EVENTS), "entityid", "event_ts", "value"
        ).collect()
    }
    assert streamed == batch  # state carried across micro-batches exactly
