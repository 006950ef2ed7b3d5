"""Integration test over the REAL reference corpus (read-only).

The reference's `insert.py:64-97` reads `Measurements/{Room}_{Sensor}.csv`
(18 headerless TSV files, 187,564 rows), drops NA, seeded-samples 50%,
and loads row-at-a-time into HBase. Our S1/S2/P5/P6/P7/F13 pipeline
(`sources/batch_csv.py`) must reproduce those semantics end-to-end on
the same files.
"""

from __future__ import annotations

import glob

import pytest

from orionld_to_hive_spark.sources.batch_csv import (
    ingest_measurements,
    read_raw_measurements,
)

CORPUS = "/root/reference/Measurements/*.csv"
RAW_ROWS = 187_564  # wc -l over the 18 files


@pytest.fixture(scope="module")
def corpus_available():
    if not glob.glob(CORPUS):
        pytest.skip("reference Measurements corpus not present")


def test_raw_scan_rows_and_identity(spark, corpus_available):
    raw = read_raw_measurements(spark, CORPUS)
    assert raw.count() == RAW_ROWS
    idents = {
        (r.room, r.sensor)
        for r in raw.select("room", "sensor").distinct().collect()
    }
    rooms = {"bathroom", "kitchen", "room1", "room2", "room3", "toilet"}
    sensors = {"brightness", "humidity", "temperature"}
    assert idents == {(rm, s) for rm in rooms for s in sensors}


def test_ingest_pipeline_end_to_end(spark, corpus_available, tmp_path):
    out = str(tmp_path / "warehouse")
    ingest_measurements(spark, CORPUS, out, sample_fraction=0.5, seed=42)
    written = spark.read.parquet(out)
    assert set(written.columns) == {
        "room", "entityid", "temperature", "humidity", "brightness", "ts"
    }
    n = written.count()
    # seeded Bernoulli 50% of the post-clean rows (reference insert.py:78)
    assert 0.45 * RAW_ROWS < n < 0.55 * RAW_ROWS
    # seed-determinism: same sample again -> same count
    out2 = str(tmp_path / "warehouse2")
    ingest_measurements(spark, CORPUS, out2, sample_fraction=0.5, seed=42)
    assert spark.read.parquet(out2).count() == n
    # every written row carries a valid room partition and event-time ts
    assert written.filter("room IS NULL OR ts IS NULL").count() == 0


def test_streaming_ingest_end_to_end_at_corpus_scale(
    spark, corpus_available, tmp_path
):
    """Full loop at the reference's own data scale (r3 verdict gap):
    all 187K Measurements rows are re-encoded as NGSI-LD notification
    JSON, replayed through the STREAMING path (readStream → explode →
    normalize → checkpointed foreachBatch append), landed in the
    room-partitioned warehouse, and then QUERIED — per-(room, sensor)
    counts and the hourly-average shape of reference hive.py:49-55 must
    equal the same computations done directly on the raw TSV corpus."""
    from pyspark.sql import functions as F

    from orionld_to_hive_spark.streaming.ingest import start_ingest

    raw = read_raw_measurements(spark, CORPUS).na.drop("any")

    # raw reading -> one-entity notification envelope; to_json drops
    # null fields, so each entity carries exactly its own sensor attr.
    iso = F.date_format(
        F.timestamp_seconds("epoch_s"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
    )
    prop = lambda s: F.when(  # noqa: E731
        F.col("sensor") == s,
        F.struct(
            F.lit("Property").alias("type"),
            F.col("value").alias("value"),
            iso.alias("observedAt"),
        ),
    )
    line = F.to_json(
        F.struct(
            F.lit("urn:ngsi-ld:Notification:replay").alias("id"),
            F.lit("Notification").alias("type"),
            F.lit("urn:ngsi-ld:Subscription:replay").alias("subscriptionId"),
            F.array(
                F.struct(
                    F.concat(F.lit("urn:ngsi-ld:"), "room").alias("id"),
                    F.col("room").alias("type"),
                    prop("temperature").alias("temperature"),
                    prop("humidity").alias("humidity"),
                    prop("brightness").alias("brightness"),
                )
            ).alias("data"),
        )
    )
    in_dir = str(tmp_path / "replay_in")
    raw.select(line.alias("value")).repartition(8).write.text(in_dir)

    wh = str(tmp_path / "replay_wh")
    q = start_ingest(spark, in_dir, wh, str(tmp_path / "replay_ckpt"))
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()

    streamed = spark.read.parquet(wh)
    assert streamed.count() == raw.count()

    # per-(room, sensor) counts survive the round trip exactly
    got = {
        (r.room, s): r.n
        for s in ("temperature", "humidity", "brightness")
        for r in streamed.filter(F.col(s).isNotNull())
        .groupBy("room")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r.room, r.sensor): r.n
        for r in raw.groupBy("room", "sensor")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want

    # the reference's hourly-average query shape over the streamed
    # warehouse (event_ts carries observedAt) ≡ computed from raw
    got_hourly = {
        (r.room, str(r.hour)): round(r.avg_t, 9)
        for r in streamed.filter(F.col("temperature").isNotNull())
        .groupBy("room", F.date_trunc("hour", "event_ts").alias("hour"))
        .agg(F.avg("temperature").alias("avg_t"))
        .collect()
    }
    want_hourly = {
        (r.room, str(r.hour)): round(r.avg_t, 9)
        for r in raw.filter(F.col("sensor") == "temperature")
        .groupBy(
            "room",
            F.date_trunc("hour", F.timestamp_seconds("epoch_s")).alias("hour"),
        )
        .agg(F.avg("value").alias("avg_t"))
        .collect()
    }
    assert got_hourly == want_hourly

    # partition pruning works on the streamed warehouse exactly as on
    # the batch-ingested one
    plan = (
        streamed.filter(F.col("room") == "kitchen")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
