"""Units for high-watermark incremental ingestion."""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.incremental import (
    incremental_ingest,
    read_watermark,
)


def _events(spark, lo: int, hi: int):
    base = 1700000000
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id")).alias("ts"),
        (F.col("id") * 1.5).alias("value"),
    )


def test_incremental_ingest_appends_only_new_rows(spark, tmp_path):
    target = str(tmp_path / "tgt")
    state = str(tmp_path / "wm.json")

    n1, wm1 = incremental_ingest(spark, _events(spark, 0, 10), "ts", target, state)
    assert n1 == 10 and wm1 is not None
    # re-running on the same source ingests nothing (all ≤ watermark)
    n2, wm2 = incremental_ingest(spark, _events(spark, 0, 10), "ts", target, state)
    assert n2 == 0 and wm2 == wm1
    # newer slice arrives → only it is appended, watermark advances
    n3, wm3 = incremental_ingest(spark, _events(spark, 0, 25), "ts", target, state)
    assert n3 == 15 and wm3 > wm1
    got = spark.read.parquet(target)
    assert got.count() == 25
    assert got.select("event_id").distinct().count() == 25


def test_watermark_survives_process_restart(spark, tmp_path):
    target = str(tmp_path / "tgt")
    state = str(tmp_path / "wm.json")
    incremental_ingest(spark, _events(spark, 0, 5), "ts", target, state)
    # a "new process" reads the same state file
    assert read_watermark(state) is not None
    n, _ = incremental_ingest(spark, _events(spark, 0, 5), "ts", target, state)
    assert n == 0
