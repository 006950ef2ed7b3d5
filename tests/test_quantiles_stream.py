"""Streaming exact-quantile store ≡ batch quantile_portable_value.

The histogram is mergeable by addition, so the stream-maintained store
after N micro-batches must yield byte-identical quantiles to the batch
op over the same rows — and a replayed micro-batch must change nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.streaming.quantiles import (
    StreamingQuantileStore,
    partial_histogram,
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("event_type", "value")


def test_stream_store_matches_batch_quantiles(spark, sf_smoke, tmp_path):
    from orionld_to_hive_spark.operators.sketches import (
        quantile_portable_value,
    )

    ev = _events(spark, sf_smoke)
    in_dir = str(tmp_path / "in")
    ev.repartition(3).write.parquet(in_dir)
    store = StreamingQuantileStore(
        str(tmp_path / "store"), "event_type", "value"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    store.start(stream, checkpoint_dir=str(tmp_path / "ckpt")).awaitTermination(
        120
    )
    n_batches = (
        spark.read.parquet(str(tmp_path / "store" / "hist"))
        .select(F.input_file_name().alias("f"))
        .select(F.regexp_extract("f", r"batch_id=(\d+)", 1).alias("b"))
        .distinct()
        .count()
    )
    assert n_batches > 1
    got = {
        r.grp: (r.n_values, r.p50, r.p95, r.p99)
        for r in store.quantiles(spark).collect()
    }
    want = {
        r.event_type: (r.n_values, r.p50, r.p95, r.p99)
        for r in quantile_portable_value(spark, sf_smoke).collect()
    }
    assert got == want


def test_replayed_histogram_batch_is_idempotent(spark, sf_smoke, tmp_path):
    ev = _events(spark, sf_smoke).limit(500)
    store = StreamingQuantileStore(
        str(tmp_path / "store"), "event_type", "value"
    )
    store.write_batch(ev, batch_id=0)
    before = sorted(
        (r.grp, r.value, r.c)
        for r in store.merged_histogram(spark).collect()
    )
    store.write_batch(ev, batch_id=0)  # checkpoint replay
    after = sorted(
        (r.grp, r.value, r.c)
        for r in store.merged_histogram(spark).collect()
    )
    assert before == after


def test_partial_histograms_merge_to_full_histogram(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    a = partial_histogram(ev.filter(F.col("value") < 50), "event_type", "value")
    b = partial_histogram(
        ev.filter(F.col("value") >= 50), "event_type", "value"
    )
    merged = sorted(
        (r.grp, r.value, r.c)
        for r in a.unionByName(b)
        .groupBy("grp", "value")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    full = sorted(
        (r.grp, r.value, r.c)
        for r in partial_histogram(ev, "event_type", "value").collect()
    )
    assert merged == full
