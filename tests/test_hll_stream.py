"""Streaming HLL register store ≡ batch hll_portable_rollup.

Registers are max-mergeable, so the stream-maintained store after N
micro-batches must yield byte-identical estimates to the batch rollup
over the same rows; replayed batches and cross-batch duplicate events
change nothing (max is idempotent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.sketches import hll_portable_rollup
from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.streaming.hll import StreamingHllStore


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "user_id"
    )


def test_stream_store_matches_batch_rollup(spark, sf_smoke, tmp_path):
    ev = _events(spark, sf_smoke)
    in_dir = str(tmp_path / "in")
    ev.repartition(3).write.parquet(in_dir)
    store = StreamingHllStore(str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    store.start(stream, checkpoint_dir=str(tmp_path / "ckpt")).awaitTermination(
        120
    )
    n_batches = (
        spark.read.parquet(str(tmp_path / "store" / "reg"))
        .select("batch_id")
        .distinct()
        .count()
    )
    assert n_batches > 1  # the cross-batch merge claim needs >1 batch
    got = sorted(map(tuple, store.ndv_rollup(spark).collect()))
    want = sorted(map(tuple, hll_portable_rollup(spark, sf_smoke).collect()))
    assert got == want


def test_replay_and_duplicates_change_nothing(spark, sf_smoke, tmp_path):
    ev = _events(spark, sf_smoke).limit(800)
    store = StreamingHllStore(str(tmp_path / "store"))
    store.write_batch(ev, batch_id=0)
    before = sorted(map(tuple, store.ndv_rollup(spark).collect()))
    store.write_batch(ev, batch_id=0)  # checkpoint replay: overwrite
    store.write_batch(ev.limit(300), batch_id=1)  # cross-batch dupes
    after = sorted(map(tuple, store.ndv_rollup(spark).collect()))
    assert before == after  # max-merge is idempotent under duplicates
