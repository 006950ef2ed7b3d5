"""Streaming as-of enrichment ≡ batch asof_join.

Contracts pinned (streaming/asof.py docstring):
  1. Static right state → accumulated stream enrichment is
     row-identical to the batch asof_join over the whole left set, for
     any micro-batch split (left-row locality of as-of).
  2. Replay of a left batch is idempotent.
  3. Late right arrivals do NOT retro-patch already-emitted batches;
     an explicit re-run of the batch converges to the complete answer.
  4. A right (key, ts) redelivered under a later batch_id supersedes
     the old row (latest-batch-wins).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.temporal import asof_join
from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.streaming.asof import StreamingAsofEnricher


@pytest.fixture()
def sides(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts", "value"
    )
    return purchases, clicks


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _batch_answer(purchases, clicks, how="inner"):
    return _rows(
        asof_join(
            purchases, clicks, key="user_id", ts="ts",
            value_cols=("click_value",), how=how,
        )
    )


def test_stream_equals_batch_for_any_left_split(spark, sides, tmp_path):
    purchases, clicks = sides
    enr = StreamingAsofEnricher(
        str(tmp_path / "asof"), key="user_id", ts="ts",
        value_cols=("click_value",),
    )
    enr.write_right_batch(clicks, batch_id=0)

    in_dir = str(tmp_path / "in")
    purchases.repartition(3).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = enr.start_left(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    n_batches = (
        spark.read.parquet(str(tmp_path / "asof" / "enriched"))
        .select("batch_id").distinct().count()
    )
    assert n_batches > 1  # the cross-batch claim needs >1 micro-batch
    assert _rows(enr.enriched(spark)) == _batch_answer(purchases, clicks)


def test_left_batch_replay_is_idempotent(spark, sides, tmp_path):
    purchases, clicks = sides
    enr = StreamingAsofEnricher(
        str(tmp_path / "asof"), key="user_id", ts="ts",
        value_cols=("click_value",),
    )
    enr.write_right_batch(clicks, batch_id=0)
    chunk = purchases.limit(40)
    enr.enrich_batch(chunk, batch_id=0)
    before = _rows(enr.enriched(spark))
    enr.enrich_batch(chunk, batch_id=0)  # checkpoint replay after crash
    assert _rows(enr.enriched(spark)) == before


def test_late_right_arrival_semantics(spark, sides, tmp_path):
    """Batches enrich against right state at processing time; a re-run
    after late right arrivals converges to the complete batch answer."""
    purchases, clicks = sides
    # split the clicks by time: 'early' state present from the start,
    # 'late' state arriving after batch 0 was processed
    cutoff = clicks.agg(
        F.percentile_approx("ts", 0.5).alias("m")
    ).collect()[0].m
    early = clicks.filter(F.col("ts") <= F.lit(cutoff))
    late = clicks.filter(F.col("ts") > F.lit(cutoff))
    assert early.count() > 0 and late.count() > 0

    enr = StreamingAsofEnricher(
        str(tmp_path / "asof"), key="user_id", ts="ts",
        value_cols=("click_value",), how="left",
    )
    enr.write_right_batch(early, batch_id=0)
    enr.enrich_batch(purchases, batch_id=0)
    got_early = _rows(enr.enriched(spark))
    # as-of the early state only — NOT the full answer
    assert got_early == _batch_answer(purchases, early, how="left")
    assert got_early != _batch_answer(purchases, clicks, how="left")

    # late right rows arrive; already-emitted output is NOT retro-patched
    enr.write_right_batch(late, batch_id=1)
    assert _rows(enr.enriched(spark)) == got_early
    # explicit re-run of the batch converges to the complete answer
    enr.enrich_batch(purchases, batch_id=0)
    assert _rows(enr.enriched(spark)) == _batch_answer(
        purchases, clicks, how="left"
    )


def test_right_redelivery_latest_batch_wins(spark, tmp_path):
    enr = StreamingAsofEnricher(
        str(tmp_path / "asof"), key="user_id", ts="ts",
        value_cols=("click_value",),
    )
    from datetime import datetime

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    spark_df = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id LONG, ts TIMESTAMP, click_value DOUBLE"
    )
    enr.write_right_batch(spark_df([(1, t0, 10.0)]), batch_id=0)
    # same (key, ts) redelivered with a corrected value
    enr.write_right_batch(spark_df([(1, t0, 99.0)]), batch_id=1)
    state = enr.right_state(spark).collect()
    assert len(state) == 1 and state[0].click_value == 99.0

    left = spark.createDataFrame(
        [(1, 7, datetime(2024, 1, 1, 1, 0, 0), 1.0)],
        "user_id LONG, purchase_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    enr.enrich_batch(left, batch_id=0)
    out = enr.enriched(spark).collect()
    assert len(out) == 1 and out[0].asof_click_value == 99.0


def test_assert_unique_right_rejects_within_batch_duplicates(
    spark, tmp_path
):
    """r9 (r8 ADVICE): within one batch there is no arrival order, so
    duplicate (key, ts) right rows resolve to max(value_cols) by
    default — feeds where that matters opt into a loud refusal."""
    dup = spark.createDataFrame(
        [("u1", 5, 10.0), ("u1", 5, 3.0), ("u2", 1, 7.0)],
        ["user_id", "ts", "click_value"],
    )
    strict = StreamingAsofEnricher(
        str(tmp_path / "strict"), key="user_id", ts="ts",
        value_cols=("click_value",), assert_unique_right=True,
    )
    with pytest.raises(ValueError, match="duplicate"):
        strict.write_right_batch(dup, batch_id=0)
    # nothing was written — the guard fires before the sink
    import os

    assert not os.path.exists(str(tmp_path / "strict/right"))
    # default (documented) behavior: deterministic max-value winner
    lax = StreamingAsofEnricher(
        str(tmp_path / "lax"), key="user_id", ts="ts",
        value_cols=("click_value",),
    )
    lax.write_right_batch(dup, batch_id=0)
    state = {
        (r.user_id, r.ts): r.click_value
        for r in lax.right_state(spark).collect()
    }
    assert state == {("u1", 5): 10.0, ("u2", 1): 7.0}


def test_enriched_before_any_batch_names_bootstrap_step(spark, tmp_path):
    enr = StreamingAsofEnricher(
        str(tmp_path / "empty"), key="user_id", ts="ts",
        value_cols=("click_value",),
    )
    with pytest.raises(RuntimeError, match="start_left"):
        enr.enriched(spark)
