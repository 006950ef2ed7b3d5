"""Unit tests for the event-sequence analytics: transition-matrix
normalization and ordering determinism, and the histogram-based exact
discrete quantile against hand-computed gaps (including duplicated gap
values, which the two-phase form must weight correctly).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.analytics import (
    dwell_time_profile,
    event_transition_matrix,
)


def _with_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ts(s: float):
    return datetime(2024, 1, 1, 0, 0, 0).replace(microsecond=0).fromtimestamp(
        1704067200 + s
    )


def test_transition_rows_normalize_and_count(spark, tmp_path):
    # user 1: a -> b -> a ; user 2: a -> a. Transitions: a->b, b->a, a->a.
    rows = [
        (1, _ts(0), 1, "a", 0.0, "{}"),
        (2, _ts(1), 1, "b", 0.0, "{}"),
        (3, _ts(2), 1, "a", 0.0, "{}"),
        (4, _ts(0), 2, "a", 0.0, "{}"),
        (5, _ts(5), 2, "a", 0.0, "{}"),
    ]
    sf = _with_events(spark, tmp_path, rows)
    got = {
        (r.prev_type, r.next_type): (r.n_trans, r.p)
        for r in event_transition_matrix(spark, sf).collect()
    }
    assert got == {("a", "b"): (1, 0.5), ("a", "a"): (1, 0.5), ("b", "a"): (1, 1.0)}


def test_transition_lag_breaks_timestamp_ties_by_event_id(spark, tmp_path):
    # two events at the SAME timestamp: order must follow event_id.
    rows = [
        (1, _ts(0), 1, "a", 0.0, "{}"),
        (2, _ts(1), 1, "b", 0.0, "{}"),
        (3, _ts(1), 1, "c", 0.0, "{}"),
    ]
    sf = _with_events(spark, tmp_path, rows)
    got = {(r.prev_type, r.next_type) for r in event_transition_matrix(spark, sf).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_dwell_discrete_quantiles_weight_duplicate_gaps(spark, tmp_path):
    # user 1 "x" events with gaps (s): 1, 1, 1, 10 -> n=4,
    # p50: smallest gap with cum >= 2 -> 1s; p90: cum >= 4 -> 10s.
    times = [0, 1, 2, 3, 13]
    rows = [
        (i, _ts(t), 1, "x", 0.0, "{}") for i, t in enumerate(times)
    ]
    sf = _with_events(spark, tmp_path, rows)
    r = dwell_time_profile(spark, sf).collect()[0]
    assert r.prev_type == "x"
    assert r.n_gaps == 4
    assert r.p50_gap_us == 1_000_000
    assert r.p90_gap_us == 10_000_000
    assert r.max_gap_us == 10_000_000
    assert abs(r.mean_gap_s - 13 / 4) < 1e-9
