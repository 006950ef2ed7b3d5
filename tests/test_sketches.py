"""Self-consistency checks for the approximate aggregates — the
engine-specific estimators that can't be oracle-diffed against DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators import sketches
from orionld_to_hive_spark.sources.warehouse import load_table


def test_hll_merge_equals_direct(spark, sf_smoke):
    """Unioning daily HLL sketches must give the same estimate as
    sketching each type directly — mergeability is the whole point."""
    merged = {
        r["event_type"]: r["n_users_merged"]
        for r in sketches.hll_mergeable_rollup(spark, sf_smoke).collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == direct


def test_approx_ndv_within_rsd(spark, sf_smoke):
    exact = {
        r["event_type"]: r["n_users"]
        for r in sketches.ndv_exact_users_per_type(spark, sf_smoke).collect()
    }
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in sketches.ndv_approx_users_per_type(spark, sf_smoke).collect()
    }
    assert set(exact) == set(approx)
    for t, n in exact.items():
        # rsd=0.01 nominal; allow 5% slack on tiny smoke cardinalities
        assert abs(approx[t] - n) <= max(2, 0.05 * n), (t, n, approx[t])


def test_approx_quantiles_bounded_by_min_max(spark, sf_smoke):
    rows = sketches.quantile_approx_value(spark, sf_smoke).collect()
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r["event_type"]]
        assert lo <= r["p50"] <= r["p95"] <= r["p99"] <= hi


def test_countmin_overcounts_within_epsilon(spark, sf_smoke):
    rows = sketches.countmin_freq_estimate(spark, sf_smoke).collect()
    total = load_table(spark, sf_smoke, "events").count()
    # CM guarantee: exact ≤ est, and P[est > exact + e/w·N] ≤ e^-depth.
    eps_bound = (2.718281828 / sketches._CM_W) * total
    for r in rows:
        assert r["cm_est"] >= r["exact_n"], r
        assert r["cm_est"] - r["exact_n"] <= max(2, eps_bound), r


def test_bloom_no_false_negatives_and_sane_fp(spark, sf_smoke):
    row = sketches.bloom_membership_report(spark, sf_smoke).collect()[0]
    # Every member must pass (no false negatives): pass ≥ members.
    assert row["n_pass"] >= row["n_members"]
    assert row["n_pass"] - row["n_members"] == row["n_false_pos"]
    assert 0.0 <= row["fp_rate"] <= 1.0
