"""Physical-plan quality gates: pushdown, pruning, broadcast — the
properties that decide whether a plan survives 100× scale."""

from __future__ import annotations

from orionld_to_hive_spark.operators import parity, tpch
from orionld_to_hive_spark.plans.explain import (
    count_shuffles,
    has_broadcast_join,
    has_pushed_filter,
    read_schema_columns,
)


def test_q1_filter_is_pushed_to_scan(spark, sf_smoke):
    df = parity.q1_time_filter(spark, sf_smoke)
    # the range predicate must appear in PushedFilters as a raw long
    # comparison (the reference's own Q1 full-scanned; ours must not)
    assert has_pushed_filter(df, "GreaterThanOrEqual(ts"), (
        [l for l in __import__("orionld_to_hive_spark.plans.explain",
         fromlist=["formatted"]).formatted(df).splitlines()
         if "Pushed" in l]
    )


def test_q1_reads_only_projected_columns(spark, sf_smoke):
    df = parity.q1_time_filter(spark, sf_smoke)
    cols = read_schema_columns(df)
    assert set(cols) == {"event_id", "value", "ts"}, cols


def test_q4_join_broadcasts(spark, sf_smoke):
    df = parity.q4_join_hourly(spark, sf_smoke)
    df.collect()  # AQE decides at runtime; materialize first
    assert has_broadcast_join(df)


def test_tpch_q3_broadcasts_dimension(spark, sf_smoke):
    df = tpch.tpch_q3_shipping(spark, sf_smoke)
    assert has_broadcast_join(df)


def test_tpch_q1_single_shuffle(spark, sf_smoke):
    # one groupBy = exactly one hash exchange (partial agg before it)
    df = tpch.tpch_q1_pricing(spark, sf_smoke)
    assert count_shuffles(df) <= 2  # agg + final orderBy range exchange


def test_tpch_q1_prunes_columns(spark, sf_smoke):
    df = tpch.tpch_q1_pricing(spark, sf_smoke)
    cols = set(read_schema_columns(df))
    # must NOT read the 4 unused lineitem columns
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_tax"} <= cols
