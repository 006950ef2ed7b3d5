"""Bucketed co-location: the join and the bucket-key aggregation must
plan with ZERO shuffle exchanges, and results must match the plain
(shuffling) equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.plans.explain import count_shuffles, executed_plan
from orionld_to_hive_spark.sources.bucketing import colocated_join, write_bucketed
from orionld_to_hive_spark.sources.warehouse import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", sort_col="o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", sort_col="o_orderkey")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture
def no_broadcast(spark):
    """Disable broadcast so the test-scale tables take the same SMJ path
    a 100 TB fact⋈fact join would (broadcast is the right plan at smoke
    scale but is exactly what bucketing exists to replace beyond it)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, bucketed_tables, no_broadcast):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "o_orderkey")
    assert count_shuffles(joined) == 0, executed_plan(joined)
    assert "SortMergeJoin" in executed_plan(joined)
    # the same join over plain (unbucketed) parquet must shuffle both
    # sides — that pair of exchanges is what bucketing deleted
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    plain = orders.join(li, orders.o_orderkey == li.l_orderkey)
    assert count_shuffles(plain) == 2, executed_plan(plain)


def test_bucketed_join_matches_plain_join(spark, sf_smoke, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed_n = colocated_join(spark, lt, rt, "o_orderkey").count()
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    plain_n = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert bucketed_n == plain_n


def test_bucket_key_aggregation_has_no_shuffle(spark, bucketed_tables):
    _, rt = bucketed_tables
    agg = (
        colocated_join(spark, "b_orders", rt, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert count_shuffles(agg) == 0, executed_plan(agg)
