"""Sketch / approximate / order-statistic aggregates.

Beyond-reference capability (the reference's aggregate surface stops at
AVG/MIN/MAX/COUNT, reference `hive.py:65-68`). A 100 TB training-data
pipeline lives on these: cardinality estimation for dedup planning,
quantiles for length/quality cutoffs, heavy hitters for domain caps.

Scale stance:
  - Exact COUNT(DISTINCT) is planned by Catalyst as Expand + two-phase
    hash aggregate — correct but shuffle-heavy at 100 TB. The HLL-sketch
    variants are the scale path: fixed-size (~KB) mergeable state, so the
    shuffle carries #groups × sketch_size regardless of row count, and
    pre-computed per-partition sketches can be rolled up later without
    touching the raw data (hll_union_agg) — the "sketch once, re-aggregate
    forever" pattern.
  - Top-k by count uses sort+limit, which Spark executes as TakeOrdered
    (per-partition heap + driver merge of k rows) — never a full sort.
  - Exact percentiles require a sort of each group; fine at these group
    cardinalities, while approx_percentile (KLL-style mergeable summary)
    is the 100 TB default. Both are exposed.

Determinism notes: the exact-quantile oracle pair runs on l_quantity,
whose values are small integers and whose interpolation fractions are
exact binary fractions (0.25/0.5/0.75) — both engines' linear
interpolation is then exact IEEE-754 arithmetic, bit-identical. The
approx/sketch variants are engine-specific by nature → registered
rows-only (no oracle), with self-consistency asserted in tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table


# --------------------------------------------------------------------------
# Exact distinct-cardinality per group (oracle-checked).
def ndv_exact_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


NDV_EXACT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Approximate distinct-cardinality (HyperLogLog++; rows-only check —
# estimates are engine-specific). relativeSD 0.01 ⇒ ~1% error, ~24 KB of
# state per group independent of input size.
def ndv_approx_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Mergeable-sketch rollup: build one Apache DataSketches HLL per
# (event_type, day), then union the daily sketches up to event_type and
# estimate. This is the 100 TB rollup pattern — daily sketches are
# computed once at ingest; any coarser grain (weekly, global) is a
# sketch-merge, not a re-scan. Tests assert the merged estimate equals
# the direct per-type estimate (DataSketches is deterministic for a
# given input multiset).
def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_users_merged"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Heavy hitters: top-10 users by event count, deterministic tiebreak.
# sort+limit ⇒ TakeOrdered (per-partition heap, k-row driver merge).
def freq_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(10)
    )


FREQ_TOPK_SQL = """
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Exact quantiles per group (oracle-checked; see determinism note above).
def quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("q50"),
            F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
            F.min("l_quantity").alias("q_min"),
            F.max("l_quantity").alias("q_max"),
        )
        .orderBy("l_returnflag")
    )


QUANTILE_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       MIN(l_quantity) AS q_min,
       MAX(l_quantity) AS q_max
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Approximate quantiles (mergeable summary; rows-only). accuracy 10000 ⇒
# error ≤ 0.01% of rank — the scale default for length/quality cutoffs.
def quantile_approx_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
            ).alias("p50_95_99")
        )
        .orderBy("event_type")
        .select(
            "event_type",
            F.col("p50_95_99").getItem(0).alias("p50"),
            F.col("p50_95_99").getItem(1).alias("p95"),
            F.col("p50_95_99").getItem(2).alias("p99"),
        )
    )


QUERIES = {
    "ndv_exact_users_per_type": ndv_exact_users_per_type,
    "ndv_approx_users_per_type": ndv_approx_users_per_type,
    "hll_mergeable_rollup": hll_mergeable_rollup,
    "freq_topk_users": freq_topk_users,
    "quantile_summary": quantile_summary,
    "quantile_approx_value": quantile_approx_value,
}

ORACLES = {
    "ndv_exact_users_per_type": NDV_EXACT_SQL,
    "freq_topk_users": FREQ_TOPK_SQL,
    "quantile_summary": QUANTILE_SQL,
}
