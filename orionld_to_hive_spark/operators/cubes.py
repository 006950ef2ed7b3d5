"""Multi-dimensional aggregation surface: ROLLUP, GROUPING SETS, PIVOT,
UNPIVOT.

The reference's only grouping-set construct is `GROUP BY CUBE(room,
hour)` (reference `hive.py:82`, covered by parity.q3_union_cube). A
complete engine exposes the whole family; these are the shapes BI tools
and feature-engineering pipelines emit.

Scale stance:
  - ROLLUP/CUBE/GROUPING SETS compile to a single Expand operator (one
    input pass replicated per grouping set) + one hash aggregate — the
    shuffle carries partial aggregates only, so cost is
    #grouping_sets × #groups, independent of fact-table size.
  - PIVOT is given its value list explicitly. Omitting it makes Spark
    run an eager DISTINCT job over the pivot column before planning —
    an extra full scan at 100 TB and a non-deterministic column order.
    With fixed values it's a plain conditional aggregation, fully
    whole-stage-codegen.
  - UNPIVOT (melt) is a zero-shuffle Expand — rows widen to
    (variable, value) pairs map-side; the downstream groupBy is the
    only exchange.

Determinism: grouping_id bit order matches DuckDB's GROUPING(a, b)
(leftmost argument = most significant bit) — asserted by the oracle
diff. Rolled-up dimension NULLs are disambiguated from data NULLs by
carrying the gid column, exactly the SURVEY.md §7 "CUBE NULL ambiguity"
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import dsum, sql_dsum
from orionld_to_hive_spark.sources.warehouse import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --------------------------------------------------------------------------
# ROLLUP over (returnflag, linestatus): per-pair, per-flag subtotal, and
# grand total in one pass.
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Pre-aggregate to base groups before the ROLLUP (re-aggregable
    # measures) — Expand then replicates ≤ |flag×status| partial rows,
    # not the fact table. See cubes.py module docstring scale stance.
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).alias("_s"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("n_items"),
            F.sum("_s").cast("double").alias("sum_price"),
        )
        .select("gid", "l_returnflag", "l_linestatus", "n_items", "sum_price")
    )


ROLLUP_SQL = f"""
SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
       l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {sql_dsum("l_extendedprice")} AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Explicit GROUPING SETS ((type, day), (type), ()) — the general form
# CUBE/ROLLUP desugar to, expressed through the SQL surface.
def grouping_sets_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    # Same pre-aggregate-before-Expand rewrite as rollup_pricing, via
    # the SQL surface: the grouping sets run over per-(type, day)
    # partials, not raw events.
    return spark.sql(
        """
        WITH base AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 COUNT(*) AS _n,
                 SUM(CAST(value AS DECIMAL(27,6))) AS _s
          FROM events_gs
          GROUP BY event_type, date_trunc('day', ts)
        )
        SELECT grouping_id(event_type, day) AS gid,
               event_type,
               day,
               CAST(COALESCE(SUM(_n), 0) AS BIGINT) AS n,
               CAST(SUM(_s) AS DOUBLE) AS sum_value
        FROM base
        GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
        ORDER BY gid, event_type, day
        """
    )


GROUPING_SETS_SQL = f"""
SELECT GROUPING(event_type, date_trunc('day', ts)) AS gid,
       event_type,
       date_trunc('day', ts) AS day,
       COUNT(*) AS n,
       {sql_dsum("value")} AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)),
                        (event_type), ())
ORDER BY gid, event_type, day
"""


# --------------------------------------------------------------------------
# PIVOT: daily event counts, one column per event type (fixed value
# list — see scale stance). Missing combinations are 0, not NULL.
def pivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


PIVOT_SQL = """
SELECT date_trunc('day', ts) AS day,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events
GROUP BY date_trunc('day', ts)
ORDER BY day
"""


# --------------------------------------------------------------------------
# UNPIVOT (melt): lineitem's three price measures to long form, then a
# per-measure exact-decimal sum. The melt itself is a map-side Expand.
def unpivot_measure_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("measure")
        .agg(F.count(F.lit(1)).alias("n"), dsum("val", "total"))
    )


UNPIVOT_SQL = f"""
WITH long AS (
  SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
)
SELECT measure, COUNT(*) AS n, {sql_dsum("val")} AS total
FROM long
GROUP BY measure
ORDER BY measure
"""


QUERIES = {
    "rollup_pricing": rollup_pricing,
    "grouping_sets_daily": grouping_sets_daily,
    "pivot_daily_event_counts": pivot_daily_event_counts,
    "unpivot_measure_totals": unpivot_measure_totals,
}

ORACLES = {
    "rollup_pricing": ROLLUP_SQL,
    "grouping_sets_daily": GROUPING_SETS_SQL,
    "pivot_daily_event_counts": PIVOT_SQL,
    "unpivot_measure_totals": UNPIVOT_SQL,
}
