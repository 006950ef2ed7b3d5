"""Set operations: INTERSECT [ALL], EXCEPT [ALL], UNION DISTINCT.

The reference's only set op is a 6-way UNION ALL (reference
`hive.py:69-81`, covered by parity.u1_union_all); the rest of the ANSI
set-operator family is required for a complete SQL surface.

Scale stance: Spark plans INTERSECT/EXCEPT as left-semi/left-anti
hash joins over pre-aggregated (distinct) inputs, and the ALL variants
as count-matched joins — all shuffle on the full row as key. That is
the right plan when the operands are projections of comparable size;
when one side is small it broadcasts (AQE decides from runtime stats).
UNION DISTINCT = Union + one hash aggregate — the distinct is the only
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table


def _users_of(events: DataFrame, etype: str) -> DataFrame:
    return events.filter(F.col("event_type") == etype).select("user_id")


# Users who both purchased and clicked (distinct semantics).
def intersect_buyers_clickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        _users_of(events, "purchase")
        .intersect(_users_of(events, "click"))
    )


INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
ORDER BY user_id
"""


# Users who clicked but never purchased (distinct semantics).
def except_clickers_not_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        _users_of(events, "click")
        .subtract(_users_of(events, "purchase"))
    )


EXCEPT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
"""


# Multiplicity-preserving variants, aggregated to keep results compact:
# per-user surplus of views over errors (EXCEPT ALL), and the bag
# intersection size of view/click days (INTERSECT ALL).
def except_all_view_surplus(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        _users_of(events, "view")
        .exceptAll(_users_of(events, "error"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("surplus"))
    )


EXCEPT_ALL_SQL = """
WITH diff AS (
  SELECT user_id FROM events WHERE event_type = 'view'
  EXCEPT ALL
  SELECT user_id FROM events WHERE event_type = 'error'
)
SELECT user_id, COUNT(*) AS surplus FROM diff GROUP BY user_id ORDER BY user_id
"""


def intersect_all_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    view_days = events.filter(F.col("event_type") == "view").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    click_days = events.filter(F.col("event_type") == "click").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    return (
        view_days.intersectAll(click_days)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


INTERSECT_ALL_SQL = """
WITH v AS (SELECT user_id, date_trunc('day', ts) AS day
           FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id, date_trunc('day', ts) AS day
           FROM events WHERE event_type = 'click'),
     shared AS (SELECT * FROM v INTERSECT ALL SELECT * FROM c)
SELECT user_id, COUNT(*) AS n_common FROM shared GROUP BY user_id ORDER BY user_id
"""


# UNION DISTINCT of two projections (the reference only had UNION ALL).
def union_distinct_engaged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        _users_of(events, "purchase")
        .union(_users_of(events, "signup"))
        .distinct()
    )


UNION_DISTINCT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
ORDER BY user_id
"""


QUERIES = {
    "intersect_buyers_clickers": intersect_buyers_clickers,
    "except_clickers_not_buyers": except_clickers_not_buyers,
    "except_all_view_surplus": except_all_view_surplus,
    "intersect_all_active_days": intersect_all_active_days,
    "union_distinct_engaged_users": union_distinct_engaged_users,
}

ORACLES = {
    "intersect_buyers_clickers": INTERSECT_SQL,
    "except_clickers_not_buyers": EXCEPT_SQL,
    "except_all_view_surplus": EXCEPT_ALL_SQL,
    "intersect_all_active_days": INTERSECT_ALL_SQL,
    "union_distinct_engaged_users": UNION_DISTINCT_SQL,
}
