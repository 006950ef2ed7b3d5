"""Broader ANSI-SQL surface: multi-DISTINCT aggregation, array flatten
(explode ≡ UNNEST), and the NULL-semantics function family.

Beyond-reference capability (the reference's SQL surface is the four
HiveQL queries, reference `hive.py:49-99`) — these are the remaining
everyday SQL shapes a user switching engines expects to keep working.

Scale notes:
  - Multiple COUNT(DISTINCT …) in one aggregate is planned by Catalyst
    as a single Expand-based pass (one scan, one shuffle of the expanded
    keys) — not N self-joined single-distinct aggregates. At 100 TB the
    expand factor (#distinct columns) multiplies shuffle rows, which is
    still strictly cheaper than N full scans.
  - explode() is generate-per-row, pipelined inside whole-stage codegen
    — no materialized intermediate; the following partial aggregate
    combines map-side, so the shuffle carries (word, count) partials,
    not one row per token occurrence.
  - NULL-semantics functions (NULLIF / COALESCE / null-safe `<=>`) are
    pure row-local expressions — codegen'd, zero shuffle impact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table


# --------------------------------------------------------------------------
# Multiple DISTINCT aggregates in one pass (Catalyst Expand rewrite).
def multi_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.to_date("ts")).alias("n_active_days"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


MULTI_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Flatten: tokenize documents and explode to one row per token (the
# UNNEST/LATERAL VIEW surface), then aggregate term frequencies.
# Deterministic top-100 via (count DESC, word ASC) total order.
def word_freq_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(100)
    )


WORD_FREQ_SQL = """
WITH tokens AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents
)
SELECT word, COUNT(*) AS n
FROM tokens
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT 100
"""


# --------------------------------------------------------------------------
# NULL-semantics suite: NULLIF manufactures NULLs, COUNT(expr) skips
# them, COALESCE restores a default, and null-safe equality (`<=>` ≡
# IS NOT DISTINCT FROM) treats NULL as a comparable value. The
# n_open_nullsafe measure counts rows where NULLIF yielded NULL —
# cross-checking n_total − n_nonopen inside the same query.
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    nonopen = F.expr("nullif(o_orderstatus, 'O')")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(nonopen).alias("n_nonopen"),
            F.count(F.when(F.expr("nullif(o_orderstatus, 'O') <=> NULL"), 1)).alias(
                "n_open_nullsafe"
            ),
            F.min(F.coalesce(nonopen, F.lit("OPEN"))).alias("min_status_label"),
        )
    )


NULL_SEMANTICS_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_total,
       COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonopen,
       COUNT(*) FILTER (WHERE NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL)
         AS n_open_nullsafe,
       MIN(COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')) AS min_status_label
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# CROSS JOIN surface: the (region × nation) grid with a membership
# flag. Cartesian products are legitimate for small-dim scaffolding
# (calendars, bucket grids); both sides here are broadcast-size so the
# product never shuffles. Anything × a fact table would be a bug, not
# a query — hence only dims appear here.
def cross_join_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return (
        region.crossJoin(nation)
        .select(
            "r_name",
            "n_name",
            (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_member"),
        )
    )


CROSS_JOIN_SQL = """
SELECT r_name, n_name, (n_regionkey = r_regionkey) AS is_member
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
"""


# --------------------------------------------------------------------------
# Pagination: ORDER BY + LIMIT/OFFSET over a unique total order.
# Keyset pagination (WHERE key > last_seen) is the scale-correct form —
# OFFSET must still skip the prefix — but the surface has to exist for
# SQL compatibility, and with a deterministic total order it is exact.
def paginate_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .offset(20)
        .limit(10)
    )


PAGINATE_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_custkey
LIMIT 10 OFFSET 20
"""


QUERIES = {
    "multi_distinct_agg": multi_distinct_agg,
    "word_freq_explode": word_freq_explode,
    "null_semantics_suite": null_semantics_suite,
    "cross_join_region_nation": cross_join_region_nation,
    "paginate_customers": paginate_customers,
}

ORACLES = {
    "multi_distinct_agg": MULTI_DISTINCT_SQL,
    "word_freq_explode": WORD_FREQ_SQL,
    "null_semantics_suite": NULL_SEMANTICS_SQL,
    "cross_join_region_nation": CROSS_JOIN_SQL,
    "paginate_customers": PAGINATE_SQL,
}
