"""Subquery surface: scalar-correlated, IN, NOT IN (null-semantics),
and lateral-style per-group top-1 — the SQL shapes Catalyst decorrelates.

The reference's only subqueries are plain uncorrelated derived tables
(reference `hive.py:84-98`); a complete SQL engine must also handle
correlated forms. We express each BOTH ways where idiomatic: the
DataFrame form Catalyst rewrites to a join, and the correlated-SQL
form in the oracle — the differential proves the decorrelation is
semantics-preserving.

Scale stance:
  - A correlated scalar subquery decorrelates to aggregate-then-join:
    one shuffle for the per-key aggregate, then a broadcast or shuffle
    join — never a per-row re-scan (which is what HBase+Hive would do).
  - NOT IN over a nullable column requires null-aware anti join
    semantics (one NULL in the subquery ⇒ empty result). We use the
    SQL surface so Catalyst plans its NullAwareAntiJoin; the oracle
    proves the trap is honored.
  - The per-group top-1 uses max_by (one pass, partial-aggregable) —
    the scalable form of a LATERAL/row_number top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import davg, sql_davg
from orionld_to_hive_spark.sources.warehouse import load_table


# --------------------------------------------------------------------------
# Scalar correlated subquery: orders priced above their customer's
# average order price. DataFrame form: per-customer aggregate + join.
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(davg("o_totalprice", "cust_avg"))
    return (
        orders.join(per_cust, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


ORDERS_ABOVE_AVG_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       (SELECT {sql_davg("o2.o_totalprice")} FROM orders o2
        WHERE o2.o_custkey = o1.o_custkey) AS cust_avg
FROM orders o1
WHERE o_totalprice > (SELECT {sql_davg("o3.o_totalprice")} FROM orders o3
                      WHERE o3.o_custkey = o1.o_custkey)
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# IN subquery through the SQL surface (Catalyst → left-semi join).
def orders_of_building_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderpriority
        FROM orders_sq
        WHERE o_custkey IN (SELECT c_custkey FROM customer_sq
                            WHERE c_mktsegment = 'BUILDING')
        """
    )


IN_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# NOT IN with a non-nullable subquery column (the null-aware anti join
# path; with these keys non-null it returns customers without urgent
# orders — same rows as a plain anti join, planned null-aware).
def customers_not_in_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_sq
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_sq
                                WHERE o_orderpriority = '1-URGENT')
        """
    )


NOT_IN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Per-group top-1 (lateral shape): each customer's single most
# expensive order — max_by keeps it one partial-aggregable pass.
def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max_by(
                F.struct("o_totalprice", "o_orderkey"), F.struct("o_totalprice", "o_orderkey")
            ).alias("top")
        )
        .select(
            "o_custkey",
            F.col("top.o_orderkey").alias("o_orderkey"),
            F.col("top.o_totalprice").alias("o_totalprice"),
        )
    )


TOP_ORDER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
ORDER BY o_custkey
"""


# --------------------------------------------------------------------------
# Scalar subquery in the SELECT list: every customer against the
# global mean balance. DataFrame form: the 1-row aggregate is
# broadcast-cross-joined onto the scan — exactly the plan Catalyst
# builds for the SQL scalar subquery; the fact side never shuffles.
def acctbal_vs_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    global_avg = cust.agg(davg("c_acctbal", "global_avg"))
    return (
        cust.select("c_custkey", "c_acctbal")
        .crossJoin(F.broadcast(global_avg))
        .select(
            "c_custkey",
            "c_acctbal",
            F.round("global_avg", 6).alias("global_avg"),
            F.round(F.col("c_acctbal") - F.col("global_avg"), 6).alias(
                "delta_vs_avg"
            ),
        )
    )


SCALAR_SUBQUERY_SQL = f"""
SELECT c_custkey, c_acctbal,
       round((SELECT {sql_davg("c_acctbal")} FROM customer), 6) AS global_avg,
       round(c_acctbal - (SELECT {sql_davg("c_acctbal")} FROM customer), 6)
         AS delta_vs_avg
FROM customer
ORDER BY c_custkey
"""


QUERIES = {
    "orders_above_customer_avg": orders_above_customer_avg,
    "orders_of_building_segment": orders_of_building_segment,
    "customers_not_in_urgent": customers_not_in_urgent,
    "top_order_per_customer": top_order_per_customer,
    "acctbal_vs_global_avg": acctbal_vs_global_avg,
}

ORACLES = {
    "orders_above_customer_avg": ORDERS_ABOVE_AVG_SQL,
    "orders_of_building_segment": IN_SUBQUERY_SQL,
    "customers_not_in_urgent": NOT_IN_SQL,
    "top_order_per_customer": TOP_ORDER_SQL,
    "acctbal_vs_global_avg": SCALAR_SUBQUERY_SQL,
}
