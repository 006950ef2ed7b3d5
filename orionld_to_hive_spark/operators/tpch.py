"""Scale-proving analytical queries over the TPC-H-ish star schema.

The reference's four queries top out at a two-subquery join on ~190K rows
(reference `hive.py:84-98`, PDF §5: joins were its costliest op "due to
the lack of native join optimization and indexing"). These operators
prove the same relational capabilities — multi-agg scan, dimensional
join, multi-way join — at the shapes that matter for a 100 TB fact
table:

  - fact-side aggregation happens BEFORE joins where semantics allow
    (partial/map-side combine shrinks the shuffle);
  - genuinely bounded frames (region/nation, 1-row scalar aggregates)
    carry explicit `F.broadcast` hints; sf-proportional tables
    (orders/customer/supplier/part — billions of rows at the 100 TB
    design point) carry NO hint, leaving the strategy to AQE, which
    still broadcasts them at small scale factors but falls back to
    shuffle-hash when the runtime size exceeds the threshold;
  - no collect()s, no Python in the hot path — everything whole-stage
    codegen.

Oracle twins use the exact-decimal aggregate convention
(functions/numeric.py) so value-hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from orionld_to_hive_spark.sources.warehouse import load_spread, load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# TPC-H Q1 shape: pricing summary. One pass over the fact table, 8
# aggregates, 6-ish groups. The canonical "does map-side combine work"
# benchmark: at 100 TB the shuffle carries only #tasks × #groups rows.
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # layout-adaptive core-spread (r13): the 8-aggregate partial agg
    # is the scan stage's narrow work -- single-core on the local
    # one-row-group file without it (guide §2.5); measured
    # 1.16 -> 0.67 s at sf0.1
    li = load_spread(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TPCH_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity")} AS sum_qty,
       {sql_dsum("l_extendedprice")} AS sum_base_price,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {sql_davg("l_quantity")} AS avg_qty,
       {sql_davg("l_extendedprice")} AS avg_price,
       {sql_davg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority. customer(filtered) ⋈ orders ⋈
# lineitem, then group + top-k. No broadcast hints: customer and
# orders are sf-proportional (r4 removed the forced broadcast). Left
# alone, the static planner builds a BROADCAST hash table from the
# filtered-lineitem scan (its column-pruned estimate is smallest, and
# AQE never flips the build side of an already-broadcast join) — a
# 582k-row broadcast at sf0.1, measured 0.95 s. The r5 fix is a
# SHUFFLE_HASH strategy hint on the orders⋈cust side: both sides
# shuffle on the join key and the hash builds per-partition from the
# small filtered side — 0.67 s interleaved-measured (±0.04), identical
# rows. Unlike a broadcast hint this is scale-safe: the build side is
# keyed by the unique o_orderkey (no skew), per-partition build memory
# shrinks with shuffle parallelism, and nothing is ever collected to
# one node. (An aggregate-first rewrite was tried and is WORSE here:
# Q3's revenue aggregate keys on ~|orders| groups but the segment
# filter only keeps ~20% of them, so pre-aggregating before the join
# does 5× the aggregation work — unlike Q10, whose fact side is
# pre-filtered to a 3-month returned-items slice.)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                cust.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
            )
            .select("o_orderkey", "o_orderdate", "o_orderpriority")
            .hint("shuffle_hash"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


TPCH_Q3_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# TPC-H Q5 shape: revenue by nation through a 6-table join. Bounded
# dims (region→nation) are hint-broadcast; customer/supplier/orders are
# sf-proportional, so their join strategy is AQE's call. The
# c_nationkey = s_nationkey predicate is the classic "join graph, not
# a chain" case Catalyst reorders.
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")

    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")

    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


REGIONAL_REVENUE_SQL = f"""
SELECT n_name,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND c_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --------------------------------------------------------------------------
# Semi/anti-join surface (reference has none; required for a complete
# engine). Customers WITH at least one urgent order (semi) and order
# count of customers WITHOUT any lineitem shipped after a date (anti).
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# Outer join surface: per-customer order stats keeping orderless
# customers (NULL-extended), plus grouped counts over the result.
def outer_join_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_spend"),
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
        )
    )


OUTER_JOIN_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         {sql_dsum("o_totalprice")} AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_mktsegment,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(total_spend, 0.0) AS total_spend
FROM customer LEFT OUTER JOIN per_cust ON c_custkey = o_custkey
"""


# --------------------------------------------------------------------------
# TPC-H Q18 shape: GROUP BY … HAVING, then join the survivors back to
# the dimension side. Scale stance: the HAVING predicate runs on the
# aggregated (already map-side-combined) per-order totals — the filter
# that survives is a tiny fraction of orders, and AQE broadcasts it at
# runtime when it is actually small (no explicit hint: "tiny fraction
# of orders" is still sf-proportional, so a forced broadcast would OOM
# at the 100 TB design point where orders is billions of rows).
# The HAVING comparison happens on the EXACT decimal sum
# (before the double cast) so boundary orders can't flip between
# engines.
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("qdec"))
        .filter(F.col("qdec") > 200)
        .select("l_orderkey", F.col("qdec").cast("double").alias("total_qty"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(
            cust.select("c_custkey", "c_name"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


HAVING_LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(l_quantity AS DECIMAL(27,6))) AS qdec
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 200
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(qdec AS DOUBLE) AS total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


# --------------------------------------------------------------------------
# TPC-H Q6 shape: forecasting-revenue-change. A pure scan-filter-agg with
# THREE selective predicates — the canonical predicate-pushdown probe.
# Every filter (timestamp range, discount band, quantity cap) reaches the
# parquet scan as a PushedFilter, so row groups whose min/max miss the
# band are never decoded; the aggregate itself reduces to one decimal
# per task. At 100 TB this query is IO-bound on exactly the row groups
# that can match — nothing else.
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


TPCH_Q6_SQL = f"""
SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promotion-effect ratio. lineitem ⋈ part with the fact
# side pre-filtered to one month; part is sf-proportional (~2B rows at
# the 100 TB point), so no broadcast hint — AQE broadcasts it at small
# sf. Both the conditional numerator and the denominator
# come out of ONE aggregate pass — no second scan for the ratio.
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price)
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * dsum(F.coalesce(promo, F.lit(0.0)))
            / dsum(disc_price),
            6,
        ).alias("promo_revenue_pct"),
        dsum(disc_price, "total_revenue"),
    )


TPCH_Q14_SQL = f"""
SELECT round(100.0 * {sql_dsum(
        "CASE WHEN p_type LIKE 'PROMO%' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {sql_dsum("l_extendedprice * (1 - l_discount)")}, 6)
         AS promo_revenue_pct,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


# --------------------------------------------------------------------------
# TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate.
# The planner must (a) join part without a forced broadcast (AQE picks
# the strategy by runtime size), (b) extract the common
# conjuncts (quantity cap, size floor) OUT of the disjunction so they
# still reach the lineitem scan as PushedFilters, and (c) keep the
# disjunction itself as a post-join filter. At 100 TB the difference
# between "pushdown survived the OR" and "full fact scan" is the whole
# query cost — this is the regression probe for it.
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(branch).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


TPCH_Q19_SQL = f"""
SELECT {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity >= 1 AND l_quantity <= 30
  AND (
        (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20 AND 30)
  )
"""


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top-revenue supplier(s). The naive "view +
# MAX-of-view" plan scans the fact table TWICE (Spark plans the view's
# two uses independently; exchange reuse is not guaranteed), and the
# window-max alternative funnels ALL |suppliers| aggregate rows through
# one partition (1B rows at SF100k — a real straggler). Single-scan AND
# no single-partition step: aggregate once, CACHE the skinny
# (suppkey, revenue) frame — MBs even at 100 TB fact scale — then take
# the global MAX as a map-side-combined aggregate (one row per
# partition reaches the final reduce) and broadcast the 1-row result
# back. Ties survive (= on the exact-decimal sum is deterministic,
# unlike a double sum). The supplier join carries no hint (supplier is
# sf-proportional); AQE broadcasts the 1-row-ish filtered revenue side.
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    ).cache()
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


TPCH_Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


QUERIES = {
    "tpch_q1_pricing": tpch_q1_pricing,
    "tpch_q6_forecast": tpch_q6_forecast,
    "tpch_q14_promo": tpch_q14_promo,
    "tpch_q19_disjunctive": tpch_q19_disjunctive,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q3_shipping": tpch_q3_shipping,
    "regional_revenue": regional_revenue,
    "semi_join_urgent_customers": semi_join_urgent_customers,
    "anti_join_quiet_customers": anti_join_quiet_customers,
    "outer_join_order_stats": outer_join_order_stats,
    "having_large_orders": having_large_orders,
}

ORACLES = {
    "having_large_orders": HAVING_LARGE_ORDERS_SQL,
    "tpch_q1_pricing": TPCH_Q1_SQL,
    "tpch_q6_forecast": TPCH_Q6_SQL,
    "tpch_q14_promo": TPCH_Q14_SQL,
    "tpch_q19_disjunctive": TPCH_Q19_SQL,
    "tpch_q15_top_supplier": TPCH_Q15_SQL,
    "tpch_q3_shipping": TPCH_Q3_SQL,
    "regional_revenue": REGIONAL_REVENUE_SQL,
    "semi_join_urgent_customers": SEMI_JOIN_SQL,
    "anti_join_quiet_customers": ANTI_JOIN_SQL,
    "outer_join_order_stats": OUTER_JOIN_SQL,
}
