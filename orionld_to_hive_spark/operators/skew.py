"""Skew-resilient join and aggregation — explicit salting.

No reference analog (the reference's one join is ≤24×24 rows,
`hive.py:84-98`); at 100 TB, key skew is THE join/agg killer: one hot
key pins one reducer while 999 executors idle.

Two mitigations, both exposed here:

  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
     on in session.get_spark) — handles sort-merge-join skew
     automatically by splitting oversized partitions. Zero user code;
     the default answer.
  2. Explicit salting — the portable fallback that also covers
     aggregation skew and engines/paths AQE doesn't reach. Implemented
     here and oracle-checked for EQUIVALENCE with the unsalted plan:

     - salted join: fact side gets a deterministic salt
       `pmod(hash(fact_pk), N)`; the dim side is exploded ×N so every
       (key, salt) bucket can find its dim row; join key becomes
       (key, salt). A hot fact key now spreads across N reducers. Cost:
       dim side replicated N× — use for dim⋈skewed-fact, never
       fact⋈fact.
     - salted aggregation: two-stage groupBy — (key, salt) partial,
       then key combine. The decimal-exact aggregates (functions/
       numeric.py) make the re-association bit-exact, so the oracle is
       the plain single-stage GROUP BY.

Salt fan-out N=8 here; at 1000 executors you'd size N ≈ a few × the
per-key row excess over the p99 partition size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import dsum, sql_dsum
from orionld_to_hive_spark.sources.warehouse import load_table

SALT_N = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: str,
    n: int = SALT_N,
) -> DataFrame:
    """Inner equi-join `fact ⋈ dim ON key`, salted to spread hot keys.

    `salt_on` is a fact column whose hash picks the salt bucket
    (deterministic — keeps the oracle diff exact). Result columns =
    fact's + dim's (minus dim's key), like a plain join.
    """
    salted_fact = fact.withColumn("_salt", F.pmod(F.hash(F.col(salt_on)), F.lit(n)))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], "inner").drop("_salt")
    return out


def skew_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment via a salted orders⋈customer join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, key="o_custkey", salt_on="o_orderkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
    )


SKEW_JOIN_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def salted_agg_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event totals via two-stage salted aggregation.

    Stage 1 groups by (user_id, salt) — a hot user's rows land on up to
    SALT_N reducers; stage 2 combines the ≤SALT_N partials per user.
    Decimal-exact sums make the two-stage result identical to the
    direct GROUP BY (the oracle).
    """
    events = load_table(spark, sf_dir, "events")
    partial = (
        events.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(SALT_N)))
        .groupBy("user_id", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("_sum"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_sum").cast("double").alias("sum_value"),
        )
    )


SALTED_AGG_SQL = f"""
SELECT user_id, COUNT(*) AS n_events, {sql_dsum("value")} AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Skew diagnostics: the report you run BEFORE a big join to decide
# whether it needs salting / AQE skew handling. Per candidate join key:
# distinct-key count, max and mean rows per key, their ratio (the skew
# factor — >10 means the hottest task does 10× the average work), and
# the hottest key itself (ties broken by smallest key). One groupBy
# per key column, then ONE 1-row summary aggregate per key column —
# the hottest key rides along as max(struct(c, -key)), so the per-key
# frame is never pushed through a global window (which would funnel
# billions of per-key rows into a single WindowExec task at 100 TB —
# ironic for the skew-diagnostics op).
def skew_diagnostics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def diag(key: str) -> DataFrame:
        per_key = li.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        mean = (
            F.sum(F.col("c").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        )
        # struct max orders by (c, -key): highest count, then smallest key
        hot = F.max(F.struct(F.col("c").alias("c"), (-F.col(key)).alias("negk")))
        return per_key.agg(
            F.lit(key).alias("join_key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_rows_per_key"),
            F.round(mean, 6).alias("mean_rows_per_key"),
            F.round(F.max("c") / mean, 6).alias("skew_factor"),
            hot.alias("_hot"),
        ).select(
            "join_key",
            "n_keys",
            "max_rows_per_key",
            "mean_rows_per_key",
            "skew_factor",
            (-F.col("_hot.negk")).alias("hottest_key"),
        )

    keys = ("l_orderkey", "l_partkey", "l_suppkey")
    out = diag(keys[0])
    for k in keys[1:]:
        out = out.unionByName(diag(k))
    return out


SKEW_DIAG_SQL = """
WITH diag AS (
  SELECT 'l_orderkey' AS join_key, l_orderkey AS k, COUNT(*) AS c
  FROM lineitem GROUP BY l_orderkey
  UNION ALL
  SELECT 'l_partkey', l_partkey, COUNT(*) FROM lineitem GROUP BY l_partkey
  UNION ALL
  SELECT 'l_suppkey', l_suppkey, COUNT(*) FROM lineitem GROUP BY l_suppkey
),
marked AS (
  SELECT *, MAX(c) OVER (PARTITION BY join_key) AS mx FROM diag
)
SELECT join_key,
       COUNT(*) AS n_keys,
       MAX(c) AS max_rows_per_key,
       round(CAST(SUM(CAST(c AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_rows_per_key,
       round(MAX(c) / (CAST(SUM(CAST(c AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)), 6)
         AS skew_factor,
       MIN(CASE WHEN c = mx THEN k END) AS hottest_key
FROM marked
GROUP BY join_key
ORDER BY join_key
"""


QUERIES = {
    "skew_diagnostics_report": skew_diagnostics_report,
    "skew_join_order_revenue": skew_join_order_revenue,
    "salted_agg_user_totals": salted_agg_user_totals,
}

ORACLES = {
    "skew_diagnostics_report": SKEW_DIAG_SQL,
    "skew_join_order_revenue": SKEW_JOIN_SQL,
    "salted_agg_user_totals": SALTED_AGG_SQL,
}
