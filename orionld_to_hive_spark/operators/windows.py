"""Window-function operators.

The reference has zero window functions (SURVEY.md §2.5) — but its
streaming upsert semantics (T5: latest entity state wins) and any
time-series engine's API need them. These are the canonical shapes:
latest-per-key (the latest-wins dedup view that replaces MERGE,
SURVEY.md §7 hard-part #6), a bounded moving aggregate, and
sessionization (gap > threshold → new session), all expressed with
`Window.partitionBy(...)` so the single shuffle is on the entity key —
the partitioning a 100 TB deployment would already have on disk.

Determinism: window ORDER BY is always (ts, event_id) — a unique total
order per partition — so ranks match any engine; frame sums go through
the exact-decimal convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import DECIMAL_T
from orionld_to_hive_spark.sources.warehouse import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# Latest event per user — the "current entity state" view that stands in
# for the reference's HBase upsert (T5). row_number over a desc sort,
# keep rank 1. One shuffle on user_id; no global sort.
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
    )


LATEST_SQL = """
SELECT user_id, event_id, event_type, value, ts
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Bounded moving average per user: 4-row trailing window ordered by time.
def moving_avg_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    dec = F.col("value").cast(DECIMAL_T)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (F.sum(dec).over(w).cast("double") / F.count(dec).over(w)).alias(
            "moving_avg"
        ),
    )


MOVING_AVG_SQL = """
SELECT user_id, event_id, ts, value,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
         / COUNT(value) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Sessionization: a new session starts when the gap to the previous event
# of the same user exceeds 30 minutes. lag → flag → running sum, then a
# per-session rollup. All three windows share one (user_id) shuffle;
# Catalyst plans a single exchange.
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    with_flag = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    with_session = with_flag.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessioned
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Time-RANGE frame: per user, how much activity landed in the trailing
# hour of *event time* (not a row count — a value-range frame). The
# ORDER BY key is exact epoch-microseconds on BOTH engines, so frame
# boundaries and peer groups are bit-identical; rows sharing a
# microsecond are peers and RANGE includes all peers by definition,
# making the result deterministic without a unique total order.
# Same single (user_id) shuffle as every other window here.
def trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)  # 1 hour in microseconds
    )
    dec = F.col("value").cast(DECIMAL_T)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(dec).over(w).cast("double").alias("sum_last_hour"),
    )


TRAILING_HOUR_SQL = """
SELECT user_id, event_id, ts,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
         AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Rank-within-group: top-3 spenders per market segment — the top-k-per-
# group idiom (window + filter beats global sort at any scale).
def top_spenders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "c_custkey", "c_name", "c_acctbal")
    )


TOP_SPENDERS_SQL = """
SELECT c_mktsegment, CAST(rank AS INTEGER) AS rank, c_custkey, c_name, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer
) WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# Full ranking/analytic-function suite over per-user event counts:
# rank, dense_rank, percent_rank, cume_dist, ntile, lag, lead in one
# window pass. Determinism: the ORDER BY is (n_events DESC, user_id) —
# a total order — so every function's output is unique. percent_rank
# and cume_dist are exact rational arithmetic on small ints ⇒ the one
# IEEE division is identical cross-engine. One shuffle (the window
# partition), count-only measures (no float aggregation drift).
def ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    per_user = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return per_user.select(
        "event_type",
        "user_id",
        "n_events",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("n_events", 1).over(w).alias("prev_n"),
        F.lead("n_events", 1).over(w).alias("next_n"),
    )


RANKING_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, COUNT(*) AS n_events
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, n_events,
       CAST(rank()       OVER w AS INTEGER) AS rnk,
       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist()    OVER w AS cdist,
       CAST(ntile(4)     OVER w AS INTEGER) AS quartile,
       lag(n_events, 1)  OVER w AS prev_n,
       lead(n_events, 1) OVER w AS next_n
FROM per_user
WINDOW w AS (PARTITION BY event_type ORDER BY n_events DESC, user_id ASC)
ORDER BY event_type, rnk, user_id
"""


QUERIES = {
    "ranking_suite": ranking_suite,
    "latest_event_per_user": latest_event_per_user,
    "moving_avg_per_user": moving_avg_per_user,
    "sessionize_events": sessionize_events,
    "top_spenders_per_segment": top_spenders_per_segment,
    "trailing_hour_stats": trailing_hour_stats,
}

ORACLES = {
    "ranking_suite": RANKING_SQL,
    "latest_event_per_user": LATEST_SQL,
    "moving_avg_per_user": MOVING_AVG_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "top_spenders_per_segment": TOP_SPENDERS_SQL,
    "trailing_hour_stats": TRAILING_HOUR_SQL,
}
