"""Product-analytics operators: ordered funnel, cohort retention,
linear regression, percentile profile, deterministic mode.

Beyond-reference capability (the reference's analytics stop at
hour-bucketed averages, `hive.py:55-99`); these are the shapes a
telemetry/events warehouse is actually asked for, expressed as
single-plan DataFrame chains.

Scale notes:

- The funnel computes three per-user window minima over the SAME
  `partitionBy(user_id)` hash partitioning, then aggregates per user
  and globally: ONE shuffle on `user_id` feeds every stage (Catalyst
  reuses the exchange; unbounded-frame windows need no sort), plus a
  final single-row reduce. No self-joins, no per-stage re-scans —
  at 100 TB the funnel costs the same as one grouped aggregate.
- Cohort retention dedups (user, day) pairs on the user_id
  partitioning established by the first-event window, then reduces to
  (cohort_day, offset) cells — output is O(days²), tiny at any scale.
- Regression coefficients come from exact decimal power sums
  (Σx, Σy, Σxy, Σx² — associative, order-independent; same convention
  as `stats.py`), so the slope/intercept are bit-identical on any
  engine and any partitioning: one partial-aggregable shuffle.
- The mode uses an explicit tie-break (max count, then smallest key)
  rather than the engine's `mode()` whose tie choice is unspecified —
  determinism is part of the operator contract here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table

# --------------------------------------------------------------------------
# Ordered funnel: view → click (after first view) → purchase (after
# that click), per user; global stage-reach counts.


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
    )


FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM t1) AS n_view,
       (SELECT COUNT(*) FROM t2) AS n_view_click,
       (SELECT COUNT(*) FROM t3) AS n_full_funnel
"""


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-active day; how many are
# active again d days later.


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    cohort = F.date_trunc("day", F.min("ts").over(w))
    day = F.date_trunc("day", F.col("ts"))
    cells = (
        ev.select(
            "user_id",
            F.date_format(cohort, "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(day, cohort).alias("day_offset"),
        )
        .distinct()
    )
    return (
        cells.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


COHORT_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort FROM events GROUP BY user_id
),
cells AS (
  SELECT DISTINCT e.user_id,
         strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
         date_diff('day', f.cohort, date_trunc('day', e.ts)) AS day_offset
  FROM events e JOIN firsts f USING (user_id)
)
SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
       COUNT(*) AS n_active_users
FROM cells
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


# --------------------------------------------------------------------------
# Least-squares regression per group from exact decimal power sums.

DEC = "decimal(18,2)"  # quantities/prices are 2-decimal; see stats.py


def regression_price_vs_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS fit extendedprice ~ quantity: slope, intercept,
    computed from Σx/Σy/Σxy/Σx² exact decimal sums (engine-portable)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(DEC)
    y = F.col("l_extendedprice").cast(DEC)
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return sums.select(
        "l_returnflag",
        F.col("n").alias("n_items"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


REGRESSION_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n AS n_items,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
       round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
             / CAST(n AS DOUBLE), 6) AS intercept
FROM sums
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Exact percentile profile (linear interpolation, the ANSI
# PERCENTILE_CONT definition both engines implement).


def percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        ev.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p25"),
            F.round(F.col("p")[1], 6).alias("p50"),
            F.round(F.col("p")[2], 6).alias("p75"),
        )
    )


PERCENTILE_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Deterministic mode: modal hour-of-day per event type, ties broken by
# the smallest hour (built-in mode() leaves ties unspecified).


def modal_hour_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("hr"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("hr").alias("modal_hour"), F.col("n").alias("n_at_mode"))
    )


MODAL_HOUR_SQL = """
WITH counts AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY event_type, hr
),
ranked AS (
  SELECT event_type, hr, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hr ASC) AS rk
  FROM counts
)
SELECT event_type, CAST(hr AS INTEGER) AS modal_hour, n AS n_at_mode
FROM ranked WHERE rk = 1
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Winsorization: clip per-group outliers at the exact p01/p99 before a
# model ever sees them — standard feature/label hygiene in a training
# pipeline. Two passes by necessity (a quantile is a global property),
# but pass one reduces to one tiny row per group which BROADCASTS back
# onto the fact scan — no second shuffle. Bounds and clipped values are
# round()ed to 6 dp (the exact-percentile convention above) so the
# clip comparisons and the winsorized mean are cross-engine stable.
def winsorize_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orionld_to_hive_spark.functions.numeric import DECIMAL_T, davg

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.01)), 6).alias("p_lo"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p_hi"),
    )
    clipped = F.round(
        F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi")), 6
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("p_lo")).cast("int")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("value") > F.col("p_hi")).cast("int")).alias(
                "n_clipped_high"
            ),
            davg("value", "mean_raw"),
            (
                F.sum(clipped.cast(DECIMAL_T)).cast("double") / F.count(F.lit(1))
            ).alias("mean_winsorized"),
        )
    )


WINSORIZE_SQL = """
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
bounds AS (
  SELECT event_type,
         round(quantile_cont(value, 0.01), 6) AS p_lo,
         round(quantile_cont(value, 0.99), 6) AS p_hi
  FROM ev GROUP BY event_type
)
SELECT ev.event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN value < p_lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(SUM(CASE WHEN value > p_hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value)
         AS mean_raw,
       CAST(SUM(CAST(round(least(greatest(value, p_lo), p_hi), 6)
                     AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
         AS mean_winsorized
FROM ev JOIN bounds USING (event_type)
GROUP BY ev.event_type
ORDER BY ev.event_type
"""


# --------------------------------------------------------------------------
# RFM segmentation: recency / frequency / monetary scoring, the classic
# customer-value cube. Per-customer metrics come from ONE aggregate
# over orders; the three quartile cutpoint sets (rounded 6 dp, the
# exact-percentile convention) broadcast back onto the |customers|-row
# frame; scores are row-local folds. Output is the segment rollup —
# at any scale only the customer-level aggregate shuffles.
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orionld_to_hive_spark.functions.numeric import dsum

    orders = load_table(spark, sf_dir, "orders")
    # recency in integer DAYS from a fixed anchor, not epoch seconds:
    # quartile interpolation of small integers is binary-exact in both
    # engines, where ~1e9-second magnitudes leave last-ulp drift that
    # survives the 6-dp rounding and can flip a boundary score.
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "recency_d"
        ),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice", "monetary"),
    )
    cuts = per_cust.agg(
        *[
            F.transform(
                F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))),
                lambda x: F.round(x, 6),
            ).alias(f"{c}_cuts")
            for c in ("recency_d", "frequency", "monetary")
        ]
    )

    def score(metric: str) -> F.Column:
        return 1 + F.aggregate(
            F.col(f"{metric}_cuts"),
            F.lit(0),
            lambda acc, c: acc + (F.col(metric) > c).cast("int"),
        )

    return (
        per_cust.crossJoin(F.broadcast(cuts))
        .select(
            "monetary",
            F.concat(
                score("recency_d").cast("string"),
                score("frequency").cast("string"),
                score("monetary").cast("string"),
            ).alias("segment"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # exact decimal TOTAL, not an average: round()ing a ~1e6
            # double to 6 dp is the one op Spark (BigDecimal HALF_UP)
            # and DuckDB (float multiply) disagree on at tie ulps
            F.sum(F.col("monetary").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_monetary"),
        )
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         datediff('day', DATE '1995-01-01', CAST(MAX(o_orderdate) AS DATE))
           AS recency_d,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
cuts AS (
  SELECT list_transform(quantile_cont(recency_d, [0.25, 0.5, 0.75]),
                        x -> round(x, 6)) AS r_cuts,
         list_transform(quantile_cont(frequency, [0.25, 0.5, 0.75]),
                        x -> round(x, 6)) AS f_cuts,
         list_transform(quantile_cont(monetary, [0.25, 0.5, 0.75]),
                        x -> round(x, 6)) AS m_cuts
  FROM per_cust
),
scored AS (
  SELECT monetary,
         CAST(1 + len(list_filter(r_cuts, c -> recency_d > c)) AS VARCHAR)
         || CAST(1 + len(list_filter(f_cuts, c -> frequency > c)) AS VARCHAR)
         || CAST(1 + len(list_filter(m_cuts, c -> monetary > c)) AS VARCHAR)
           AS segment
  FROM per_cust, cuts
)
SELECT segment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(monetary AS DECIMAL(27,6))) AS DOUBLE) AS total_monetary
FROM scored
GROUP BY segment
ORDER BY segment
"""


# --------------------------------------------------------------------------
ZSCORE_CUT = 2.5


def zscore_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier screen: events whose value sits
    more than ZSCORE_CUT sample stddevs from the type mean. Moments come
    from exact decimal power sums broadcast back onto the fact scan —
    one map-side-combined aggregate over |types| groups plus one
    broadcast join; the fact table never shuffles.

    Determinism: mean/var/z are derived from the decimal sums with the
    IDENTICAL expression tree on both engines (a fixed sequence of IEEE
    double ops), so even the > cut membership test agrees bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    sums = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("sx"),
        F.sum(
            (F.col("value").cast("decimal(27,6)")
             * F.col("value").cast("decimal(27,6)"))
        ).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sx") / n
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    stats = sums.select(
        "event_type", mean.alias("mean"), F.sqrt(var).alias("std")
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("mean", 6).alias("type_mean"),
            F.round("std", 6).alias("type_std"),
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(z) > ZSCORE_CUT)
    )


ZSCORE_SQL = f"""
WITH sums AS (
  SELECT event_type,
         COUNT(value) AS n,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(27,6))
                  * CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sxx
  FROM events GROUP BY event_type
),
stats AS (
  SELECT event_type, sx / CAST(n AS DOUBLE) AS mean,
         sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
           AS std
  FROM sums
)
SELECT event_id, event_type, value,
       round(mean, 6) AS type_mean,
       round(std, 6) AS type_std,
       round((value - mean) / std, 6) AS zscore
FROM events JOIN stats USING (event_type)
WHERE abs((value - mean) / std) > {ZSCORE_CUT}
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: counts and
# row-normalized probabilities of event_type -> next event_type. One
# (user_id) shuffle for the lag window; the transition aggregate is
# |types|² keys and the normalizing window runs over that tiny result.
# The (ts, event_id) ordering key makes lag deterministic under
# timestamp ties on both engines.
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    row_tot = F.sum("n_trans").over(Window.partitionBy("prev_type"))
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.round(F.col("n_trans") / row_tot, 6).alias("p"),
    )


TRANSITION_SQL = """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
t AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_trans,
       round(n_trans::DOUBLE / SUM(n_trans) OVER (PARTITION BY prev_type), 6)
         AS p
FROM t ORDER BY prev_type, next_type
"""


# --------------------------------------------------------------------------
# Dwell-time profile: time between consecutive events of a user,
# attributed to the earlier event's type, with EXACT discrete p50/p90.
# The quantiles use the two-phase histogram form — aggregate to
# (type, gap) counts first (map-side combined), then a cumulative sum
# over the DISTINCT gap values only — so no per-type total sort of raw
# rows ever happens; with 5 types, sorting raw gaps would funnel 1/5 of
# a 100 TB table through one task, while distinct-value histograms stay
# bounded by value cardinality. Quantile definition (smallest value
# with cumulative count >= ceil(q*n)) is tie-free by construction and
# phrased identically on both engines.
def dwell_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            F.col("event_type").alias("prev_type"),
            (
                F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    hist = gaps.groupBy("prev_type", "gap_us").agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = Window.partitionBy("prev_type")
    wcum = wt.orderBy("gap_us").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("c").over(wcum)
    tot = F.sum("c").over(wt)
    sized = hist.select(
        "prev_type",
        "gap_us",
        "c",
        cum.alias("cum"),
        tot.alias("tot"),
    )
    q = lambda frac: F.min(  # noqa: E731
        F.when(
            F.col("cum") >= F.ceil(F.col("tot") * F.lit(frac)), F.col("gap_us")
        )
    )
    return (
        sized.groupBy("prev_type")
        .agg(
            F.sum("c").alias("n_gaps"),
            # sum c·gap_us in DECIMAL(38,0): a BIGINT sum overflows at
            # the 100 TB scale this op targets (µs gaps ~1e9 × counts
            # ~1e12 > 2^63; ANSI mode would raise). Exact like the
            # oracle's HUGEINT sum, then cast to double for the mean.
            F.round(
                (
                    F.sum((F.col("c") * F.col("gap_us")).cast("decimal(38,0)"))
                    .cast("double")
                    / F.lit(1000000.0)
                )
                / F.sum("c"),
                6,
            ).alias("mean_gap_s"),
            q(0.5).alias("p50_gap_us"),
            q(0.9).alias("p90_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


DWELL_SQL = """
WITH gaps AS (
  SELECT event_type AS prev_type,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
),
hist AS (
  SELECT prev_type, gap_us, COUNT(*) AS c
  FROM gaps WHERE gap_us IS NOT NULL
  GROUP BY prev_type, gap_us
),
sized AS (
  SELECT prev_type, gap_us, c,
         SUM(c) OVER (PARTITION BY prev_type ORDER BY gap_us
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY prev_type) AS tot
  FROM hist
)
SELECT prev_type,
       CAST(SUM(c) AS BIGINT) AS n_gaps,
       round((CAST(SUM(c * gap_us) AS DOUBLE) / 1000000.0)
             / CAST(SUM(c) AS DOUBLE), 6) AS mean_gap_s,
       CAST(MIN(CASE WHEN cum >= ceil(tot * 0.5) THEN gap_us END) AS BIGINT)
         AS p50_gap_us,
       CAST(MIN(CASE WHEN cum >= ceil(tot * 0.9) THEN gap_us END) AS BIGINT)
         AS p90_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM sized
GROUP BY prev_type
ORDER BY prev_type
"""


# --------------------------------------------------------------------------
# Market-basket association mining: brand pairs co-purchased in one
# order, scored by support / confidence / lift. The pair blow-up is the
# classic quadratic trap; it is bounded here the same way the graph
# co-occurrence projection is — pairs are generated per order, and an
# order's item count is naturally small (TPC-H ≤ 7 lines; a production
# cap would ride a row_number filter exactly like graph.py's _COOC_CAP).
# Items are BRANDS (25 distinct) so the support table is tiny and rides
# as a broadcast; the only fact-scale work is the distinct (order,
# brand) shuffle. min-support floor keeps the estimates stable; output
# is top-20 by lift, deterministic tiebreaks.
BASKET_MIN_PAIR_N = 20
BASKET_MAX_ITEMS = 64


def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # The (order, brand) basket set feeds FOUR consumers (order count,
    # singles, both sides of the pair join) — materialize it once, or
    # each consumer re-derives it from the fact table (10 FileScans
    # observed vs 0 after). Baskets are capped at BASKET_MAX_ITEMS
    # distinct brands (lowest-brand-first, same idiom as graph.py's
    # _COOC_CAP and mirrored in the oracle): TPC-H orders hold ≤ 7
    # lines so the cap never binds here, but a production mega-basket
    # would otherwise emit items² pairs.
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("l_orderkey").orderBy("p_brand")
            ),
        )
        .filter(F.col("rn") <= BASKET_MAX_ITEMS)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    n_orders_df = ob.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    single = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_a"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_PAIR_N)
    )
    sa = single.select(F.col("p_brand").alias("brand_a"), F.col("n_a"))
    sb = single.select(F.col("p_brand").alias("brand_b"), F.col("n_a").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("n_ab") / F.col("n_orders"))
                / ((F.col("n_a") / F.col("n_orders")) * (F.col("n_b") / F.col("n_orders"))),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(20)
    )


BASKET_LIFT_SQL = f"""
WITH ob_raw AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
ob AS (
  SELECT l_orderkey, p_brand FROM (
    SELECT l_orderkey, p_brand,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY p_brand) AS rn
    FROM ob_raw
  ) WHERE rn <= {BASKET_MAX_ITEMS}
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
single AS (SELECT p_brand, COUNT(*) AS n_a FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY brand_a, brand_b
  HAVING COUNT(*) >= {BASKET_MIN_PAIR_N}
)
SELECT brand_a, brand_b, n_ab,
       round(CAST(n_ab AS DOUBLE) / n_orders.n_orders, 6) AS support,
       round(CAST(n_ab AS DOUBLE) / sa.n_a, 6) AS confidence,
       round((CAST(n_ab AS DOUBLE) / n_orders.n_orders)
             / ((CAST(sa.n_a AS DOUBLE) / n_orders.n_orders)
                * (CAST(sb.n_a AS DOUBLE) / n_orders.n_orders)), 6) AS lift
FROM pairs
JOIN single sa ON pairs.brand_a = sa.p_brand
JOIN single sb ON pairs.brand_b = sb.p_brand
CROSS JOIN n_orders
ORDER BY lift DESC, brand_a, brand_b
LIMIT 20
"""


# --------------------------------------------------------------------------
# Robust outlier screen via MAD (median absolute deviation) — the
# z-score screen's robust sibling: mean/stddev are dragged by the very
# outliers being hunted, median/MAD are not (50% breakdown point).
# Two exact-percentile passes per type (median, then median of
# |value − median|), both broadcast back as |types|-row tables; the
# modified-z threshold (|value − med| > 3.5 · 1.4826 · MAD, Iglewicz-
# Hoaglin) is applied on 6-dp-rounded deviations in BOTH engines so a
# last-ulp interpolation difference cannot flip a boundary row.
MAD_K = 1.4826  # consistency constant: MAD·k estimates σ under normality
MAD_CUT = 3.5


def mad_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.round(F.abs(F.col("value") - F.col("med")), 6).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    cut = F.round(F.lit(MAD_CUT * MAD_K) * F.col("mad"), 6)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(F.when(F.col("dev") > cut, 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
    )


MAD_OUTLIER_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, m.med,
         round(abs(e.value - m.med), 6) AS dev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(ANY_VALUE(d.med), 6) AS median_value,
       round(ANY_VALUE(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.dev > round({MAD_CUT * MAD_K} * m.mad, 6)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


# --------------------------------------------------------------------------
# Recency-weighted engagement — the feature-engineering staple for
# ranking/retention models: each event contributes value · e^(−λ·age),
# so yesterday's click outweighs last month's. The reference point is
# the corpus max timestamp via a 1-row aggregate broadcast (never
# wall-clock now() — SURVEY §7 hard-part 1 — and never a global
# window). Per-user terms are rounded then decimal-summed; top-20.
RECENCY_LAMBDA_PER_H = 0.01


def recency_weighted_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    age_h = (F.col("ref_us") - F.unix_micros("ts")) / F.lit(3.6e9)
    term = F.round(
        F.col("value") * F.exp(-F.lit(RECENCY_LAMBDA_PER_H) * age_h), 9
    ).cast("decimal(27,12)")
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(term).cast("double"), 6).alias("engagement"),
        )
        .orderBy(F.col("engagement").desc(), F.col("user_id").asc())
        .limit(20)
    )


RECENCY_ENGAGEMENT_SQL = f"""
WITH ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(CAST(SUM(CAST(round(value * exp(-{RECENCY_LAMBDA_PER_H}
                 * ((ref_us - epoch_us(ts)) / 3.6e9)), 9)
                 AS DECIMAL(27,12))) AS DOUBLE), 6) AS engagement
FROM events CROSS JOIN ref
GROUP BY user_id
ORDER BY engagement DESC, user_id ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Growth accounting — the standard DAU decomposition: each active
# (user, day) is NEW (first day ever), RETAINED (also active the
# previous calendar day) or RESURRECTED (returning after a gap), and
# a user CHURNS out of day d when d+1 is inactive. Pure integer
# windows over the per-user activity sequence, so the oracle is exact
# by construction. One shuffle on user_id for the lag/lead windows,
# one small agg by day — the same scale shape as sessionization.


def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    active = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = active.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    gap_prev = F.datediff("day", "prev_day")
    gap_next = F.datediff("next_day", "day")
    return (
        seq.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.when(F.col("prev_day").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(gap_prev == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained"),
            F.sum(F.when(gap_prev > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_resurrected"),
            F.sum(
                F.when(
                    F.col("next_day").isNull() | (gap_next > 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_churned_after"),
        )
    )


GROWTH_ACCOUNTING_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
seq AS (
  SELECT user_id, day,
         lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM active
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN date_diff('day', prev_day, day) = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN date_diff('day', prev_day, day) > 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       CAST(SUM(CASE WHEN next_day IS NULL
                       OR date_diff('day', day, next_day) > 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned_after
FROM seq
GROUP BY day
ORDER BY day
"""


QUERIES = {
    "event_transition_matrix": event_transition_matrix,
    "dwell_time_profile": dwell_time_profile,
    "rfm_segments": rfm_segments,
    "zscore_outlier_events": zscore_outlier_events,
    "winsorize_report": winsorize_report,
    "funnel_conversion": funnel_conversion,
    "growth_accounting": growth_accounting,
    "cohort_retention": cohort_retention,
    "regression_price_vs_qty": regression_price_vs_qty,
    "percentile_profile": percentile_profile,
    "modal_hour_per_type": modal_hour_per_type,
    "basket_lift_pairs": basket_lift_pairs,
    "mad_outlier_report": mad_outlier_report,
    "recency_weighted_engagement": recency_weighted_engagement,
}

ORACLES = {
    "event_transition_matrix": TRANSITION_SQL,
    "dwell_time_profile": DWELL_SQL,
    "rfm_segments": RFM_SQL,
    "zscore_outlier_events": ZSCORE_SQL,
    "winsorize_report": WINSORIZE_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "growth_accounting": GROWTH_ACCOUNTING_SQL,
    "cohort_retention": COHORT_SQL,
    "regression_price_vs_qty": REGRESSION_SQL,
    "percentile_profile": PERCENTILE_SQL,
    "modal_hour_per_type": MODAL_HOUR_SQL,
    "basket_lift_pairs": BASKET_LIFT_SQL,
    "mad_outlier_report": MAD_OUTLIER_SQL,
    "recency_weighted_engagement": RECENCY_ENGAGEMENT_SQL,
}
