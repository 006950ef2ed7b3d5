"""Statistical-moment aggregates: variance, stddev, covariance,
correlation — exact-decimal formulation.

Beyond-reference capability (its aggregate surface stops at AVG,
reference `hive.py:65-68`). The engine's built-ins (`F.var_samp`,
`F.corr`, ...) use streaming one-pass updates whose float rounding is
engine- and partition-order-specific — they'd flap an exact oracle
diff. So these operators compute the moments FROM EXACT DECIMAL SUMS
(Σx, Σx², Σxy — associative, order-independent; functions/numeric.py
convention), then apply the closed-form formulas in a fixed sequence of
double ops:

    var_samp = (Σx² − (Σx)²/n) / (n−1)
    corr     = (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²)

identical bit-for-bit on any engine and any partitioning. The oracle
runs the same formulas in DuckDB rather than its own corr()/var_samp().

Scale stance: each moment is a plain partial-aggregable SUM — one
shuffle carrying 5 decimals per group, same cost as any multi-agg
(and unlike two-pass "subtract the mean" formulations, no second scan).
See the DEC comment below for how the decimal width is sized to the
measure's true scale — over-widening breaks exactness in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table

# Size the decimal scale to the measure's TRUE scale (these measures
# are 2-decimal money/integer quantities): a (18,2)×(18,2) product is
# (37,4) — exact in BOTH engines AND its scaled element value fits
# int64, so DuckDB's narrow multiply path can't overflow and Spark
# never hits its precision-loss scale reduction. Over-widening the
# inputs is what breaks: (18,6)² overflows DuckDB's int64 element
# math, and (19,6)² trips Spark's scale-reducing rounding.
DEC = "decimal(18,2)"


def _sums(x: str, y: str) -> list[Column]:
    xc, yc = F.col(x).cast(DEC), F.col(y).cast(DEC)
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).cast("double").alias("sx"),
        F.sum(yc).cast("double").alias("sy"),
        F.sum(xc * yc).cast("double").alias("sxy"),
        F.sum(xc * xc).cast("double").alias("sxx"),
        F.sum(yc * yc).cast("double").alias("syy"),
    ]


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag var/stddev of quantity and corr(quantity, price)."""
    li = load_table(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        *_sums("l_quantity", "l_extendedprice")
    )
    n = F.col("n").cast("double")
    var_q = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    # round(…, 6): Σy² is exact in decimal but its cast to double can
    # differ by 1 ulp between engines (Java BigDecimal.doubleValue vs
    # DuckDB's int128·10⁻ˢ path) — the SURVEY §7 rounding discipline
    # absorbs that last-ulp drift in the derived moments.
    return sums.select(
        "l_returnflag",
        F.col("n").alias("n_items"),
        F.round(var_q, 6).alias("var_qty"),
        F.round(F.sqrt(var_q), 6).alias("stddev_qty"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


STATS_MOMENTS_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       n AS n_items,
       round((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 6)
         AS var_qty,
       round(sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1)), 6) AS stddev_qty,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
         AS corr_qty_price
FROM sums
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Array/collection function suite: collect + sort + dedup + membership
# + string-agg, one row per user. Arrays stay internal (deterministic
# via sort_array); the OUTPUT is scalars/strings so the cross-engine
# compare never depends on array formatting.
def array_funcs_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    types = F.sort_array(F.array_distinct(F.collect_list("event_type")))
    return (
        events.groupBy("user_id")
        .agg(types.alias("types"))
        .select(
            "user_id",
            F.size("types").alias("n_distinct_types"),
            F.array_contains("types", "purchase").alias("has_purchase"),
            F.concat_ws(",", "types").alias("types_csv"),
            F.element_at("types", 1).alias("first_type"),
            F.element_at("types", -1).alias("last_type"),
            F.size(
                F.array_intersect("types", F.array(F.lit("click"), F.lit("view")))
            ).alias("n_browse_types"),
        )
    )


ARRAY_FUNCS_SQL = """
WITH per_user AS (
  SELECT user_id,
         list_sort(list(DISTINCT event_type)) AS types
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(types) AS INTEGER) AS n_distinct_types,
       list_contains(types, 'purchase') AS has_purchase,
       array_to_string(types, ',') AS types_csv,
       types[1] AS first_type,
       types[-1] AS last_type,
       CAST(len(list_intersect(types, ['click', 'view'])) AS INTEGER)
         AS n_browse_types
FROM per_user
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Conditional aggregation — the FILTER-clause surface (ANSI
# `agg(x) FILTER (WHERE p)`), expressed DataFrame-side as
# `agg(when(p, x))` which Catalyst folds into the same single-pass
# partial aggregate: one scan, one shuffle, every conditional measure
# computed map-side. No per-condition re-scan at any scale.
def conditional_agg_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(27,6)")
    big = F.col("value") > 100
    night = F.hour("ts") < 6
    n_big = F.count(F.when(big, 1))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            n_big.alias("n_big"),
            F.sum(F.when(big, dec)).cast("double").alias("sum_big"),
            F.count(F.when(night, 1)).alias("n_night"),
            F.round(n_big / F.count(F.lit(1)), 6).alias("big_share"),
        )
    )


CONDITIONAL_AGG_SQL = """
SELECT event_type,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE value > 100) AS n_big,
       CAST(SUM(CAST(value AS DECIMAL(27,6)))
            FILTER (WHERE value > 100) AS DOUBLE) AS sum_big,
       COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) < 6) AS n_night,
       round(COUNT(*) FILTER (WHERE value > 100) / COUNT(*), 6) AS big_share
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Equi-width histogram. The distribution profile every data-quality
# report needs, as ONE map-side-combinable aggregate: bin id is a pure
# scalar expression (floor arithmetic — identical in any engine, unlike
# width_bucket variants), so the shuffle carries ≤ n_bins rows per task
# regardless of fact size; empty bins are materialized by a range join
# against a generated spine so the output shape is stable.
HIST_LO, HIST_HI, HIST_BINS = 0.0, 400.0, 16


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    bin_id = F.least(
        F.lit(HIST_BINS - 1),
        F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(width)),
    ).cast("int")
    counts = (
        ev.filter(F.col("value").isNotNull() & (F.col("value") >= HIST_LO))
        .select(bin_id.alias("bin"))
        .groupBy("bin")
        .count()
    )
    spine = spark.range(HIST_BINS).select(F.col("id").cast("int").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(HIST_LO) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            F.coalesce(F.col("count"), F.lit(0)).alias("n"),
        )
    )


VALUE_HISTOGRAM_SQL = f"""
WITH counts AS (
    SELECT CAST(LEAST({HIST_BINS - 1},
                CAST(FLOOR((value - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS}) AS BIGINT)) AS INT) AS bin,
           COUNT(*) AS cnt
    FROM events
    WHERE value IS NOT NULL AND value >= {HIST_LO}
    GROUP BY 1
)
SELECT s.bin,
       {HIST_LO} + s.bin * {(HIST_HI - HIST_LO) / HIST_BINS} AS bin_lo,
       COALESCE(cnt, 0) AS n
FROM (SELECT CAST(range AS INT) AS bin FROM range({HIST_BINS})) s
LEFT JOIN counts ON s.bin = counts.bin
ORDER BY s.bin
"""


# --------------------------------------------------------------------------
# Integrity audit: the expectations-style checks a pipeline runs before
# trusting a snapshot — duplicate primary keys, orphaned foreign keys
# (LEFT ANTI joins, build side pruned to the key column), null and
# empty-value rates. Each check is an independent single-row aggregate
# over a column-pruned scan; the UNION ALL of one-row frames costs
# nothing. At 100 TB the FK checks are the expensive ones — they are
# key-only anti joins, so the shuffle carries 8-byte keys, not rows.
def integrity_audit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def tag(name: str, violations: DataFrame, checked: DataFrame) -> DataFrame:
        # two one-row aggregates crossed into one labeled row — fully
        # lazy, no driver-side count()s; each side stays column-pruned.
        return (
            violations.crossJoin(checked)
            .select(
                F.lit(name).alias("check_name"),
                F.col("n_violations").cast("long").alias("n_violations"),
                F.col("n_checked").cast("long").alias("n_checked"),
            )
        )

    n = F.count(F.lit(1))
    pk = orders.groupBy("o_orderkey").agg(n.alias("c")).agg(
        F.sum((F.col("c") > 1).cast("int")).alias("n_violations"),
        n.alias("n_checked"),
    ).select("n_violations").crossJoin(
        orders.select("o_orderkey").distinct().agg(n.alias("n_checked"))
    ).select(
        F.lit("orders_pk_duplicate").alias("check_name"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_checked").cast("long").alias("n_checked"),
    )
    orphan_li = tag(
        "lineitem_orphan_orderkey",
        lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(n.alias("n_violations")),
        lineitem.agg(n.alias("n_checked")),
    )
    orphan_ord = tag(
        "orders_orphan_custkey",
        orders.select("o_custkey")
        .join(customer.select("c_custkey"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(n.alias("n_violations")),
        orders.agg(n.alias("n_checked")),
    )
    null_val = tag(
        "events_null_value",
        events.agg(F.sum(F.col("value").isNull().cast("int")).alias("n_violations")),
        events.agg(n.alias("n_checked")),
    )
    empty_doc = tag(
        "documents_empty_text",
        docs.agg(F.sum((F.trim("text") == "").cast("int")).alias("n_violations")),
        docs.agg(n.alias("n_checked")),
    )
    from functools import reduce

    return reduce(
        DataFrame.unionByName, [pk, orphan_li, orphan_ord, null_val, empty_doc]
    )


INTEGRITY_AUDIT_SQL = """
SELECT 'orders_pk_duplicate' AS check_name,
       (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                              GROUP BY o_orderkey HAVING COUNT(*) > 1))
         AS n_violations,
       (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_checked
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       (SELECT COUNT(*) FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders_orphan_custkey',
       (SELECT COUNT(*) FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'events_null_value',
       (SELECT COUNT(*) FROM events WHERE value IS NULL),
       (SELECT COUNT(*) FROM events)
UNION ALL
SELECT 'documents_empty_text',
       (SELECT COUNT(*) FROM documents WHERE trim(text) = ''),
       (SELECT COUNT(*) FROM documents)
ORDER BY check_name
"""


# --------------------------------------------------------------------------
# Equi-depth (quantile) binning — the feature-bucketization complement
# to the equi-width histogram above. A global NTILE would be a
# single-partition sort of the fact table; instead the 9 decile
# cutpoints (rounded 6 dp — the exact-percentile convention) broadcast
# onto the scan, and bin assignment is a row-local fold over the
# 9-element array. Bin populations stay ±1-decile-exact and the whole
# thing is one aggregate + one scan at any scale.
def equidepth_bins_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    probs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    cuts = ev.agg(
        F.transform(
            F.percentile("value", probs), lambda c: F.round(c, 6)
        ).alias("cuts")
    )
    bin_ = 1 + F.aggregate(
        F.col("cuts"),
        F.lit(0),
        lambda acc, c: acc + (F.col("value") > c).cast("int"),
    )
    return (
        ev.crossJoin(F.broadcast(cuts))
        .select(bin_.alias("bin"), "value")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


EQUIDEPTH_SQL = """
WITH cuts AS (
  SELECT list_transform(
           quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           c -> round(c, 6)) AS cuts
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(1 + len(list_filter(cuts, c -> value > c)) AS INTEGER) AS bin,
       COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
FROM events, cuts
WHERE value IS NOT NULL
GROUP BY bin
ORDER BY bin
"""


# --------------------------------------------------------------------------
# Pairwise Pearson correlation matrix over the four lineitem measures,
# from ONE exact-decimal power-sum aggregate (4 sums + 10 product sums
# + count in a single scan, fully partial-aggregable), then the 6
# upper-triangle pairs unpacked map-side. The one-pass version of
# calling corr() six times — at 100 TB that's 1 fact scan instead of 6.
# Power sums are order-independent decimals, so every coefficient is
# bit-identical to the oracle's.
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(DEC)).cast("double").alias(f"s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum(F.col(a).cast(DEC) * F.col(b).cast(DEC))
                .cast("double")
                .alias(f"p_{a}_{b}")
            )
    sums = li.agg(*aggs)

    def corr(a: str, b: str) -> Column:
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}"), F.col(f"s_{b}")
        pab = F.col(f"p_{a}_{b}")
        paa, pbb = F.col(f"p_{a}_{a}"), F.col(f"p_{b}_{b}")
        return F.round(
            (n * pab - sa * sb)
            / F.sqrt((n * paa - sa * sa) * (n * pbb - sb * sb)),
            6,
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr(a, b).alias("pearson_r"),
            )
            for i, a in enumerate(cols)
            for b in cols[i + 1 :]
        ]
    )
    return (
        sums.select(F.explode(pairs).alias("p"))
        .select("p.col_a", "p.col_b", "p.pearson_r")
    )


def _corr_matrix_sql() -> str:
    cols = _CORR_COLS
    sum_exprs = [
        f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c}" for c in cols
    ]
    for i, a in enumerate(cols):
        for b in cols[i:]:
            sum_exprs.append(
                f"CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)))"
                f" AS DOUBLE) AS p_{a}_{b}"
            )
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            rows.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,\n"
                f"  round((CAST(n AS DOUBLE) * p_{a}_{b} - s_{a} * s_{b})\n"
                f"        / sqrt((CAST(n AS DOUBLE) * p_{a}_{a} - s_{a} * s_{a})\n"
                f"               * (CAST(n AS DOUBLE) * p_{b}_{b} - s_{b} * s_{b})),"
                f" 6) AS pearson_r\n"
                f"FROM sums"
            )
    body = "\nUNION ALL\n".join(rows)
    return (
        "WITH sums AS (\n  SELECT COUNT(*) AS n,\n         "
        + ",\n         ".join(sum_exprs)
        + "\n  FROM lineitem\n)\n"
        + body
        + "\nORDER BY col_a, col_b"
    )


CORR_MATRIX_SQL = _corr_matrix_sql()


# --------------------------------------------------------------------------
# Welch two-sample t-test — the A/B-testing primitive: compare the
# `value` distributions of two event types without assuming equal
# variances. Everything derives from the same one-pass exact-decimal
# power sums as stats_moments (ONE conditional aggregate scan computes
# both groups — no per-group re-scan), then the t statistic and
# Welch–Satterthwaite degrees of freedom are fixed double expressions
# rounded to 6.
_AB_A, _AB_B = "click", "view"


def ab_test_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_AB_A, _AB_B)
    )
    dec = "decimal(27,6)"
    v = F.col("value").cast(dec)
    is_a = F.col("event_type") == _AB_A
    sums = ev.agg(
        F.count(F.when(is_a, 1)).alias("na"),
        F.count(F.when(~is_a, 1)).alias("nb"),
        F.sum(F.when(is_a, v)).cast("double").alias("sa"),
        F.sum(F.when(~is_a, v)).cast("double").alias("sb"),
        F.sum(F.when(is_a, v * v)).cast("double").alias("qa"),
        F.sum(F.when(~is_a, v * v)).cast("double").alias("qb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma, mb = F.col("sa") / na, F.col("sb") / nb
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - 1)
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    df = (se2 * se2) / (
        (va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)
    )
    return sums.select(
        F.lit(_AB_A).alias("group_a"),
        F.lit(_AB_B).alias("group_b"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"),
    )


AB_TTEST_SQL = f"""
WITH sums AS (
  SELECT
    COUNT(*) FILTER (WHERE event_type = '{_AB_A}') AS na,
    COUNT(*) FILTER (WHERE event_type = '{_AB_B}') AS nb,
    CAST(SUM(CAST(value AS DECIMAL(27,6)))
         FILTER (WHERE event_type = '{_AB_A}') AS DOUBLE) AS sa,
    CAST(SUM(CAST(value AS DECIMAL(27,6)))
         FILTER (WHERE event_type = '{_AB_B}') AS DOUBLE) AS sb,
    CAST(SUM(CAST(value AS DECIMAL(27,6)) * CAST(value AS DECIMAL(27,6)))
         FILTER (WHERE event_type = '{_AB_A}') AS DOUBLE) AS qa,
    CAST(SUM(CAST(value AS DECIMAL(27,6)) * CAST(value AS DECIMAL(27,6)))
         FILTER (WHERE event_type = '{_AB_B}') AS DOUBLE) AS qb
  FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')
),
m AS (
  SELECT na, nb,
         sa / CAST(na AS DOUBLE) AS ma,
         sb / CAST(nb AS DOUBLE) AS mb,
         (qa - sa * sa / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)
           / CAST(na AS DOUBLE) AS sea,
         (qb - sb * sb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)
           / CAST(nb AS DOUBLE) AS seb
  FROM sums
)
SELECT '{_AB_A}' AS group_a, '{_AB_B}' AS group_b,
       na AS n_a, nb AS n_b,
       round(ma, 6) AS mean_a,
       round(mb, 6) AS mean_b,
       round((ma - mb) / sqrt(sea + seb), 6) AS t_stat,
       round((sea + seb) * (sea + seb)
             / (sea * sea / (CAST(na AS DOUBLE) - 1)
                + seb * seb / (CAST(nb AS DOUBLE) - 1)), 6) AS welch_df
FROM m
"""


# --------------------------------------------------------------------------
# Chi-square independence test — is event type independent of day of
# week? The categorical sibling of ab_test_ttest. One contingency
# aggregate (types × 7 cells), margins via two tiny re-aggregates
# broadcast back onto the cells, χ² from rounded-then-decimal-summed
# cell terms. All inputs are integer counts, so the only doubles are
# the expected-count divisions — fixed expression order, identical in
# both engines.
def chi_square_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    row_m = cells.groupBy("event_type").agg(F.sum("o").alias("row_n"))
    col_m = cells.groupBy("dow").agg(F.sum("o").alias("col_n"))
    total = cells.agg(F.sum("o").alias("n"))
    expected = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round(
        (F.col("o") - expected) * (F.col("o") - expected) / expected, 9
    ).cast("decimal(27,12)")
    joined = (
        cells.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "dow")
        .crossJoin(F.broadcast(total))
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("dow").alias("n_dows"),
        F.round(F.sum(term).cast("double"), 6).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).alias("dof"),
    )


CHI_SQUARE_SQL = """
WITH cells AS (
  SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
row_m AS (SELECT event_type, SUM(o) AS row_n FROM cells GROUP BY event_type),
col_m AS (SELECT dow, SUM(o) AS col_n FROM cells GROUP BY dow),
total AS (SELECT SUM(o) AS n FROM cells)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(COUNT(DISTINCT c.event_type) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT c.dow) AS BIGINT) AS n_dows,
       round(CAST(SUM(CAST(round(
           (c.o - CAST(r.row_n AS DOUBLE) * CAST(cm.col_n AS DOUBLE)
                  / CAST(t.n AS DOUBLE))
         * (c.o - CAST(r.row_n AS DOUBLE) * CAST(cm.col_n AS DOUBLE)
                  / CAST(t.n AS DOUBLE))
         / (CAST(r.row_n AS DOUBLE) * CAST(cm.col_n AS DOUBLE)
            / CAST(t.n AS DOUBLE)), 9) AS DECIMAL(27,12))) AS DOUBLE), 6)
         AS chi2,
       CAST((COUNT(DISTINCT c.event_type) - 1)
            * (COUNT(DISTINCT c.dow) - 1) AS BIGINT) AS dof
FROM cells c
JOIN row_m r USING (event_type)
JOIN col_m cm USING (dow)
CROSS JOIN total t
"""


# --------------------------------------------------------------------------
# Bootstrap confidence interval for the per-type mean — the POISSON
# bootstrap (each row enters replica b with weight ~ Poisson(1)), which
# is the distributed-friendly resampling scheme: weights are computed
# row-locally from a portable hash (md5-digit uniform → Poisson inverse
# CDF as a CASE ladder over fixed literal thresholds), so there is no
# global resample shuffle, replicas fan out map-side (B=50 per row),
# and — because the randomness is a deterministic function of
# (event_id, replica) — the whole randomized procedure is EXACTLY
# oracle-checked, like dp_count_report's noise. Replica means use the
# exact-decimal convention; the CI bounds are percentiles over B=50
# replica means, rounded to 5 dp to absorb last-ulp interpolation
# drift between engines.
_BOOT_B = 50
_BOOT_KEY = "bootstrap-v1"
# Poisson(1) CDF thresholds: P(X<=k) for k = 0..5; tail truncated at 6
# identically in both engines (P(X>5) ≈ 6e-4).
_POIS_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406)


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    rep = ev.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "event_id",
    )
    digits = F.regexp_replace(
        F.md5(
            F.concat_ws(":", F.lit(_BOOT_KEY), F.col("event_id"), F.col("b"))
        ),
        "[a-f]",
        "",
    )
    u = F.coalesce(
        F.nullif(F.substring(digits, 1, 15), F.lit("")).cast("long") / F.lit(1e15),
        F.lit(0.5),
    )
    w = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    dec = "decimal(27,6)"
    means = (
        rep.select("event_type", "b", w.alias("w"), "value")
        .groupBy("event_type", "b")
        .agg(
            (
                F.sum(F.round(F.col("w") * F.col("value"), 6).cast(dec)).cast(
                    "double"
                )
                / F.greatest(F.sum("w"), F.lit(1))
            ).alias("m")
        )
        .select("event_type", "b", F.round("m", 6).alias("m"))
    )
    return (
        means.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_replicas"),
            F.round(F.percentile("m", F.lit(0.025)), 5).alias("ci_lo"),
            F.round(F.percentile("m", F.lit(0.5)), 5).alias("ci_mid"),
            F.round(F.percentile("m", F.lit(0.975)), 5).alias("ci_hi"),
        )
    )


def _bootstrap_sql() -> str:
    ladder = "CASE "
    for k, p in enumerate(_POIS_CDF):
        ladder += f"WHEN u < {p} THEN {k} "
    ladder += "ELSE 6 END"
    return f"""
WITH rep AS (
  SELECT event_type, value, b.b AS b, event_id
  FROM events CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b) b
),
uni AS (
  SELECT event_type, value, b,
         least(greatest(COALESCE(
           CAST(nullif(substr(regexp_replace(
             md5('{_BOOT_KEY}' || ':' || CAST(event_id AS VARCHAR)
                 || ':' || CAST(b AS VARCHAR)),
             '[a-f]', '', 'g'), 1, 15), '') AS BIGINT) / 1e15,
           0.5), 0.0), 1.0) AS u
  FROM rep
),
weighted AS (
  SELECT event_type, value, b, {ladder} AS w FROM uni
),
means AS (
  SELECT event_type, b,
         round(CAST(SUM(CAST(round(w * value, 6) AS DECIMAL(27,6))) AS DOUBLE)
               / GREATEST(SUM(w), 1), 6) AS m
  FROM weighted GROUP BY event_type, b
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_replicas,
       round(quantile_cont(m, 0.025), 5) AS ci_lo,
       round(quantile_cont(m, 0.5), 5) AS ci_mid,
       round(quantile_cont(m, 0.975), 5) AS ci_hi
FROM means
GROUP BY event_type
ORDER BY event_type
"""


BOOTSTRAP_CI_SQL = _bootstrap_sql()


QUERIES = {
    "integrity_audit_report": integrity_audit_report,
    "equidepth_bins_value": equidepth_bins_value,
    "stats_moments": stats_moments,
    "array_funcs_per_user": array_funcs_per_user,
    "conditional_agg_per_type": conditional_agg_per_type,
    "value_histogram": value_histogram,
    "correlation_matrix": correlation_matrix,
    "ab_test_ttest": ab_test_ttest,
    "chi_square_type_by_dow": chi_square_type_by_dow,
    "bootstrap_mean_ci": bootstrap_mean_ci,
}

ORACLES = {
    "integrity_audit_report": INTEGRITY_AUDIT_SQL,
    "equidepth_bins_value": EQUIDEPTH_SQL,
    "stats_moments": STATS_MOMENTS_SQL,
    "array_funcs_per_user": ARRAY_FUNCS_SQL,
    "conditional_agg_per_type": CONDITIONAL_AGG_SQL,
    "value_histogram": VALUE_HISTOGRAM_SQL,
    "correlation_matrix": CORR_MATRIX_SQL,
    "ab_test_ttest": AB_TTEST_SQL,
    "chi_square_type_by_dow": CHI_SQUARE_SQL,
    "bootstrap_mean_ci": BOOTSTRAP_CI_SQL,
}
