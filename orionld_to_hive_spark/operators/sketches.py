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
        .select(
            "event_type",
            F.col("p50_95_99").getItem(0).alias("p50"),
            F.col("p50_95_99").getItem(1).alias("p95"),
            F.col("p50_95_99").getItem(2).alias("p99"),
        )
    )


# --------------------------------------------------------------------------
# Exact distributed quantiles over events.value — the PORTABLE twin of
# quantile_approx_value, graduating the quantile family to an exact
# DuckDB oracle the way hll_portable_rollup graduated NDV. Spark's
# approx_percentile summary is engine-specific, so instead of checking
# "plausible" we compute the EXACT type-1 (lower-value) quantile with
# the distinct-value histogram + cumulative-sum move proven in
# analytics.dwell_time_profile: group by (event_type, value) — the
# histogram shuffles ONCE with full map-side combine and its size is
# bounded by distinct values, not rows — then a per-type cumulative
# window picks the smallest value whose cumulative count reaches
# ceil(tot·q). Both engines select an actual data value (no
# interpolation), so doubles compare bit-exactly. At 100 TB the
# histogram is the only fact-scale shuffle; the windows run over
# |distinct values per type|, and the final agg is |types| rows.
def quantile_portable_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    hist = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("event_type")
    wcum = wt.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    sized = hist.select(
        "event_type",
        "value",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wt).alias("tot"),
    )
    q = lambda frac: F.min(  # noqa: E731
        F.when(
            F.col("cum") >= F.ceil(F.col("tot") * F.lit(frac)), F.col("value")
        )
    )
    return (
        sized.groupBy("event_type")
        .agg(
            F.sum("c").alias("n_values"),
            q(0.5).alias("p50"),
            q(0.95).alias("p95"),
            q(0.99).alias("p99"),
        )
    )


def quantile_cont_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (type-7, the numpy/R-default) quantiles from the
    SAME distinct-value histogram as quantile_portable_value —
    graduating percentile_cont the way that op graduated
    percentile_disc. Rank h = (n-1)·p; the answer is
    lo + g·(hi − lo) with lo/hi the values at floor(h)/floor(h)+1 and
    g = h − floor(h). Every input to the interpolation is an exact
    histogram selection and the formula is written token-identically
    in the DuckDB oracle, so the one double expression evaluates
    bit-equal cross-engine (never rely on an engine's own
    quantile_cont: lo·(1−g)+hi·g vs lo+g·(hi−lo) differ in ulps)."""
    from pyspark.sql.window import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    hist = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("event_type")
    wcum = wt.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    sized = hist.select(
        "event_type",
        "value",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wt).alias("tot"),
    )

    def lo(frac):
        k = F.floor((F.col("tot") - 1) * F.lit(frac))
        return F.min(F.when(F.col("cum") >= k + 1, F.col("value")))

    def hi(frac):
        k = F.floor((F.col("tot") - 1) * F.lit(frac))
        return F.min(F.when(F.col("cum") >= k + 2, F.col("value")))

    FRACS = (0.5, 0.95, 0.99)
    agg = sized.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_values"),
        *[lo(f).alias(f"lo{i}") for i, f in enumerate(FRACS)],
        *[hi(f).alias(f"hi{i}") for i, f in enumerate(FRACS)],
    )

    def interp(i, frac):
        h = (F.col("n_values") - 1) * F.lit(frac)
        g = h - F.floor(h)
        lo_c, hi_c = F.col(f"lo{i}"), F.col(f"hi{i}")
        return lo_c + g * (F.coalesce(hi_c, lo_c) - lo_c)

    return agg.select(
        "event_type",
        "n_values",
        interp(0, 0.5).alias("q50"),
        interp(1, 0.95).alias("q95"),
        interp(2, 0.99).alias("q99"),
    )


QUANTILE_CONT_PORTABLE_SQL = """
WITH hist AS (
  SELECT event_type, value, COUNT(*) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, value
),
sized AS (
  SELECT event_type, value, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS tot
  FROM hist
),
agg AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n_values,
         MIN(CASE WHEN cum >= floor((tot-1) * CAST(0.5 AS DOUBLE)) + 1 THEN value END) AS lo0,
         MIN(CASE WHEN cum >= floor((tot-1) * CAST(0.5 AS DOUBLE)) + 2 THEN value END) AS hi0,
         MIN(CASE WHEN cum >= floor((tot-1) * CAST(0.95 AS DOUBLE)) + 1 THEN value END) AS lo1,
         MIN(CASE WHEN cum >= floor((tot-1) * CAST(0.95 AS DOUBLE)) + 2 THEN value END) AS hi1,
         MIN(CASE WHEN cum >= floor((tot-1) * CAST(0.99 AS DOUBLE)) + 1 THEN value END) AS lo2,
         MIN(CASE WHEN cum >= floor((tot-1) * CAST(0.99 AS DOUBLE)) + 2 THEN value END) AS hi2
  FROM sized
  GROUP BY event_type
)
SELECT event_type, n_values,
       lo0 + ((n_values-1) * CAST(0.5 AS DOUBLE)  - floor((n_values-1) * CAST(0.5 AS DOUBLE)))
             * (COALESCE(hi0, lo0) - lo0) AS q50,
       lo1 + ((n_values-1) * CAST(0.95 AS DOUBLE) - floor((n_values-1) * CAST(0.95 AS DOUBLE)))
             * (COALESCE(hi1, lo1) - lo1) AS q95,
       lo2 + ((n_values-1) * CAST(0.99 AS DOUBLE) - floor((n_values-1) * CAST(0.99 AS DOUBLE)))
             * (COALESCE(hi2, lo2) - lo2) AS q99
FROM agg
ORDER BY event_type
"""


QUANTILE_PORTABLE_SQL = """
WITH hist AS (
  SELECT event_type, value, COUNT(*) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, value
),
sized AS (
  SELECT event_type, value, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS tot
  FROM hist
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n_values,
       MIN(CASE WHEN cum >= ceil(tot * 0.5) THEN value END) AS p50,
       MIN(CASE WHEN cum >= ceil(tot * 0.95) THEN value END) AS p95,
       MIN(CASE WHEN cum >= ceil(tot * 0.99) THEN value END) AS p99
FROM sized
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Count-min sketch — frequency estimation with a PORTABLE hash family
# (h_i(u) = ((a_i·(u mod p) + b_i) mod p) mod w, p = 2³¹−1), so the
# sketch is bit-identical across engines and the DuckDB oracle checks
# the ESTIMATES exactly, not just "plausible" — rare for a sketch op.
# depth 4 × width 1024 ⇒ 16 K counters total regardless of input size;
# the counter table is groupBy (row, bucket) with full map-side combine,
# then broadcast (≤4096 rows) against the probe set. Estimates
# overcount only (est ≥ exact, ε ≈ e/w of total mass) — the unit test
# asserts both bounds; the oracle asserts exact equality.
_CM_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_CM_W = 1024
_CM_HASHES = ((1000003, 12345), (999979, 54321), (1000033, 7777), (999983, 31337))


def _cm_bucket(col: F.Column, a: int, b: int) -> F.Column:
    return ((F.lit(a) * (col % _CM_P) + F.lit(b)) % _CM_P) % _CM_W


def countmin_freq_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    u = F.col("user_id")
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _cm_bucket(u, a, b).cast("long").alias("bucket")
            )
            for i, (a, b) in enumerate(_CM_HASHES)
        ]
    )
    cm = (
        ev.select(F.explode(probes).alias("ib"))
        .select("ib.i", "ib.bucket")
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
        .limit(20)
    )
    probed = top.select("user_id", "exact_n", F.explode(probes).alias("ib")).select(
        "user_id", "exact_n", "ib.i", "ib.bucket"
    )
    return (
        probed.join(F.broadcast(cm), ["i", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("bucket_n").alias("cm_est"))
    )


_CM_HASH_VALUES = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CM_HASHES))

COUNTMIN_SQL = f"""
WITH h(i, a, b) AS (VALUES {_CM_HASH_VALUES}),
hx AS (
    SELECT e.user_id, h.i,
           ((h.a * (e.user_id % {_CM_P}) + h.b) % {_CM_P}) % {_CM_W} AS bucket
    FROM events e CROSS JOIN h
),
cm AS (
    SELECT i, bucket, COUNT(*) AS bucket_n FROM hx GROUP BY i, bucket
),
top AS (
    SELECT user_id, COUNT(*) AS exact_n
    FROM events GROUP BY user_id
    ORDER BY exact_n DESC, user_id ASC LIMIT 20
)
SELECT t.user_id, t.exact_n, MIN(c.bucket_n) AS cm_est
FROM top t
CROSS JOIN h
JOIN cm c ON c.i = h.i
         AND c.bucket = ((h.a * (t.user_id % {_CM_P}) + h.b) % {_CM_P}) % {_CM_W}
GROUP BY t.user_id, t.exact_n
ORDER BY t.exact_n DESC, t.user_id ASC
"""


# --------------------------------------------------------------------------
# Bloom-filter membership screen — the "bloom pre-filter semi-join"
# pattern: build an m-bit filter over a small key set (customers with an
# URGENT order), probe the full dimension through it, and report the
# measured false-positive rate vs the exact semi-join. Same portable
# hash family as the count-min sketch, so the bit positions — and hence
# every pass/fail decision — are engine-identical and exactly
# oracle-checked. At 100 TB the filter (m/8 bytes, here 1 KB) is the
# broadcast side; the giant probe side streams through it without a
# shuffle — the manual twin of Spark's runtime bloom-filter join.
_BF_M = 8192
_BF_HASHES = ((1000003, 999), (999979, 4242), (1000033, 90210))


def bloom_membership_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    members = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )

    def positions(col: F.Column) -> F.Column:
        return F.array(
            *[
                (((F.lit(a) * (col % _CM_P) + F.lit(b)) % _CM_P) % _BF_M).cast(
                    "long"
                )
                for a, b in _BF_HASHES
            ]
        )

    bits = members.select(
        F.explode(positions(F.col("key"))).alias("pos")
    ).distinct()
    probe = cust.select(
        "key", F.explode(positions(F.col("key"))).alias("pos")
    )
    # A probe key passes iff all k = 3 of its position rows hit a set bit
    # (duplicate positions within one key produce duplicate rows, so the
    # row count per key is always exactly 3 — sum of hits == 3 ⇔ pass).
    hits = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .withColumn("passed", (F.col("n_hits") == 3).cast("int"))
    )
    exact = members.withColumn("is_member", F.lit(1))
    return (
        hits.join(F.broadcast(exact), "key", "left")
        .agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum(F.coalesce("is_member", F.lit(0))).alias("n_members"),
            F.sum("passed").alias("n_pass"),
            F.sum(
                F.when(
                    (F.col("passed") == 1) & F.col("is_member").isNull(), 1
                ).otherwise(0)
            ).alias("n_false_pos"),
        )
        .select(
            "n_probed",
            "n_members",
            "n_pass",
            "n_false_pos",
            F.round(
                F.col("n_false_pos")
                / F.greatest(F.col("n_probed") - F.col("n_members"), F.lit(1)),
                6,
            ).alias("fp_rate"),
        )
    )


_BF_HASH_VALUES = ", ".join(f"({a}, {b})" for a, b in _BF_HASHES)

BLOOM_SQL = f"""
WITH h(a, b) AS (VALUES {_BF_HASH_VALUES}),
members AS (
    SELECT DISTINCT o_custkey AS key FROM orders
    WHERE o_orderpriority = '1-URGENT'
),
bits AS (
    SELECT DISTINCT ((h.a * (m.key % {_CM_P}) + h.b) % {_CM_P}) % {_BF_M} AS pos
    FROM members m CROSS JOIN h
),
probe AS (
    SELECT c.c_custkey AS key,
           ((h.a * (c.c_custkey % {_CM_P}) + h.b) % {_CM_P}) % {_BF_M} AS pos
    FROM customer c CROSS JOIN h
),
hits AS (
    SELECT p.key,
           CASE WHEN SUM(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) = 3
                THEN 1 ELSE 0 END AS passed
    FROM probe p LEFT JOIN bits b ON p.pos = b.pos
    GROUP BY p.key
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(SUM(CASE WHEN m.key IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_members,
       CAST(SUM(h.passed) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN h.passed = 1 AND m.key IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       ROUND(CAST(SUM(CASE WHEN h.passed = 1 AND m.key IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) /
             GREATEST(COUNT(*) - SUM(CASE WHEN m.key IS NULL THEN 0 ELSE 1 END), 1),
             6) AS fp_rate
FROM hits h LEFT JOIN members m ON h.key = m.key
"""


# --------------------------------------------------------------------------
# PORTABLE HyperLogLog (r6) — the exact-oracle twin of the native
# hll_mergeable_rollup above, the same move count-min/Bloom made for
# their families. Every step is engine-reproducible INTEGER arithmetic:
#
#   h      = affine hash of user_id (the sketch family's (a,b,p))
#   bucket = h mod m (m = 1024 registers)
#   v      = h div m (21-bit suffix)
#   rho    = trailing-zeros(v) + 1 via bit_count((v & -v) - 1) + 1
#            (P(tz >= k) = 2^-k — the same geometric observable as
#            leading zeros, cf. Flajolet-Martin; v = 0 -> rho = 22)
#
# The register table is max(rho) per (event_type, day, bucket) — the
# mergeable daily-sketch layout of the native op; the type-level
# rollup is max over days. The harmonic sum Σ 2^-rho uses exact
# power-of-two doubles (1/(1<<rho)) whose sum spans < 53 mantissa bits,
# so it is order-independent; empty registers contribute 2^0 via the
# (m - registers_used) term. Linear-counting (E <= 2.5m with empty
# registers, the standard small-range correction) needs ln(m/V) —
# libm ln is NOT cross-engine exact, so both engines read the SAME
# precomputed 1024-entry double table (Spark: literal array lookup;
# DuckDB: VALUES join). The estimate is therefore bit-identical and
# the oracle checks it exactly. Large-range correction (E > 2^32/30)
# is irrelevant at 31-bit hash width and omitted.
#
# Scale shape: three map-side-combined shuffles of at most
# |types|·|days|·m tiny rows; never the fact table.
HLL_M = 1024
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_A, _HLL_B = 999979, 54321
_HLL_MAX_RHO = 22  # suffix width 21 bits -> tz in 0..20, +1; v=0 -> 22
_HLL_LN_TABLE = [0.0] + [
    float(__import__("math").log(HLL_M / v)) for v in range(1, HLL_M + 1)
]


def _hll_estimate_col():
    """Shared HLL estimate over (s_present, registers_used) columns:
    raw harmonic estimate with the linear-counting small-range
    correction read from the precomputed ln table (cross-engine
    bit-identical — see the family docstring above)."""
    sm = (F.lit(float(HLL_M)) - F.col("registers_used")) + F.col("s_present")
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / sm
    v_empty = F.lit(HLL_M) - F.col("registers_used")
    ln_arr = F.array(*[F.lit(x) for x in _HLL_LN_TABLE])
    linear = F.lit(float(HLL_M)) * F.element_at(ln_arr, v_empty + 1)
    return F.when(
        (v_empty > 0) & (e_raw <= F.lit(2.5 * HLL_M)), linear
    ).otherwise(e_raw)


def _hll_registers_of(events: DataFrame) -> DataFrame:
    """(event_type, day, bucket, rho) partial registers of ANY event
    frame — max-mergeable across frames/batches (used by the batch
    daily table AND streaming/hll.py's per-micro-batch partials)."""
    u = F.col("user_id")
    h = (F.lit(_HLL_A) * F.pmod(u, F.lit(_CM_P)) + F.lit(_HLL_B)) % F.lit(_CM_P)
    bucket = F.pmod(h, F.lit(HLL_M))
    v = ((h - bucket) / F.lit(HLL_M)).cast("long")
    rho = F.when(v == 0, F.lit(_HLL_MAX_RHO)).otherwise(
        F.bit_count(v.bitwiseAND(-v) - 1) + 1
    )
    return (
        events.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def _hll_daily_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily register table of the warehouse events — the ONLY
    fact-scale pass any HLL op makes."""
    return _hll_registers_of(load_table(spark, sf_dir, "events"))


def _hll_rollup_from_daily(daily: DataFrame) -> DataFrame:
    """Type-level NDV estimates from a (type, day, bucket, rho) daily
    register frame — shared by the batch rollup and the streaming
    store's read view."""
    typed = daily.groupBy("event_type", "bucket").agg(F.max("rho").alias("rho"))
    per_type = typed.groupBy("event_type").agg(
        F.sum(F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), rho)")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).cast("int").alias("registers_used"),
    )
    return per_type.select(
        "event_type",
        F.round(_hll_estimate_col(), 4).alias("n_users_hll"),
        "registers_used",
    )


def hll_portable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hll_rollup_from_daily(_hll_daily_registers(spark, sf_dir))


def hll_sliding_window_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct users per (event_type, day) by MERGING
    the daily HLL registers — the sketch-mergeability payoff: the fact
    table is scanned once (the shared daily-register pass); every
    window estimate after that is a max-merge over at most
    7·m tiny register rows via a band join on the day spine. At 100 TB
    you never re-count a window — you merge the already-materialized
    daily sketches, which is why the sketch family exists. Same
    portable hash, ln table, and small-range correction as the
    rollup, so the DuckDB oracle checks the estimates exactly."""
    daily = _hll_daily_registers(spark, sf_dir)
    spine = daily.select("event_type", "day").distinct()
    d = daily.select(
        F.col("event_type").alias("t"),
        F.col("day").alias("d"),
        "bucket",
        "rho",
    )
    win = (
        spine.join(
            d,
            (F.col("t") == F.col("event_type"))
            & (F.col("d") <= F.col("day"))
            & (F.col("d") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    per = win.groupBy("event_type", "day").agg(
        F.sum(F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), rho)")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).cast("int").alias("registers_used"),
    )
    return per.select(
        "event_type",
        "day",
        F.round(_hll_estimate_col(), 4).alias("n_users_hll_7d"),
        "registers_used",
    )


_HLL_LN_VALUES = ", ".join(
    f"({v}, {_HLL_LN_TABLE[v]!r})" for v in range(0, HLL_M + 1)
)

HLL_PORTABLE_SQL = f"""
WITH hx AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         (({_HLL_A} * (user_id % {_CM_P}) + {_HLL_B}) % {_CM_P}) AS h
  FROM events
),
reg AS (
  SELECT event_type, day, h % {HLL_M} AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {_HLL_MAX_RHO}
              ELSE bit_count(((h // {HLL_M}) & -(h // {HLL_M})) - 1) + 1
         END AS rho
  FROM hx
),
daily AS (
  SELECT event_type, day, bucket, MAX(rho) AS rho
  FROM reg GROUP BY event_type, day, bucket
),
typed AS (
  SELECT event_type, bucket, MAX(rho) AS rho
  FROM daily GROUP BY event_type, bucket
),
per_type AS (
  SELECT event_type,
         SUM(1.0 / (CAST(1 AS BIGINT) << rho)) AS s_present,
         CAST(COUNT(*) AS INTEGER) AS registers_used
  FROM typed GROUP BY event_type
),
lnt(v, lnv) AS (VALUES {_HLL_LN_VALUES})
SELECT p.event_type,
       round(CASE WHEN ({HLL_M} - p.registers_used) > 0
                   AND ({HLL_ALPHA * HLL_M * HLL_M!r}
                        / (({HLL_M}.0 - p.registers_used) + p.s_present))
                       <= {2.5 * HLL_M}
                  THEN {HLL_M}.0 * l.lnv
                  ELSE {HLL_ALPHA * HLL_M * HLL_M!r}
                       / (({HLL_M}.0 - p.registers_used) + p.s_present)
             END, 4) AS n_users_hll,
       p.registers_used
FROM per_type p
JOIN lnt l ON l.v = {HLL_M} - p.registers_used
ORDER BY p.event_type
"""


HLL_SLIDING_SQL = f"""
WITH hx AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         (({_HLL_A} * (user_id % {_CM_P}) + {_HLL_B}) % {_CM_P}) AS h
  FROM events
),
reg AS (
  SELECT event_type, day, h % {HLL_M} AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {_HLL_MAX_RHO}
              ELSE bit_count(((h // {HLL_M}) & -(h // {HLL_M})) - 1) + 1
         END AS rho
  FROM hx
),
daily AS (
  SELECT event_type, day, bucket, MAX(rho) AS rho
  FROM reg GROUP BY event_type, day, bucket
),
spine AS (SELECT DISTINCT event_type, day FROM daily),
win AS (
  SELECT s.event_type, s.day, d.bucket, MAX(d.rho) AS rho
  FROM spine s JOIN daily d
    ON d.event_type = s.event_type
   AND d.day <= s.day
   AND d.day >= s.day - INTERVAL 6 DAY
  GROUP BY s.event_type, s.day, d.bucket
),
per AS (
  SELECT event_type, day,
         SUM(1.0 / (CAST(1 AS BIGINT) << rho)) AS s_present,
         CAST(COUNT(*) AS INTEGER) AS registers_used
  FROM win GROUP BY event_type, day
),
lnt(v, lnv) AS (VALUES {_HLL_LN_VALUES})
SELECT p.event_type, p.day,
       round(CASE WHEN ({HLL_M} - p.registers_used) > 0
                   AND ({HLL_ALPHA * HLL_M * HLL_M!r}
                        / (({HLL_M}.0 - p.registers_used) + p.s_present))
                       <= {2.5 * HLL_M}
                  THEN {HLL_M}.0 * l.lnv
                  ELSE {HLL_ALPHA * HLL_M * HLL_M!r}
                       / (({HLL_M}.0 - p.registers_used) + p.s_present)
             END, 4) AS n_users_hll_7d,
       p.registers_used
FROM per p
JOIN lnt l ON l.v = {HLL_M} - p.registers_used
ORDER BY p.event_type, p.day
"""


QUERIES = {
    "ndv_exact_users_per_type": ndv_exact_users_per_type,
    "ndv_approx_users_per_type": ndv_approx_users_per_type,
    "hll_mergeable_rollup": hll_mergeable_rollup,
    "hll_portable_rollup": hll_portable_rollup,
    "hll_sliding_window_ndv": hll_sliding_window_ndv,
    "freq_topk_users": freq_topk_users,
    "quantile_summary": quantile_summary,
    "quantile_approx_value": quantile_approx_value,
    "quantile_portable_value": quantile_portable_value,
    "quantile_cont_portable": quantile_cont_portable,
    "countmin_freq_estimate": countmin_freq_estimate,
    "bloom_membership_report": bloom_membership_report,
}

ORACLES = {
    "ndv_exact_users_per_type": NDV_EXACT_SQL,
    "hll_portable_rollup": HLL_PORTABLE_SQL,
    "hll_sliding_window_ndv": HLL_SLIDING_SQL,
    "freq_topk_users": FREQ_TOPK_SQL,
    "quantile_summary": QUANTILE_SQL,
    "quantile_portable_value": QUANTILE_PORTABLE_SQL,
    "quantile_cont_portable": QUANTILE_CONT_PORTABLE_SQL,
    "countmin_freq_estimate": COUNTMIN_SQL,
    "bloom_membership_report": BLOOM_SQL,
}
