"""A/B: trailing_hour_stats RANGE frame vs a two-level hour-bucket
rewrite (VERDICT r8 item 4 — the steepest headline scaler, exp_10x
0.961).

The alternative decomposes the trailing [t-1h, t] frame into (a) a
GROWING range prefix within the row's own hour bucket and (b) the
suffix of the previous bucket, obtained by union-tagging a probe row
at t-1h into bucket b-1 and subtracting its prefix from the bucket
total — two cheap incremental frames instead of a sliding one.
Correctness is asserted against the production query before timing.

Run exclusively (nothing else on the box):
    python tools/ab_trailing_hour.py [reps=15] [sf_dir=/root/testdata/sf0.1]

Finding (2026-08-15, pinned in PLANS.md): the events corpus averages
~1.05 events per user-hour (max 4), so the sliding RANGE frame holds
1-2 rows — Spark's per-row frame work is already O(1), and the
query's cost is OUTPUT-BOUND (one result row per event; that is where
the ~linear exponent comes from, and no plan shape can beat
output-linear). The rewrite doubles the windowed row count and adds a
groupBy shuffle; measured interleaved medians: sf0.01 0.283 vs 0.642 s
(2.3x slower), sf0.1 1.056 vs 1.456 s (1.4x slower). Keep the RANGE
frame.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orionld_to_hive_spark.functions.numeric import DECIMAL_T
from orionld_to_hive_spark.operators.windows import (
    _events,
    trailing_hour_stats,
)
from orionld_to_hive_spark.session import get_spark

H = 3_600_000_000  # one hour in microseconds


def trailing_hour_two_level(spark, sf_dir):
    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    dec = F.col("value").cast(DECIMAL_T)
    zero = F.lit(0).cast(DECIMAL_T)
    # sort key folds the probe-before-data tie rule into one numeric
    # RANGE key: data key = 2t+1, probe key = 2(t-1h) — a probe's
    # growing frame admits exactly the data rows with ts < t-1h, which
    # subtracted from the bucket total gives the inclusive suffix.
    data = ev.select(
        "user_id", "event_id", "ts",
        (us * 2 + 1).alias("key"),
        F.floor(us / H).alias("b"),
        dec.alias("v"),
        F.lit(1).alias("tag"),
    )
    probes = ev.select(
        "user_id", "event_id", "ts",
        ((us - H) * 2).alias("key"),
        F.floor((us - H) / H).alias("b"),
        F.lit(None).cast(DECIMAL_T).alias("v"),
        F.lit(0).alias("tag"),
    )
    u = data.unionAll(probes)
    w_run = (
        W.partitionBy("user_id", "b")
        .orderBy("key")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy("user_id", "b")
    r = u.select(
        "event_id", "user_id", "ts", "tag",
        F.count("v").over(w_run).alias("c_run"),
        F.sum("v").over(w_run).alias("s_run"),
        F.count("v").over(w_all).alias("c_tot"),
        F.sum("v").over(w_all).alias("s_tot"),
    )
    is_data = F.col("tag") == 1
    contrib = r.select(
        "event_id", "user_id", "ts",
        F.when(is_data, F.col("c_run"))
        .otherwise(F.col("c_tot") - F.col("c_run")).alias("c"),
        F.when(is_data, F.coalesce(F.col("s_run"), zero))
        .otherwise(
            F.coalesce(F.col("s_tot"), zero)
            - F.coalesce(F.col("s_run"), zero)
        ).alias("s"),
    )
    return contrib.groupBy("user_id", "event_id", "ts").agg(
        F.sum("c").alias("n_last_hour"),
        F.sum("s").cast("double").alias("sum_last_hour"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark()

    a_rows = sorted(
        tuple(r) for r in trailing_hour_stats(spark, sf_dir).collect()
    )
    b_rows = sorted(
        tuple(r) for r in trailing_hour_two_level(spark, sf_dir).collect()
    )
    assert a_rows == b_rows, "two-level rewrite is NOT equivalent"
    print(f"equivalence OK over {len(a_rows)} rows at {sf_dir}")

    times: dict[str, list[float]] = {"range": [], "two_level": []}
    for _ in range(reps):  # interleaved to null out drift
        for name, fn in (
            ("range", trailing_hour_stats),
            ("two_level", trailing_hour_two_level),
        ):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}s "
            f"mean {statistics.mean(ts):.3f}s ± "
            f"{statistics.stdev(ts):.3f} over {reps} reps"
        )


if __name__ == "__main__":
    main()
