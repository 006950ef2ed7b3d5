"""Layout-payoff measurement (VERDICT r5 item 9).

Writes the events table in three physical layouts — `plain` (hash
round-robin), `time_sorted` (range-partitioned + sorted on time, the
classic single-column clustering), `zorder` (Morton-clustered on
time × user, sources/zorder.py) — then evaluates two predicates
against each:

  - `time_and_user`: a 25%-of-span time window AND a 5%-of-span
    user_id slice (the dashboard/debug query z-ordering exists for);
  - `user_only`: the 5% user slice alone (the case single-column time
    clustering cannot prune at all).

For each (layout, predicate) it reports how many files / row groups a
footer-stats reader must touch (computed from the actual parquet
row-group min/max via pyarrow — the same statistics Spark's scan uses
for row-group skipping) plus a timed Spark scan. The skip ratios are
the z-order component's earn-its-place evidence; bench.py records the
table in BENCH_DETAIL.json under "layout_skip".

Row groups with absent stats count as must-read (a pruning reader
cannot skip what it cannot bound).
"""

from __future__ import annotations

import glob
import os
import statistics
import time

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_FILES = 16
REPS = 3


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orionld_to_hive_spark.sources.warehouse import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("t_us"), "user_id", "value"
    )


def _build_layouts(spark: SparkSession, sf_dir: str, root: str) -> dict[str, str]:
    from orionld_to_hive_spark.sources.zorder import zorder_write

    ev = _events(spark, sf_dir)
    paths = {
        "plain": os.path.join(root, "plain"),
        "time_sorted": os.path.join(root, "time_sorted"),
        "zorder": os.path.join(root, "zorder"),
    }
    if not os.path.isdir(paths["plain"]):
        ev.repartition(N_FILES).write.mode("overwrite").parquet(paths["plain"])
    if not os.path.isdir(paths["time_sorted"]):
        (
            ev.repartitionByRange(N_FILES, "t_us")
            .sortWithinPartitions("t_us")
            .write.mode("overwrite")
            .parquet(paths["time_sorted"])
        )
    if not os.path.isdir(paths["zorder"]):
        zorder_write(ev, paths["zorder"], "t_us", "user_id", N_FILES)
    return paths


def _row_groups(path: str, cols: set[str]):
    """(file, rg_index, {col: (min, max)}) for every row group."""
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = {}
            for j in range(rg.num_columns):
                c = rg.column(j)
                if (
                    c.path_in_schema in cols
                    and c.statistics is not None
                    and c.statistics.has_min_max
                ):
                    # without has_min_max the stats object stores
                    # (None, None) and the skip predicate would raise
                    st[c.path_in_schema] = (c.statistics.min, c.statistics.max)
            out.append((f, g, st))
    return out


def _must_read(st: dict, col: str, lo, hi) -> bool:
    if col not in st:
        return True  # no stats — cannot skip
    mn, mx = st[col]
    return not (mx < lo or mn > hi)


def layout_skip_report(
    spark: SparkSession, sf_dir: str, root: str, reps: int = REPS
) -> dict:
    os.makedirs(root, exist_ok=True)
    paths = _build_layouts(spark, sf_dir, root)
    b = (
        _events(spark, sf_dir)
        .agg(
            F.min("t_us").alias("t0"),
            F.max("t_us").alias("t1"),
            F.min("user_id").alias("u0"),
            F.max("user_id").alias("u1"),
        )
        .collect()[0]
    )
    t_span, u_span = b.t1 - b.t0, b.u1 - b.u0
    t_lo, t_hi = b.t0 + int(0.40 * t_span), b.t0 + int(0.65 * t_span)
    u_lo, u_hi = b.u0 + int(0.50 * u_span), b.u0 + int(0.55 * u_span)
    predicates = {
        "time_and_user": [("t_us", t_lo, t_hi), ("user_id", u_lo, u_hi)],
        "user_only": [("user_id", u_lo, u_hi)],
    }

    report: dict[str, dict] = {}
    for lname, path in paths.items():
        rgs = _row_groups(path, {"t_us", "user_id"})
        files = {f for f, _, _ in rgs}
        lrep: dict[str, dict] = {
            "total_files": len(files),
            "total_row_groups": len(rgs),
        }
        for pname, conds in predicates.items():
            needed = [
                (f, g)
                for f, g, st in rgs
                if all(_must_read(st, c, lo, hi) for c, lo, hi in conds)
            ]
            need_files = len({f for f, _ in needed})
            cond = None
            for c, lo, hi in conds:
                term = F.col(c).between(F.lit(lo), F.lit(hi))
                cond = term if cond is None else (cond & term)
            df = spark.read.parquet(path).filter(cond)
            df.count()  # warm
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df.count()
                times.append(time.perf_counter() - t0)
            lrep[pname] = {
                "files_needed": need_files,
                "row_groups_needed": len(needed),
                "file_skip_ratio": round(1 - need_files / len(files), 3),
                "rg_skip_ratio": round(1 - len(needed) / len(rgs), 3),
                "scan_mean_s": round(statistics.mean(times), 4),
            }
        report[lname] = lrep
    return report


if __name__ == "__main__":
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from orionld_to_hive_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".ladder",
        f"layouts-{os.path.basename(sf.rstrip('/'))}",
    )
    spark = get_spark(app_name="layoutstats")
    print(json.dumps(layout_skip_report(spark, sf, out_root), indent=1))
