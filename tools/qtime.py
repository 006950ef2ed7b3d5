"""Quick focused query timing for optimization A/Bs.

Usage: python tools/qtime.py name1,name2,... [sf_dir] [reps]
Prints one line per query: name, warmup, mean, median of collect()-timed
reps — the bench methodology, minus ladders/canaries, for back-to-back
before/after brackets on the same host.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orionld_to_hive_spark import registry
from orionld_to_hive_spark.session import get_spark


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark(app_name="qtime")
    qs = registry.all_queries()
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name:42s} warm={warm:6.3f} mean={statistics.mean(ts):6.3f} "
            f"median={statistics.median(ts):6.3f} min={min(ts):6.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
