"""Driver-fidelity smoke drive: run the full `__spark_entry__` contract
(entry + every queries() entry) on a VANILLA SparkSession — Spark 4
defaults: ANSI on, session tz = JVM tz — exactly like the round driver
does, as opposed to the tuned session factory the tests use.

Usage: python tools/drive.py [sf_dir]     (default /root/testdata/sf0.001)
Prints one line per failure; exit code = number of failures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    n = len(e.entry(spark).collect())
    print(f"entry rows: {n}")
    assert n >= 0

    qs, oracles = e.queries(), e.oracle_sql()
    missing = set(oracles) - set(qs)
    if missing:
        print(f"oracle_sql keys without queries(): {sorted(missing)}")
        return 1

    failures = []
    for name, fn in sorted(qs.items()):
        try:
            fn(spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — report every query's failure
            failures.append(name)
            print(f"FAIL {name}: {str(ex)[:200]}")
    print(
        f"drive: {len(qs)} queries, {len(oracles)} oracles, "
        f"{len(failures)} failures at {sf_dir}"
    )
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())
