"""Full-registry driver-fidelity sweep: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB at one sf, compare rows / columns /
exact values, AND flag integer-width mismatches between the two engines
(the driver's value hash is width-sensitive — r1 lesson: DuckDB HUGEINT
vs Spark BIGINT hash-failed despite equal values).

Usage: python tools/sweep.py [sf_dir] [--only name1,name2,...]
(default sf_dir /root/testdata/sf0.01; --only restricts to the named
queries for fast iteration). Prints one line per query; exits nonzero
if any strict failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import pandas as pd

from oracle_diff import compare, duckdb_run
from orionld_to_hive_spark import registry
from orionld_to_hive_spark.session import get_spark


def int_width_mismatches(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    out = []
    for c in spark_df.columns:
        if c not in oracle_df.columns:
            continue
        s, o = spark_df[c].dtype, oracle_df[c].dtype
        s_int = pd.api.types.is_integer_dtype(s)
        o_int = pd.api.types.is_integer_dtype(o)
        if s_int != o_int or (s_int and o_int and s.itemsize != o.itemsize):
            out.append(f"{c}:{s}!={o}")
    return out


def main() -> None:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark(app_name="sweep")
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    if only is not None:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"--only names not in registry: {sorted(unknown)}")
        queries = {n: f for n, f in queries.items() if n in only}
    n_pass = n_noracle = 0
    failures: list[str] = []
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            sdf = df.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {e}", flush=True)
            continue
        if name not in oracles:
            n_noracle += 1
            print(f"NOORA {name}: rows={len(sdf)}", flush=True)
            continue
        try:
            odf = duckdb_run(oracles[name], sf_dir)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error {e}", flush=True)
            continue
        cached = type("_W", (), {"toPandas": lambda self: sdf})()
        problems = compare(cached, odf)
        widths = int_width_mismatches(sdf, odf)
        if not problems and not widths:
            n_pass += 1
            print(f"PASS  {name}: rows={len(sdf)}", flush=True)
        else:
            failures.append(name)
            print(f"FAIL  {name}: {problems} widths={widths}", flush=True)
    print(
        f"SWEEP pass={n_pass} no_oracle={n_noracle} fail={len(failures)} "
        f"of {len(queries)} :: {failures}",
        flush=True,
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
