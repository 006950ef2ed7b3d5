"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
floats compared exactly — the exact-decimal aggregate convention in
functions/numeric.py is what makes exact float equality achievable).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int32/int64 for compare
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )
    return df


def _kind(dtype) -> str:
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return "other"


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions; empty == pass."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    # Driver-hash proxy: int-vs-float dtype-kind mismatch is fatal to the
    # driver's value hash even when values are numerically equal. The
    # classic cause: a bare integer SUM in the DuckDB oracle returns
    # HUGEINT, which fetchdf() renders as float64, while Spark emits
    # bigint (r1: tpch_q12, sessionize_events). Fix the oracle with
    # CAST(... AS BIGINT), never by loosening this check.
    for c in sp.columns:
        if c in oracle_df.columns:
            ks, ko = _kind(sp[c].dtype), _kind(oracle_df[c].dtype)
            if {ks, ko} == {"int", "float"}:
                problems.append(
                    f"column {c}: dtype kind mismatch spark={sp[c].dtype} "
                    f"oracle={oracle_df[c].dtype} (driver hash would fail; "
                    f"likely HUGEINT from bare integer SUM — cast the oracle)"
                )
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"row count differ: spark={len(sp)} oracle={len(oracle_df)}")
    a, b = _normalize(sp), _normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                bad = 0
                for x, y in zip(av, bv):
                    if (math.isnan(x) and math.isnan(y)) or x == y:
                        continue
                    bad += 1
                if bad:
                    problems.append(f"column {c}: {bad} value mismatches (exact float)")
            else:
                neq = (a[c] != b[c]).sum()
                if neq:
                    ex = [
                        (x, y)
                        for x, y in zip(a[c].head(2000), b[c].head(2000))
                        if x != y
                    ][:3]
                    problems.append(f"column {c}: {neq} mismatches, e.g. {ex}")
    return problems
