"""Cross-engine-deterministic numeric aggregates.

Floating-point SUM/AVG are order-dependent: Spark's partial aggregation
tree and DuckDB's differ, so the last ulps of a double sum drift between
engines and an exact value-hash comparison flaps. The fix (SURVEY.md §7
"hard parts" #3) is to make the reduction exact: cast each input to a
fixed-scale DECIMAL first — decimal addition is exact and associative,
so any summation order yields bit-identical results — then cast the
final sum back to DOUBLE (one deterministic conversion).

AVG is derived as exact-decimal-sum / count in DOUBLE arithmetic, which
is a single IEEE-754 division — identical on any engine.

The same convention must be used in the oracle SQL:
    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)
At 100 TB this costs nothing extra: decimal(27,6) sums stay in Spark's
partial-agg path (map-side combine) exactly like double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 27 digits / 6 decimal places holds ~1e21 — comfortably above any sum the
# testdata or a 100 TB fact table of O(1e4)-magnitude measures can reach.
DECIMAL_T = "decimal(27,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over doubles, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_T)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG over doubles, returned as DOUBLE.

    exact_decimal_sum / count — one deterministic double division.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_T)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    """Oracle-side (ANSI/DuckDB) twin of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """Oracle-side (ANSI/DuckDB) twin of davg()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr})"
