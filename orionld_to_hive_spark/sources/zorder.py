"""Z-order (Morton) clustering: multi-dimensional data skipping.

Sorting a table by `ts` makes parquet min/max row-group stats selective
for time predicates but useless for a second dimension (every file
spans the full `user_id` range). Interleaving the bits of BOTH
dimensions into one Morton key and range-partitioning on it gives
every file a bounded rectangle in (ts, user_id) space — predicates on
EITHER dimension skip most files. This is the standard lakehouse
layout technique for 100 TB fact tables queried along more than one
axis; here it is pure built-in bit arithmetic (whole-stage codegen,
no UDF).

The key is coarse by design: each dimension is scaled to `bits`-bit
rank space using its global min/max (one tiny aggregate — 4 scalars to
the driver). Ties within a bucket are irrelevant — clustering quality,
not ordering semantics, is the goal; queries never see the key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY = "__zkey"


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two `bits`-bit non-negative longs: result bit
    2i holds a's bit i, bit 2i+1 holds b's bit i."""
    parts = [
        F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def with_zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """Append the Morton key over two numeric columns (min/max-scaled
    to `bits`-bit rank space)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    top = (1 << bits) - 1

    def bucket(col: str, lo, hi) -> Column:
        span = F.lit(float(hi) - float(lo)) if hi != lo else F.lit(1.0)
        return (
            ((F.col(col).cast("double") - F.lit(float(lo))) / span * top)
            .cast("long")
        )

    return df.withColumn(
        ZKEY, _interleave(bucket(col_a, lo_a, hi_a), bucket(col_b, lo_b, hi_b), bits)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write `df` as `n_files` parquet files clustered in Z-order on
    (col_a, col_b): range-partition + sort on the Morton key, then drop
    it — the layout, not the key, is the product."""
    keyed = with_zorder_key(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, ZKEY)
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
