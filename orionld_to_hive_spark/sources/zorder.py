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

Determinism (r6): `repartitionByRange` picks its range bounds by
RESERVOIR SAMPLING, so two runs over the same data can produce
different file boundaries — which made per-file min/max spans (and a
layout-quality test asserting on them) flaky. The write now derives
its cut points deterministically: a fixed-width histogram of the
Morton key (bounded at `_HIST_CELLS` cells — driver state is O(4096)
regardless of data size, so the move is 100 TB-safe), cumulated on the
driver, cell boundaries nearest the file-count quantiles become the
cuts. Rows are routed to their file by a row-local searchsorted over
the broadcast cut array, then shuffled straight to their target
partition via precomputed hash tokens (ints whose murmur3 hash lands
on each partition id exactly) — no sampling anywhere in the plan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZKEY = "__zkey"

# Histogram resolution for deterministic cut-point estimation. 4096
# cells bound both the driver collect AND the cut-point quantization
# error (file sizes balanced to ~1/4096 of the key domain's occupancy).
_HIST_CELLS = 4096


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


def _zkey_cutpoints(keyed: DataFrame, n_files: int, bits: int) -> list[int]:
    """Deterministic ~equi-depth cut points for the Morton key.

    One aggregation pass: floor-divide the key into `_HIST_CELLS`
    fixed-width cells, count per cell (≤ 4096 rows to the driver —
    bounded, not data-proportional), cumulate, and take the cell upper
    boundary nearest each i/n_files quantile. Integer counts + integer
    boundaries ⇒ bit-identical across runs."""
    domain = 1 << (2 * bits)
    cell_w = max(1, domain // _HIST_CELLS)
    hist = dict(
        keyed.groupBy((F.col(ZKEY) / cell_w).cast("long").alias("cell"))
        .count()
        .collect()
    )
    total = sum(hist.values())
    cuts: list[int] = []
    running = 0
    targets = [total * i // n_files for i in range(1, n_files)]
    ti = 0
    for cell in sorted(hist):
        running += hist[cell]
        while ti < len(targets) and running >= targets[ti]:
            cuts.append((cell + 1) * cell_w)  # exclusive upper bound
            ti += 1
    # dedupe (heavy cells can satisfy several quantiles) — fewer, larger
    # files are an acceptable degradation for pathological key skew
    out: list[int] = []
    for c in cuts:
        if not out or c != out[-1]:
            out.append(c)
    return out


def _partition_tokens(spark: SparkSession, n: int) -> list[int]:
    """n ints t_0..t_{n-1} with pmod(murmur3(t_p), n) == p.

    Lets `repartition(n, token_col)` place each file group in its own
    shuffle partition deterministically (plain fid hashing could
    collide two groups into one partition and leave another empty).
    Found by probing Spark's own hash over a tiny local range — no RNG,
    same result every run."""
    cand = (
        spark.range(0, 64 * n)
        .select(
            F.col("id").cast("int").alias("c"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
        )
        .collect()
    )
    tokens: dict[int, int] = {}
    for r in cand:
        tokens.setdefault(r.p, r.c)
    missing = [p for p in range(n) if p not in tokens]
    if missing:  # pragma: no cover — P(miss) < 1e-100 at 64n probes
        raise RuntimeError(f"no hash token found for partitions {missing}")
    return [tokens[p] for p in range(n)]


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write `df` as (up to) `n_files` parquet files clustered in
    Z-order on (col_a, col_b): deterministic ~equi-depth cut points on
    the Morton key, row-local file assignment, token-routed shuffle,
    sort within each file, then drop the key — the layout, not the
    key, is the product."""
    keyed = with_zorder_key(df, col_a, col_b, bits)
    cuts = _zkey_cutpoints(keyed, n_files, bits)
    n_parts = len(cuts) + 1
    tokens = _partition_tokens(df.sparkSession, n_parts)
    if cuts:
        fid = F.size(
            F.filter(
                F.array(*[F.lit(c) for c in cuts]), lambda c: c <= F.col(ZKEY)
            )
        )
    else:  # degenerate: all keys in one cell → single file
        fid = F.lit(0)
    tok = F.element_at(
        F.array(*[F.lit(t) for t in tokens]), fid + F.lit(1)
    ).cast("int")
    (
        keyed.withColumn("__ztok", tok)
        .repartition(n_parts, F.col("__ztok"))
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY, "__ztok")
        .write.mode("overwrite")
        .parquet(path)
    )
