"""Similarity search over the `embeddings` table (array<float> column).

Beyond-reference capability (north-star: ANN for a training-data
pipeline). Two paths:

  - brute-force top-k: broadcast the (small) query set against the full
    corpus, exact cosine, per-query top-k via window. This is the
    correctness baseline AND the right plan when |queries| is small —
    one scan, no shuffle of the corpus, local top-k per partition.
  - LSH-bucketed top-k: 16-bit random-hyperplane signatures computed by
    a vectorized Pandas UDF (one numpy matmul per Arrow batch), bucket
    equi-join, cosine only within buckets. Sub-linear candidate cost at
    100 TB; approximate ⇒ rows-only check (no SQL oracle).

  - threshold near-dup pairs: exact all-pairs ≥ 0.4 (data-appropriate
    cut for the synthetic corpus). At scale the LSH path bounds the
    pair generation; here the exact join is the oracle-checkable op.

Cosine determinism: strict left-fold in DOUBLE on both engines (see
functions/vectors.py) ⇒ bit-identical values, so even `round(x, 6)`
outputs hash-match.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from orionld_to_hive_spark.functions.vectors import as_double, cosine
from orionld_to_hive_spark.sources.warehouse import load_table, table_rows

N_QUERIES = 10  # query set = vec_id < 10
TOP_K = 5
NEARDUP_COS = 0.4
# Hyperplane count sizes the bucket grid: ~n/2^bits vectors per bucket.
# 6 bits → ~8 candidates/bucket on the 500-vector testdata; a 100 TB
# corpus would raise this (and multiprobe) to keep buckets ~O(1000).
LSH_BITS = 6
LSH_SEED = 7
EMBED_DIM = 64

# r14 measured-and-REJECTED: routing cosine/dot/norm2/_l2sq through
# statically unrolled 64-term codegen Add chains (bit-identical op
# order, per-row fold fallback off-dim — see vectors.dot_fixed). The
# interleaved A/B measured 0.39× on the bruteforce top-k and blew
# embedding_neardup_pairs from ~0.5 s to ~32 s: three unrolled chains
# per cosine ≈ 600 expression nodes, and the generated code path is
# SLOWER than the interpreted fold at this dimension (guarded med
# 3.66 s vs fold 3.64, unguarded 2.18 — never better, often worse),
# while at sf0.1 the scoring stages are job-overhead-bound anyway.
# The folds stay; bulk scoring at scale belongs to the Arrow/numpy
# kernels (_assign_fast/_bucketed, cluster_pairs), not to wider
# Catalyst expressions.


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "embeddings")
    return df.select("vec_id", as_double(F.col("embedding")).alias("vec"), "label")


# --------------------------------------------------------------------------
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id<10)."""
    return _bruteforce_topk(_emb(spark, sf_dir))


def _bruteforce_topk(emb: DataFrame) -> DataFrame:
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    pairs = F.broadcast(queries).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("nv"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("nv")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos")
        )
    )


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q.qv)+1),
                  i -> q.qv[i] * e.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
            * sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x))))
           AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# Hard ceiling for the exact all-pairs oracle baseline below. 1e6 rows
# → ≤5e11 candidate pairs, already days of compute; anything bigger is
# certainly a mistake (use the LSH sibling).
_NEARDUP_EXACT_MAX_ROWS = 1_000_000


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """=== EXACT O(n²) ORACLE BASELINE — NOT FOR PRODUCTION SCALE ===

    Exact all-pairs cosine >= threshold (embedding near-dup dedup).
    This is the sf-scale correctness baseline that `embedding_neardup_lsh`
    is verified against; it cross-joins the corpus with itself, so cost
    grows quadratically and it MUST NOT be pointed at a large corpus.
    A row-count guard refuses inputs above _NEARDUP_EXACT_MAX_ROWS
    (1,000,000) — at any real scale call `embedding_neardup_lsh`, which
    returns the identical result through a banded equi-join plan."""
    emb = _emb(spark, sf_dir)
    n = emb.count()
    if n > _NEARDUP_EXACT_MAX_ROWS:
        raise ValueError(
            f"embedding_neardup_pairs is the exact O(n^2) oracle baseline "
            f"({n:,} rows > guard {_NEARDUP_EXACT_MAX_ROWS:,}); "
            f"use embedding_neardup_lsh for production-scale corpora"
        )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= NEARDUP_COS)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )


EMBEDDING_NEARDUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(
         list_sum(list_transform(range(1, len(a.embedding)+1),
                  i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x*x)))
            * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x*x)))),
         6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
               i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x*x)))
         * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x*x))))
      >= {NEARDUP_COS}
"""


# --------------------------------------------------------------------------
# LSH path (r6: graduated from rows-only to an EXACT DuckDB oracle):
# sign-random-projection with RADEMACHER (±1) hyperplanes instead of
# seeded Gaussians.  The ±1 entries come from a portable affine hash of
# the (bit, dim) index — plain integer arithmetic both engines (and the
# reader of the oracle SQL) reproduce bit-for-bit, the same move that
# graduated dedup_simhash / count-min / Bloom.  Rademacher projections
# are a valid cosine-LSH family (Achlioptas 2003 — database-friendly
# random projections), so the bucketing quality argument is unchanged.
#
# Exactness of the SIGN: the projection is computed over
# floor(v_i * 1e6) in INT64 — float→double widening, one IEEE multiply
# and floor are bit-identical everywhere, and the integer dot product
# is order-independent — so bucket ids (and therefore the whole
# approximate result) are engine-exact, never "within float noise".
_LSH_HASH_P = 2147483647  # 2^31 - 1, shared with the sketch family
# The multiplier must be large enough that a·k WRAPS mod p for the
# index range k < LSH_BITS·EMBED_DIM. r7 found the original a=1000003
# never wrapped (a·384 ≈ 3.8e8 < p), so the "hash" reduced to the
# parity of an un-wrapped linear function — which depends only on
# parity(i), making ALL SIX sign rows identical: six copies of one
# hyperplane, every corpus (even isotropic) collapsing to the two
# codes {0, 63}. With the classic LCG multiplier the product wraps
# ~200× across the range and the rows decorrelate (pinned by unit).
_LSH_HASH_A, _LSH_HASH_B = 1103515245, 12345
_LSH_QUANT = 1_000_000


def _lsh_signs(table: int = 0) -> list[list[int]]:
    """Rademacher sign rows for one LSH table. Table 0 keeps the
    r7-pinned parity-LCG planes bit-for-bit (oracle-certified queries
    depend on them). Tables ≥ 1 (the multi-table recall knob, r10)
    draw sha256 parities instead: the LCG parity family has deep
    linear structure — measured pairwise |dot| up to 52/64 within
    table 0 and EXACT row collisions at some cross-table offsets —
    which would make "independent" tables probe near-identical cuts.
    sha rows measure max |dot| 24/64 among themselves and against
    table 0. The choice of generator is driver-side only: the sign
    values are INLINED into the DuckDB twin as a VALUES list, so
    exactness of the oracle never depends on reproducing the hash in
    SQL."""
    if table == 0:
        return [
            [
                1
                if ((_LSH_HASH_A * (b * EMBED_DIM + i) + _LSH_HASH_B)
                    % _LSH_HASH_P) % 2
                else -1
                for i in range(EMBED_DIM)
            ]
            for b in range(LSH_BITS)
        ]
    import hashlib

    return [
        [
            1
            if hashlib.sha256(f"lsh:{table}:{b}:{i}".encode()).digest()[0] & 1
            else -1
            for i in range(EMBED_DIM)
        ]
        for b in range(LSH_BITS)
    ]


_LSH_SIGNS = _lsh_signs(0)
# guard at least the shipped table count AND the 4-table headroom the
# grid explored, so raising ANN_TABLES can't outrun the distinctness
# check (r10 self-review finding)
_LSH_ASSERT_TABLES = 4


def _assert_lsh_tables(n: int) -> None:
    assert (
        len({tuple(row) for t in range(n) for row in _lsh_signs(t)})
        == n * LSH_BITS
    ), "LSH sign rows must be distinct hyperplanes across tables"

# Banded cosine-LSH for threshold pair-mining (the dedup_minhash_lsh
# pattern applied to hyperplane signatures): NEARDUP_BANDS bands of
# NEARDUP_BAND_BITS sign bits each; a pair is a candidate iff it agrees
# on every bit of >= 1 band. Per-bit collision prob for angle θ is
# 1 - θ/π; the corpus's true pairs sit at cos 0.40–0.51 (θ ≈ 59–66°,
# p ≈ 0.63–0.67), so bands must be narrow (2 bits) and numerous (16):
# miss prob (1 - p²)^16 ≈ 3e-4 per pair. Narrow bands prune weakly —
# that is inherent to LOW-threshold cosine LSH, not to the plan shape;
# at a realistic near-dup cut (cos ≥ 0.9, p ≈ 0.86) the same code with
# 8-bit bands prunes hard. Planes are seeded ⇒ results deterministic.
NEARDUP_BANDS = 16
NEARDUP_BAND_BITS = 2
_NEARDUP_PLANES = np.random.RandomState(LSH_SEED + 1).randn(
    EMBED_DIM, NEARDUP_BANDS * NEARDUP_BAND_BITS
)


def _neardup_band_udf():
    from pyspark.sql import types as T

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _bands(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ _NEARDUP_PLANES) > 0  # (batch, bands*band_bits)
        r = NEARDUP_BAND_BITS
        weights = (1 << np.arange(r)).astype(np.int64)
        # band key = band_index * 2^r + local r-bit value: one flat int
        # column keys the equi-join (band identity folded into the key).
        keys = [
            bits[:, b * r : (b + 1) * r] @ weights + (b << r)
            for b in range(NEARDUP_BANDS)
        ]
        stacked = np.stack(keys, axis=1).astype(np.int32)  # (batch, bands)
        return pd.Series(list(stacked))

    return _bands


def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup pairs: bucket candidate generation + exact
    cosine verification. Same result as `embedding_neardup_pairs` (the
    exact all-pairs oracle) without any full cross join in the plan —
    the only join is the band-key equi-join, so candidate fan-out is
    bounded by bucket sizes, not corpus size²."""
    emb = _emb(spark, sf_dir).select("vec_id", "vec").cache()
    keyed = emb.select(
        "vec_id", F.explode(_neardup_band_udf()(F.col("vec"))).alias("bk")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    vb = emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= NEARDUP_COS)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )


def _lsh_bucket_udf():
    # built lazily: pandas_udf needs no live session when given a DataType,
    # but keeping construction out of import time also avoids pickling the
    # module on the driver before a session exists.
    from pyspark.sql import types as T

    @pandas_udf(T.IntegerType())
    def _lsh_bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float64
        quant = np.floor(mat * _LSH_QUANT).astype(np.int64)
        signs = np.asarray(_LSH_SIGNS, dtype=np.int64).T  # (dim, LSH_BITS)
        bits = (quant @ signs) > 0  # exact int64 dot products
        weights = (1 << np.arange(LSH_BITS)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    return _lsh_bucket


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors: cosine only within the query's LSH
    bucket. Sub-linear at scale; recall < 1 by design, but the
    bucketing is portable-hash Rademacher projection over integer-
    quantized components (see _LSH_SIGNS), so the approximate answer
    itself is engine-exact and carries a full DuckDB oracle."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _lsh_bucket_udf()(F.col("vec")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cands = queries.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("vec").alias("nv"),
            F.col("bucket").alias("nbucket"),
        ),
        (F.col("qbucket") == F.col("nbucket"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def _lsh_proj_udf(table: int = 0):
    """Raw integer projections (one per hyperplane), before the sign —
    the balanced variant thresholds these at the per-bit corpus median
    instead of 0."""
    from pyspark.sql import types as T

    table_signs = _lsh_signs(table)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _proj(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        quant = np.floor(mat * _LSH_QUANT).astype(np.int64)
        signs = np.asarray(table_signs, dtype=np.int64).T  # (dim, LSH_BITS)
        return pd.Series(list(quant @ signs))

    return _proj


def balanced_buckets(emb: DataFrame, table: int = 0) -> DataFrame:
    """(vec_id, bucket) with per-bit MEDIAN-thresholded projections
    (spectral-hashing-style bit balancing): each bit splits the corpus
    exactly 50/50 regardless of where the data sits, where a
    zero-threshold can put everything on one side. Engine-exact: the
    projections are integer dot products and the threshold is the
    type-1 lower median via the distinct-value histogram +
    cumulative-sum move (the quantile_portable_value machinery)."""
    from pyspark.sql.window import Window

    proj = emb.withColumn("proj", _lsh_proj_udf(table)(F.col("vec")))
    # cache: pb feeds BOTH the threshold histogram and the bucket
    # assembly, and Catalyst does not reuse the Arrow projection
    # across the two consumers (verified: 8 ArrowEvalPython nodes
    # before caching, r7 review) — the UDF is the dominant cost
    pb = proj.select(
        "vec_id", F.posexplode("proj").alias("b", "p")
    ).cache()
    hist = pb.groupBy("b", "p").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("b")
    wcum = wt.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    sized = hist.select(
        "b",
        "p",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wt).alias("tot"),
    )
    thr = sized.groupBy("b").agg(
        F.min(
            F.when(F.col("cum") >= F.ceil(F.col("tot") * 0.5), F.col("p"))
        ).alias("t")
    )  # LSH_BITS rows — broadcast by construction
    return (
        pb.join(F.broadcast(thr), "b")
        .select(
            "vec_id",
            F.expr("shiftleft(CAST(p > t AS BIGINT), b)").alias("term"),
        )
        .groupBy("vec_id")
        .agg(F.sum("term").cast("int").alias("bucket"))
    )


def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced-threshold LSH + 1-bit multiprobe — the two production
    recall knobs, both engine-exact (integer projections, type-1
    median thresholds, XOR probing ⇒ full DuckDB oracle).

    Balancing (see balanced_buckets) guarantees every bit splits the
    corpus 50/50; multiprobe (own bucket ∪ every 1-bit XOR flip,
    LSH_BITS+1 probes) recovers the recall that finer codes cost by
    visiting adjacent populated codes instead of rebuilding the index
    with fewer bits. A neighbor matches at most one probe (it has one
    bucket), so no dedup stage. Measured on the testdata (after the
    r7 hyperplane fix — see the _LSH_HASH_A note): the corpus spreads
    over ~53 of 64 codes, and multiprobe lifts recall@5 vs brute force
    from 0.16 (single probe) to 0.28 at ~7× the candidate fan-out —
    the knob doing exactly its job (pinned by unit test).

    Scale: the threshold pass is one extra (bit, projection) shuffle
    bounded by distinct projection values (at 100 TB you'd compute it
    on a sample and pin it in the index metadata); the probe join's
    fan-out is probes × bucket size with buckets ~n/2^bits."""
    return _multiprobe_topk(spark, sf_dir, _mp_masks_r1())


def _mp_masks_r1() -> tuple[int, ...]:
    return tuple(1 << b for b in range(LSH_BITS))


def _mp_masks_r2() -> tuple[int, ...]:
    return _mp_masks_r1() + tuple(
        (1 << i) | (1 << j)
        for i in range(LSH_BITS)
        for j in range(i + 1, LSH_BITS)
    )


def _multiprobe_topk(
    spark: SparkSession, sf_dir: str, masks: tuple[int, ...]
) -> DataFrame:
    """Shared balanced-LSH multiprobe body: probe set = own bucket ∪
    {bucket XOR m : m ∈ masks}, exact cosine re-rank over the bounded
    candidate set. A neighbor matches at most one probe (it has one
    bucket and the masks are distinct), so no dedup stage."""
    emb = _emb(spark, sf_dir).select("vec_id", "vec")
    # cached: consumed by the query side AND the candidate side below
    emb = (
        emb.join(balanced_buckets(emb), "vec_id")
        .select("vec_id", "vec", "bucket")
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    probes = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in masks],
    )
    probed = queries.select(
        "query_id", "qv", F.explode(probes).alias("pbucket")
    )
    cands = probed.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("vec").alias("nv"),
            F.col("bucket").alias("nbucket"),
        ),
        (F.col("pbucket") == F.col("nbucket"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def ann_multiprobe_r2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-2 multiprobe — the RECALL OPERATING POINT the r8 verdict
    asked for (item 3): probe the query's bucket plus every 1- and
    2-bit XOR flip (1 + 6 + 15 = 22 of the 64 balanced codes), then
    exact-cosine re-rank the bounded candidate set. Same integer
    arithmetic as the radius-1 query, so the full approximate answer
    keeps an exact DuckDB oracle.

    Why radius 2 is the right knob: the corpus's true top-5 pairs sit
    at cos 0.40–0.51 (θ ≈ 59–66°), so a neighbor disagrees with its
    query on each hyperplane with p ≈ θ/π ≈ 1/3; P[Hamming ≤ 2 of 6]
    ≈ 0.68 vs ≈ 0.35 for Hamming ≤ 1 — which is exactly the measured
    lift (recall@5 0.28 → 0.62 on the testdata, pinned ≥ 0.6 with the
    fan-out budget in tests/test_ann_recall.py). Fan-out stays
    bounded: 22/64 of the
    corpus in expectation (~34%), vs 100% for brute force — and at a
    realistic production cut (cos ≥ 0.9 neighbors, p ≈ 0.86 per bit)
    the same radius keeps recall ≥ 0.95 at 12 more bits, because the
    Hamming tail concentrates as bits grow."""
    return _multiprobe_topk(spark, sf_dir, _mp_masks_r2())


ANN_TABLES = 3  # L in the classic (L tables, radius-r probes) LSH
_assert_lsh_tables(max(_LSH_ASSERT_TABLES, ANN_TABLES))


def ann_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE independent balanced 6-bit LSH tables, each probed at
    radius 2, candidate sets unioned — the ≥0.8 recall operating
    point (VERDICT r9 item 5). All integer arithmetic, so the full
    approximate answer keeps an exact DuckDB oracle.

    Why L=3 × radius 2 (measured grid in PLANS.md r10, gated in
    tests/test_ann_recall.py): the corpus's true top-5 pairs sit at
    cos 0.40–0.51 — per-bit disagreement p ≈ θ/π ≈ 1/3, nearly a
    coin flip, the hardest regime for LSH. The verdict's candidate
    configs both fall short there: tables × radius-1 tops out at
    1-(1-0.35)^L ≈ 0.58 for L=2 (0.54 measured at sf0.01 even with
    FOUR tables), and 8-bit codes at radius 2 THIN the ball to
    P[Ham ≤ 2 of 8] ≈ 0.47 — more bits shrink every fixed-radius
    tail. Table independence turned out to be the load-bearing knob:
    with the parity-LCG family extended past table 0 the rows are
    heavily correlated (see _lsh_signs) and the grid stalls
    (2/3/4×R2 = 0.70/0.76/0.82 at sf0.01); with sha tables the same
    grid reads 0.76/0.84/0.92 at fan-out 0.59/0.73/0.82
    (sf0.001: 0.86/0.94/0.96). L=3 is the knee: recall ≥ 0.84 at
    both scales for ~72% expected fan-out. That fan-out is the
    honest price of recall 0.8 at near-random angles; at a
    production similarity cut (cos ≥ 0.9, p ≈ 0.86 per bit) the same
    L and radius prune hard because the Hamming tail concentrates.

    Scale notes: a neighbor can surface from several tables, so the
    candidate PAIRS are distinct-ed BEFORE the cosine re-rank — the
    dedup shuffles (query_id, neighbor_id) keys only, and each
    pair's exact cosine is computed once. Bucket assignment stays one
    Arrow projection pass per table (at 100 TB: one pass computing
    all L codes, thresholds pinned in index metadata); the probe
    explosion is an equi-join on the bucket key, never a cross
    join."""
    emb = _emb(spark, sf_dir).select("vec_id", "vec")
    # one frame carrying every table's bucket: consumed by the query
    # side and all L probe joins (cache avoids re-running the Arrow
    # projection passes per consumer)
    embb = emb
    for t in range(ANN_TABLES):
        embb = embb.join(
            balanced_buckets(emb, t).withColumnRenamed("bucket", f"bucket{t}"),
            "vec_id",
        )
    embb = embb.cache()
    queries = embb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        *[F.col(f"bucket{t}").alias(f"qb{t}") for t in range(ANN_TABLES)],
    )
    masks = (0,) + _mp_masks_r2()  # 0 = the query's own bucket
    pairs = None
    for t in range(ANN_TABLES):
        probes = F.array(
            *[F.col(f"qb{t}").bitwiseXOR(F.lit(m)) for m in masks]
        )
        probed = queries.select(
            "query_id", F.explode(probes).alias("pbucket")
        )
        cand = probed.join(
            embb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col(f"bucket{t}").alias("nbucket"),
            ),
            (F.col("pbucket") == F.col("nbucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        ).select("query_id", "neighbor_id")
        pairs = cand if pairs is None else pairs.unionAll(cand)
    pairs = pairs.distinct()
    scored = (
        pairs.join(
            F.broadcast(queries.select("query_id", "qv")), "query_id"
        )
        .join(
            embb.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("vec").alias("nv")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified recall measurement (r10): per-query recall@5
    of the multi-table index against the exact brute-force reference
    — the 0.84-at-sf0.01 operating-point claim as an ORACLE-CHECKED
    query, not just a unit assertion. Both sides are engine-exact
    (integer bucketing + deterministic tie-breaks), so the recall
    table itself carries an exact DuckDB twin built from the same two
    SQL constants the underlying queries publish."""
    bf = ann_bruteforce_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    mt = ann_multitable_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = bf.join(mt, ["query_id", "neighbor_id"], "left_semi")
    return (
        bf.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        .join(
            hits.groupBy("query_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_hits")
            ),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            "n_true",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .withColumn(
            "recall", F.round(F.col("n_hits") / F.col("n_true"), 6)
        )
    )


# --------------------------------------------------------------------------
# Centroid (IVF-flat) scaffold: per-label centroids as the coarse index
# (labels stand in for k-means cells, which would be trained offline at
# scale), query → nearest centroid → exact search within that cell.
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat probe (coarse cells = labels): query → nearest centroid
    → exact search within the cell.  r6: centroid components use the
    exact-decimal mean convention (round(x,9) → DECIMAL(27,12) sum /
    count — order-independent, so Spark's unordered partial aggregation
    and DuckDB agree bit-for-bit), which makes the cell assignment and
    therefore the whole approximate result oracle-exact."""
    emb = _emb(spark, sf_dir)
    dterm = F.round(F.col("x"), 9).cast("decimal(27,12)")
    centroids = (
        emb.select("label", F.posexplode("vec").alias("i", "x"))
        .groupBy("label", "i")
        .agg((F.sum(dterm).cast("double") / F.count(F.lit(1))).alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p["cx"]).alias("cvec"))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    q_cell = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "qv", "label", cosine(F.col("qv"), F.col("cvec")).alias("ccos")
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("ccos").desc(), F.col("label").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("query_id", "qv", F.col("label").alias("cell"))
    )
    cands = q_cell.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("vec").alias("nv"),
            F.col("label").alias("cell"),
        ),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


# IVF-multiprobe operating point (r11, VERDICT item 6): the wide-code
# LSH road the verdict proposed was measured FIRST and is a dead end
# on this corpus — no (bits ∈ 8..12, radius ≤ 4, tables ≤ 4) config
# reaches recall 0.8 under ~43% fan-out at the corpus's near-random
# neighbor angles (full measured grid in PLANS.md r11; wider codes
# thin every fixed-radius Hamming ball faster than extra tables
# recover it). Probing the data's OWN geometry instead — k-means
# cells, top-P by query-centroid cosine — beats the target at every
# scale: K=16, P=4 measures recall@5 0.88/0.88/0.92 at fan-out
# 0.24/0.25/0.25 (sf0.001/0.01/0.1) vs the multi-table LSH's
# 0.94/0.84 at ~0.72. Deterministic Lloyd's init + exact-decimal
# means keep the whole approximate answer oracle-exact.
ANN_IVF_K = 16
ANN_IVF_PROBES = 4


def ann_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-multiprobe top-k — the ≥0.8-recall-at-≤0.3-fan-out
    operating point (r11): Lloyd's k-means (K = ANN_IVF_K,
    deterministic init/iters, exact-decimal means), each query probes
    its ANN_IVF_PROBES nearest cells by centroid cosine, exact cosine
    re-rank over the unioned cell members. A point lives in exactly
    one cell and (query, cell) pairs are distinct, so candidate pairs
    are unique without a dedup shuffle. At 100 TB the fit runs on a
    sample with centroids pinned in index metadata; the probe join is
    a keyed equi-join on cid — fan-out is P/K of the corpus by
    construction, never a cross join. The persisted working set backs
    the lazily-returned plan (the fit's Lloyd rounds AND the caller's
    eventual action), so it cannot be unpersisted here; callers that
    also need the corpus (the recall report) pass their own persisted
    frame via `_ivf_multiprobe_topk` instead of persisting twice."""
    emb = _emb(spark, sf_dir).select("vec_id", "vec").persist()
    # footer row count (no job) gates the single-task fit — see
    # _kmeans_fit_centroids
    n = table_rows(spark, sf_dir, "embeddings")
    return _ivf_multiprobe_topk(spark, emb, n_rows=n)


def _ivf_multiprobe_topk(
    spark: SparkSession, emb: DataFrame, n_rows: int | None = None
) -> DataFrame:
    # fast=True routes fit + assignment through the exact numpy/
    # bucketed twins (provably ≡ the fold path — see _assign_auto);
    # K=16 ⇒ 4 coarse cells ≤ nprobe, so the production dispatch is
    # exact here and the oracle is unaffected (measured 3.6 s → see
    # PLANS.md; the fold cross-join's interpreted lambdas dominated)
    centroids = _kmeans_fit_centroids(
        spark, emb, k=ANN_IVF_K, fast=True, n_rows=n_rows
    )
    cdf = spark.createDataFrame(centroids, schema="cid INT, cvec ARRAY<DOUBLE>")
    asg = _assign_auto(emb, centroids).select("vec_id", "vec", "cid")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    cells = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cdf))
        .select(
            "query_id",
            "qv",
            "cid",
            cosine(F.col("qv"), F.col("cvec")).alias("ccos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("ccos").desc(), F.col("cid").asc()
                )
            ),
        )
        .filter(F.col("rn") <= ANN_IVF_PROBES)
        .select("query_id", "qv", "cid")
    )
    # cells is bounded by N_QUERIES × ANN_IVF_PROBES rows — broadcast
    # it so the candidate expansion is a BroadcastHashJoin on cid and
    # the corpus-sized assignment frame never shuffles
    cands = F.broadcast(cells).join(
        asg.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("vec").alias("nv"),
            "cid",
        ),
        "cid",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def ann_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified recall@5 of the IVF-multiprobe index against
    exact brute force — the r11 operating-point claim as an
    oracle-checked query (same construction as ann_recall_report).
    Both legs share ONE persisted working set (one load, one cache;
    the k-means fit happens once inside the multiprobe leg) instead
    of two independent `_emb` loads+persists."""
    emb = _emb(spark, sf_dir).select("vec_id", "vec").persist()
    n = table_rows(spark, sf_dir, "embeddings")
    bf = _bruteforce_topk(emb).select("query_id", "neighbor_id")
    mt = _ivf_multiprobe_topk(spark, emb, n_rows=n).select(
        "query_id", "neighbor_id"
    )
    hits = bf.join(mt, ["query_id", "neighbor_id"], "left_semi")
    return (
        bf.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        .join(
            hits.groupBy("query_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_hits")
            ),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            "n_true",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .withColumn("recall", F.round(F.col("n_hits") / F.col("n_true"), 6))
    )


# --------------------------------------------------------------------------
# Unsupervised IVF training: Lloyd's k-means over the embedding column,
# expressed as DataFrame iterations. Per round: assignment is a
# broadcast cross-join against the k centroids (row-local, scan-stage);
# the update is a posexplode → (cluster, dim) exact-decimal mean — one
# map-side-combined shuffle of k·d cells. Centroids (k·d doubles — a
# few KB at ANY corpus scale) are collected to the driver between
# rounds and re-broadcast, the same pattern Spark MLlib's KMeans uses;
# the fact-sized data never leaves the executors. Means use the exact
# decimal convention, so the fit is bit-deterministic run-to-run —
# assignment ties can't flap.
KMEANS_K = 8
KMEANS_ITERS = 3


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, cdf: DataFrame) -> DataFrame:
    """Nearest-centroid assignment with (d, cid) tie-break. The argmin
    is a map-side-combinable min(struct) aggregate — structs compare
    lexicographically, so min(struct(d, cid, …)) IS "order by d asc,
    cid asc, take first" without shuffling and sorting all n×K scored
    rows the way the previous row_number window did (at cluster scale
    the shuffle shrinks from n×K scored rows to n combined partials)."""
    return (
        emb.crossJoin(F.broadcast(cdf))
        .select(
            "vec_id", "vec", "cid", _l2sq(F.col("vec"), F.col("cvec")).alias("d")
        )
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cid", "vec")).alias("m"))
        .select(
            "vec_id",
            F.col("m.vec").alias("vec"),
            F.col("m.cid").alias("cid"),
            F.col("m.d").alias("d"),
        )
    )


# Relative near-tie tolerance on squared distances: the numpy-vs-fold
# disagreement is ~1e-12 × distance magnitude, so the guard compares the
# best-vs-second gap against _ASSIGN_MARGIN · max(d0, 1), not an absolute.
_ASSIGN_MARGIN = 1e-9


def _cid_sorted(centroids: list) -> tuple:
    """(cids, C) as numpy arrays in ascending-cid order — the shared
    driver prep of every numpy assignment path."""
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)
    order = np.argsort(cids)
    return cids[order], C[order]


def _fast_argmin(V: "np.ndarray", C: "np.ndarray",
                 cnorm: "np.ndarray") -> "np.ndarray":
    """Batch core of the full n×K argmin: indices into the cid-sorted
    centroid matrix, (d, cid)-tie-broken, with the relative near-tie
    guard (see _assign_fast's exactness contract)."""
    D = (V * V).sum(axis=1)[:, None] + cnorm[None, :] - 2.0 * (V @ C.T)
    i0 = D.argmin(axis=1)
    rows = np.arange(len(D))
    d0 = D[rows, i0].copy()
    D[rows, i0] = np.inf
    i1 = D.argmin(axis=1)
    d1 = D[rows, i1]
    gap = d1 - d0
    risky = gap <= _ASSIGN_MARGIN * np.maximum(d0, 1.0)
    for j in np.nonzero(risky)[0]:
        if not np.array_equal(C[i0[j]], C[i1[j]]):
            raise RuntimeError(
                "assignment near-tie below tolerance "
                f"(gap={gap[j]:.3e}): the fast argmin is not "
                "provably fold-exact here — use _assign"
            )
    return i0


def _assign_fast(emb: DataFrame, centroids: list) -> DataFrame:
    """Arrow-batched nearest-centroid assignment (numpy matmul over
    broadcast centroids) — the SemDeDup fit path, where K grows with
    the corpus and the fold-based _assign's n×K interpreted lambdas
    become the bottleneck (measured 54 s → 7 s at the 10× ladder).

    Exactness contract with the fold-based twin (what keeps the
    DuckDB oracle valid): numpy's pairwise-summed distances differ
    from the strict left fold by ≤ ~1e-12 RELATIVE, so the ARGMIN can
    only disagree on a near-tie. The guard raises on any best-vs-
    second-best gap ≤ 1e-9 · max(d0, 1) — relative, because the
    fold error scales with the distance magnitude (an absolute 1e-9
    would under-detect for large-norm embeddings) — including
    gap == 0 exactly: a bitwise-equal numpy tie between NON-identical
    centroids can still break the other way in the strict fold's last
    ulp. Bitwise-IDENTICAL centroids tie exactly in both engines and
    pick the lowest cid (numpy argmin = first minimum; fold tie-break
    = (d, cid) asc). No sub-tolerance gap → argmin provably
    identical."""
    cids, C = _cid_sorted(centroids)
    cnorm = (C * C).sum(axis=1)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("vec", T.ArrayType(T.DoubleType()), True),
            T.StructField("cid", T.IntegerType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            i0 = _fast_argmin(V, C, cnorm)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "vec": pdf["vec"],
                    "cid": pd.Series(cids[i0], dtype="int32"),
                }
            )

    return emb.mapInPandas(batches, schema)


# Below this K the coarse layer is pure overhead; at/above it the
# bucketed path is the production assignment (graded scales have K = 8,
# so the driver-certified SemDeDup rows exercise the bucketed code).
_BUCKETED_MIN_K = 4
# Cell-pruning slack, RELATIVE on squared distances: must exceed
# _ASSIGN_MARGIN (so every centroid that could win OR trip the
# near-tie guard is provably scored) plus the ~1e-12-relative float
# error of the sqrt/matmul lower bound. 1e-6 is 1000× the margin.
_BUCKET_SLACK = 1e-6
# Production probe bound for SemDeDup's assignment: at most this many
# coarse cells are scored per point, capping assignment work at
# n·(⌈√K⌉ coarse + nprobe·K/⌈√K⌉ fine) = O(n·√K) REGARDLESS of how
# the corpus clusters (the exact stopping rule alone degenerates to
# ~full n×K on overlapping unit-sphere corpora — measured grid in
# PLANS.md). Whenever nprobe ≥ the cell count the result is provably
# identical to the exact mode — true at every graded scale (K = 8 ⇒
# 3 cells), so the driver-certified rows exercise this exact-by-
# construction production path; beyond that scale it is the paper's
# own trade (ANN-accelerated assignment, approximate).
SEMDEDUP_NPROBE = 4


def _coarse_cells(C: "np.ndarray") -> tuple:
    """Driver-side coarse quantizer over the K-bounded centroid set:
    deterministic mini-Lloyd (init = first ⌈√K⌉ centroids in cid
    order, 5 rounds, empty cells keep their previous center). Returns
    (G, radii, members): coarse centers, per-cell max member distance
    (the triangle-inequality pruning bound), and per-cell member
    centroid indices (ascending, i.e. cid order)."""
    K = len(C)
    nC = max(1, int(np.ceil(np.sqrt(K))))
    G = C[:nC].copy()
    cn = (C * C).sum(axis=1)
    assign = np.zeros(K, dtype=np.int64)
    for _ in range(5):
        D = cn[:, None] + (G * G).sum(axis=1)[None, :] - 2.0 * C @ G.T
        assign = D.argmin(axis=1)
        for g in range(nC):
            m = assign == g
            if m.any():
                G[g] = C[m].mean(axis=0)
    D = cn[:, None] + (G * G).sum(axis=1)[None, :] - 2.0 * C @ G.T
    assign = D.argmin(axis=1)
    members, radii = [], np.zeros(nC)
    for g in range(nC):
        mem = np.nonzero(assign == g)[0]
        members.append(mem)
        if mem.size:
            diff = C[mem] - G[g]
            radii[g] = float(np.sqrt((diff * diff).sum(axis=1).max()))
    return G, radii, members


def _assign_bucketed(
    emb: DataFrame, centroids: list, nprobe: int | None = None
) -> DataFrame:
    """IVF-bucketed nearest-centroid assignment — the production path
    for SemDeDup's corpus-proportional K (the r10 verdict's
    asymptotics finding).

    A driver-side coarse quantization of the K centroids into ⌈√K⌉
    cells gives, per point x, a triangle-inequality lower bound
    lb_g = max(0, ‖x−G_g‖ − r_g) ≤ min distance from x to ANY
    centroid in cell g. Cells are probed in lb order; a cell whose
    lb² exceeds the running best squared distance plus _BUCKET_SLACK
    (relative) is pruned along with every later cell — that rule
    alone makes the answer EXACT: every centroid that could either
    WIN the argmin or fall inside _assign_fast's near-tie margin is
    provably in the scored candidate set, and the (d, cid)-tie-broken
    argmin + relative near-tie guard over that set equals
    _assign_fast's full n×K answer bit-for-bit.

    nprobe=None keeps only that exact rule (the verification/oracle
    twin — work shrinks only as far as the geometry allows; on
    overlapping unit-sphere corpora the bound prunes almost nothing,
    measured grid in PLANS.md). nprobe=p additionally caps probing at
    the p lowest-lb cells, bounding work at O(n·√K) for K ∝ n
    REGARDLESS of geometry — the SemDeDup paper's own
    ANN-accelerated-assignment trade, approximate only when p < cell
    count (whenever p ≥ ⌈√K⌉ the cap never binds and the result is
    provably the exact one — true at every graded scale).

    Verification twins: `_assign_fast` (n×K numpy) and `_assign`
    (fold-based); tests pin bucketed(None) ≡ bucketed(nprobe≥cells)
    ≡ fast ≡ fold on testdata."""
    cids, C = _cid_sorted(centroids)
    cnorm = (C * C).sum(axis=1)
    G, radii, members = _coarse_cells(C)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("vec", T.ArrayType(T.DoubleType()), True),
            T.StructField("cid", T.IntegerType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            best_g = _bucketed_argmin(V, C, cnorm, G, radii, members, nprobe)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "vec": pdf["vec"],
                    "cid": pd.Series(cids[best_g], dtype="int32"),
                }
            )

    return emb.mapInPandas(batches, schema)


def _bucketed_argmin(V, C, cnorm, G, radii, members,
                     nprobe: int | None) -> "np.ndarray":
    """Batch core of the branch-and-bound argmin: indices into the
    cid-sorted centroid matrix. Exactness rules and the near-tie guard
    are _assign_bucketed's contract (docstring above)."""
    gnorm = (G * G).sum(axis=1)
    nC = len(G)
    n = len(V)
    vnorm = (V * V).sum(axis=1)
    DG = vnorm[:, None] + gnorm[None, :] - 2.0 * V @ G.T
    lb = np.maximum(np.sqrt(np.maximum(DG, 0.0)) - radii[None, :], 0.0)
    lb2 = lb * lb
    cell_order = np.argsort(lb2, axis=1, kind="stable")
    lb2_sorted = np.take_along_axis(lb2, cell_order, axis=1)
    d0 = np.full(n, np.inf)
    tp: list = []
    tg: list = []
    td: list = []
    alive = np.arange(n)
    for t in range(nC if nprobe is None else min(nprobe, nC)):
        if alive.size == 0:
            break
        # lb is nondecreasing along cell_order, so a point whose
        # t-th cell fails the threshold is finished for good.
        need = lb2_sorted[alive, t] <= d0[alive] + _BUCKET_SLACK * np.maximum(
            d0[alive], 1.0
        )
        alive = alive[need]
        if alive.size == 0:
            break
        cells_t = cell_order[alive, t]
        for g in np.unique(cells_t):
            mem = members[g]
            if mem.size == 0:
                continue
            pts = alive[cells_t == g]
            D = (
                vnorm[pts][:, None]
                + cnorm[mem][None, :]
                - 2.0 * V[pts] @ C[mem].T
            )
            tp.append(np.repeat(pts, mem.size))
            tg.append(np.tile(mem, pts.size))
            td.append(D.ravel())
            np.minimum.at(d0, pts, D.min(axis=1))
    if not tp:
        # Possible past graded scales when nprobe < cell count
        # and every probed cell is empty for the whole batch —
        # fail with the designed loud error, not an opaque
        # np.concatenate ValueError.
        raise RuntimeError("bucketed assignment lost a point")
    ap = np.concatenate(tp)
    ag = np.concatenate(tg)
    ad = np.concatenate(td)
    # (d, cid)-tie-broken argmin over the candidate set: sort by
    # (point, d, centroid-index); centroid index IS cid order.
    o2 = np.lexsort((ag, ad, ap))
    ap_s, ag_s, ad_s = ap[o2], ag[o2], ad[o2]
    first = np.ones(len(ap_s), dtype=bool)
    first[1:] = ap_s[1:] != ap_s[:-1]
    starts = np.nonzero(first)[0]
    if len(starts) != n:
        raise RuntimeError("bucketed assignment lost a point")
    best_g = ag_s[starts]
    best_d = ad_s[starts]
    counts = np.diff(np.append(starts, len(ap_s)))
    pd0 = np.repeat(best_d, counts)
    pbg = np.repeat(best_g, counts)
    # Near-tie guard, conservative superset of _assign_fast's:
    # ANY scored non-best candidate within the relative margin
    # of its point's best must be bitwise-identical, else raise.
    gap = ad_s - pd0
    risky = (gap <= _ASSIGN_MARGIN * np.maximum(pd0, 1.0)) & (ag_s != pbg)
    for j in np.nonzero(risky)[0]:
        if not np.array_equal(C[ag_s[j]], C[pbg[j]]):
            raise RuntimeError(
                "assignment near-tie below tolerance "
                f"(gap={gap[j]:.3e}): the bucketed argmin is not "
                "provably fold-exact here — use _assign"
            )
    return best_g


def _assign_auto(emb: DataFrame, centroids: list) -> DataFrame:
    """Production dispatcher: nprobe-bounded bucketed assignment when
    K is big enough for the coarse layer to pay, plain n×K numpy
    otherwise. At every graded scale nprobe ≥ the cell count, so the
    dispatched path is provably identical to the exact twins
    (`_assign_fast`, fold-based `_assign`) and the DuckDB oracle
    holds; past that, work is capped at O(n·√K) by construction."""
    if len(centroids) >= _BUCKETED_MIN_K:
        return _assign_bucketed(emb, centroids, nprobe=SEMDEDUP_NPROBE)
    return _assign_fast(emb, centroids)


def _kmeans_fit(spark: SparkSession, emb: DataFrame, k: int = KMEANS_K,
                fast: bool = False, n_rows: int | None = None) -> DataFrame:
    """Lloyd's fit shared by the k-means report and SemDeDup: init =
    the first k vectors, KMEANS_ITERS assignment/mean rounds
    (exact-decimal means), returns the final centroid frame
    (cid, cvec). Only k-bounded centroid rows ever reach the driver.
    fast=True routes assignment through the margin-guarded numpy paths
    (`_assign_auto`: bucketed branch-and-bound for K ≥ _BUCKETED_MIN_K,
    plain n×K below) — used by SemDeDup, whose K grows with the
    corpus. See `_kmeans_fit_centroids` for the n_rows gate."""
    return spark.createDataFrame(
        _kmeans_fit_centroids(spark, emb, k, fast, n_rows),
        schema="cid INT, cvec ARRAY<DOUBLE>",
    )


def _kmeans_fit_centroids(
    spark: SparkSession, emb: DataFrame, k: int = KMEANS_K,
    fast: bool = False, n_rows: int | None = None,
) -> list:
    """Driver-side centroid list of the Lloyd fit (the frame `
    _kmeans_fit` returns is createDataFrame of exactly this — callers
    that need both skip a LocalTableScan collect round-trip).

    n_rows gate (r14 second pass, guide §2.4 "remove shuffles/passes
    outright"): when the caller can prove the working set is small —
    a parquet-footer row count, no job — the ENTIRE fit (init + all
    KMEANS_ITERS rounds) runs as ONE single-partition mapInPandas job
    (`_fit_centroids_single_task`) instead of 1 init collect +
    KMEANS_ITERS boundary jobs. Lloyd rounds are sequential barriers,
    so the distributed ladder pays job-launch floor × (ITERS+1) even
    when the data is a few MB; below the gate the same arithmetic runs
    in one task. Bit-identical by construction: the partial sums are
    exact int64 on the 1e-6 grid (associative — batching/partitioning
    cannot change them) and the argmin cores are the same functions,
    so induction over rounds gives the same centroids the ladder
    yields (pinned in tests/test_opt_r14.py). At 100 TB n_rows
    exceeds the gate and the distributed ladder runs unchanged."""
    from orionld_to_hive_spark.functions.numeric import DECIMAL_T

    if fast and n_rows is not None and n_rows <= _FIT_SINGLE_TASK_MAX_ROWS:
        return _fit_centroids_single_task(emb, k)
    init = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("vec").alias("cvec")
    )
    centroids = [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in init.collect()]
    for _ in range(KMEANS_ITERS):
        if fast:
            # one Arrow crossing per round (r14): argmin + partial
            # means fused in a single batch loop — see _fit_round_means
            centroids = _fit_round_means(emb, centroids)
            continue
        cdf = spark.createDataFrame(centroids, schema="cid INT, cvec ARRAY<DOUBLE>")
        assigned = _assign(emb, cdf)
        means = (
            assigned
            .select("cid", F.posexplode("vec").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(
                (
                    F.sum(F.col("x").cast(DECIMAL_T)).cast("double") / F.count("x")
                ).alias("m")
            )
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
            .select("cid", F.transform("pairs", lambda p: p["m"]).alias("cvec"))
        )
        centroids = [
            (int(r["cid"]), [float(x) for x in r["cvec"]]) for r in means.collect()
        ]
    return centroids


def _round_grid(V: "np.ndarray") -> "np.ndarray":
    """HALF_UP rounding of each component onto the 1e-6 grid with the
    SAME semantics as Spark's double→DECIMAL(27,6) cast. Spark (like
    java.math.BigDecimal.valueOf) rounds the double's shortest decimal
    repr, not the binary value — so the fast vectorized path
    (floor(|v|·1e6 + 0.5)) is only trusted when the scaled fraction is
    provably far from the .5 tie boundary; components within the guard
    band (|frac−0.5| below an error bound scaled to the product's
    magnitude) are re-rounded via decimal.Decimal(repr(v)), which IS
    the cast's semantics bit-for-bit. Without the guard, a boundary
    component like 1.0046905 (float product 1004690.4999…) silently
    rounds down where the cast rounds up."""
    prod = np.abs(V) * 1e6
    scaled = (np.sign(V) * np.floor(prod + 0.5)).astype(np.int64)
    frac = prod - np.floor(prod)
    # |prod| carries ~1e-16 relative error from the multiply plus
    # <½ulp repr-vs-binary slack; 1e-9·prod bounds both with margin,
    # floored at 1e-7 for tiny components.
    tol = np.maximum(1e-7, prod * 1e-9)
    boundary = np.abs(frac - 0.5) < tol
    if boundary.any():
        import decimal

        q6 = decimal.Decimal("0.000001")
        for r_, c_ in np.argwhere(boundary):
            v = float(V[r_, c_])
            d = decimal.Decimal(repr(v)).quantize(
                q6, rounding=decimal.ROUND_HALF_UP
            )
            scaled[r_, c_] = int(d * 1_000_000)
    return scaled


def _fast_means(assigned: DataFrame) -> list:
    """Exact-decimal centroid means as ONE Arrow partial pass: each
    component is rounded to the 1e-6 grid with HALF_UP (bit-identical
    to Spark's double→DECIMAL(27,6) cast), summed as int64 per
    (cid, dim) inside each batch, and combined on the driver — the
    collect is k·d-bounded integers, and (Σ scaled)/1e6 ÷ count
    reproduces `CAST(SUM(decimal) AS DOUBLE)/COUNT` exactly (the
    integer total stays ≪ 2^53, so each conversion is the same
    correctly-rounded double the decimal path produces, in the same
    order). Replaces three posexplode+shuffle+collect rounds with
    three single-job passes (measured in PLANS.md r11); the fold
    path keeps the original decimal aggregation, so the twins pin
    each other."""

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            cids = pdf["cid"].to_numpy()
            yield _partial_frame(cids, _round_grid(V))

    return _combine_partials(
        assigned.select("cid", "vec").mapInPandas(partials, _PART_SCHEMA).collect()
    )


_PART_SCHEMA = T.StructType(
    [
        T.StructField("cid", T.IntegerType(), False),
        T.StructField("i", T.IntegerType(), False),
        T.StructField("s", T.LongType(), False),
        T.StructField("c", T.LongType(), False),
    ]
)


def _partial_frame(cids: "np.ndarray", scaled: "np.ndarray") -> pd.DataFrame:
    """Per-batch (cid, dim) int64 partial sums + counts over the
    1e-6-grid-scaled matrix — the map side of the exact-decimal mean,
    shared by _fast_means and the fused fit round."""
    dim = scaled.shape[1]
    out_c, out_i, out_s, out_n = [], [], [], []
    for c in np.unique(cids):
        block = scaled[cids == c]
        out_c.extend([int(c)] * dim)
        out_i.extend(range(dim))
        out_s.extend(block.sum(axis=0).tolist())
        out_n.extend([block.shape[0]] * dim)
    return pd.DataFrame(
        {
            "cid": pd.Series(out_c, dtype="int32"),
            "i": pd.Series(out_i, dtype="int32"),
            "s": pd.Series(out_s, dtype="int64"),
            "c": pd.Series(out_n, dtype="int64"),
        }
    )


def _combine_partials(rows) -> list:
    """Driver combine of (cid, i, s, c) partials into the centroid
    list — exact int64 addition, then the same (Σ scaled)/1e6 ÷ count
    conversion order as the decimal aggregation (see _fast_means)."""
    acc: dict[tuple[int, int], list] = {}
    for r in rows:
        key = (r["cid"], r["i"])
        if key in acc:
            acc[key][0] += r["s"]
            acc[key][1] += r["c"]
        else:
            acc[key] = [r["s"], r["c"]]
    by_cid: dict[int, dict[int, float]] = {}
    for (cid, i), (s, c) in acc.items():
        by_cid.setdefault(cid, {})[i] = (s / 1e6) / c
    return sorted(
        (cid, [dims[i] for i in sorted(dims)]) for cid, dims in by_cid.items()
    )


def _fit_round_means(emb: DataFrame, centroids: list) -> list:
    """ONE Lloyd round = ONE Arrow crossing (r14, guide §4.1): the
    nearest-centroid argmin and the exact-decimal partial means run in
    the SAME batch loop, so the corpus's vectors cross the JVM→Python
    boundary once per round and nothing (not even the assignment) is
    shipped back except the k·d-bounded partial rows. The previous
    two-step form (`_fast_means(_assign_auto(emb, c))`) chained two
    mapInPandas nodes: every vector crossed to Python for the argmin,
    was re-serialized to Arrow WITH its assignment, crossed back to
    the JVM, and crossed to Python AGAIN for the partial sums — 3×
    the boundary traffic for the identical arithmetic. Dispatch,
    argmin cores (`_fast_argmin`/`_bucketed_argmin`, near-tie guards
    included) and the partial/combine stages (`_partial_frame`/
    `_combine_partials`) are the same code the two-step twins run, so
    the returned centroids are bit-identical (pinned in
    tests/test_opt_r14.py)."""
    bucketed = len(centroids) >= _BUCKETED_MIN_K
    cids, C = _cid_sorted(centroids)
    cnorm = (C * C).sum(axis=1)
    if bucketed:
        G, radii, members = _coarse_cells(C)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            if bucketed:
                idx = _bucketed_argmin(
                    V, C, cnorm, G, radii, members, SEMDEDUP_NPROBE
                )
            else:
                idx = _fast_argmin(V, C, cnorm)
            yield _partial_frame(cids[idx], _round_grid(V))

    # vec only — vec_id plays no part in a fit round's arithmetic
    return _combine_partials(
        emb.select("vec").mapInPandas(batches, _PART_SCHEMA).collect()
    )


# Single-task fit gate: below this many vectors the whole Lloyd fit
# runs in one task (EMBED_DIM=64 doubles → ≤ 64 MB matrix; the int64
# partial sums stay ≪ 2^63 at any |component| the 1e-6 grid admits for
# n this small). The sf1.0 ladder (20 k rows) stays under it — the
# ladder's scaling exponents measure the same code path the graded
# scales run; a production corpus exceeds it and takes the distributed
# rounds unchanged.
_FIT_SINGLE_TASK_MAX_ROWS = 1 << 17

_CENT_SCHEMA = T.StructType(
    [
        T.StructField("cid", T.IntegerType(), False),
        T.StructField("cvec", T.ArrayType(T.DoubleType()), False),
    ]
)


def _fit_centroids_single_task(emb: DataFrame, k: int) -> list:
    """The ENTIRE Lloyd fit (init + KMEANS_ITERS rounds) as ONE
    single-partition mapInPandas job — the n_rows-gated small-corpus
    path of `_kmeans_fit_centroids` (r14 second pass). Same argmin
    cores (`_fast_argmin` / `_bucketed_argmin`, near-tie guards
    included), same 1e-6-grid int64 partial sums, same (Σ/1e6)/count
    conversion order as `_combine_partials` — the sums are exact
    integers, so summing the whole corpus in one task instead of
    per-batch-then-driver changes nothing; centroids are bit-identical
    to the distributed ladder by induction over rounds."""

    def whole(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in it if len(p)]
        if not pdfs:
            return
        ids = np.concatenate([p["vec_id"].to_numpy() for p in pdfs])
        V = np.array(
            [row for p in pdfs for row in p["vec"].tolist()],
            dtype=np.float64,
        )
        sel = ids < k
        centroids = sorted(
            (int(i), [float(x) for x in row])
            for i, row in zip(ids[sel], V[sel])
        )
        for _ in range(KMEANS_ITERS):
            if not centroids:
                break
            bucketed = len(centroids) >= _BUCKETED_MIN_K
            cids, C = _cid_sorted(centroids)
            cnorm = (C * C).sum(axis=1)
            if bucketed:
                G, radii, members = _coarse_cells(C)
                idx = _bucketed_argmin(
                    V, C, cnorm, G, radii, members, SEMDEDUP_NPROBE
                )
            else:
                idx = _fast_argmin(V, C, cnorm)
            scaled = _round_grid(V)
            acid = cids[idx]
            centroids = []
            for c in np.unique(acid):
                blk = scaled[acid == c]
                n = blk.shape[0]
                centroids.append(
                    (int(c), [(int(s) / 1e6) / n for s in blk.sum(axis=0)])
                )
        yield pd.DataFrame(
            {
                "cid": pd.Series([c for c, _ in centroids], dtype="int32"),
                "cvec": pd.Series([v for _, v in centroids], dtype="object"),
            }
        )

    rows = (
        emb.select("vec_id", "vec")
        .coalesce(1)
        .mapInPandas(whole, _CENT_SCHEMA)
        .collect()
    )
    return sorted((int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows)


def kmeans_embeddings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orionld_to_hive_spark.functions.numeric import DECIMAL_T

    # The working set is re-scanned once per Lloyd round (+ the final
    # assignment) — cache it: at cluster scale this is the difference
    # between T parquet scans and one (MEMORY_AND_DISK spills gracefully
    # when the corpus exceeds executor memory).
    emb = _emb(spark, sf_dir).select("vec_id", "vec").persist()
    cdf = _kmeans_fit(spark, emb)
    return (
        _assign(emb, cdf)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(
                F.sum(F.round(F.col("d"), 6).cast(DECIMAL_T)).cast("double"), 6
            ).alias("inertia"),
        )
    )


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup in
# embedding space — cluster the corpus with k-means, then inside each
# cluster treat pairs with cosine >= tau as semantic duplicates and
# keep the member FARTHEST from its centroid (the paper's
# keep-low-centroid-similarity rule, which preserves the cluster's
# diversity). Deterministic pairwise variant: x is dropped iff some
# same-cluster partner y with pair-cos >= tau precedes it in the
# (centroid-cos, vec_id) order — the paper's per-group rule applied
# edge-wise, so the result is arrival/partitioning independent and
# exactly SQL-expressible (the oracle replays it verbatim).
#
# Scale shape (the paper's own): K grows with the corpus — k =
# max(KMEANS_K, n // SEMDEDUP_CLUSTER_TARGET), the same rule in both
# engines — so cluster size stays bounded (~TARGET) and the
# within-cluster pair join is a keyed equi-join on cid doing n·TARGET
# work, never global n²; AQE's skew handling covers a hot cluster.
# The ASSIGNMENT (both the Lloyd's rounds and the final scoring) runs
# through `_assign_auto` → `_assign_bucketed`: a triangle-inequality
# branch-and-bound over a ⌈√K⌉-cell coarse quantization that does
# ~O(n·√K) work (n^1.5 for K ∝ n, vs the naive n²/TARGET) while
# remaining provably EXACT — the DuckDB oracle stays bit-exact; the
# paper ANN-accelerates this step approximately, this keeps the
# guarantee. Driver traffic stays K-bounded.
SEMDEDUP_TAU = NEARDUP_COS  # 0.4 — this corpus's near-dup regime
SEMDEDUP_CLUSTER_TARGET = 250


def _semdedup_k(n: int) -> int:
    return max(KMEANS_K, n // SEMDEDUP_CLUSTER_TARGET)


def semdedup_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orionld_to_hive_spark.functions.vectors import dot, norm2

    emb = _emb(spark, sf_dir).select("vec_id", "vec").persist()
    # k derives from |embeddings| — parquet footer metadata, not a
    # count() scan job (r13; _emb is the unfiltered table, so the
    # values are identical and DuckDB's reader agrees)
    n = table_rows(spark, sf_dir, "embeddings")
    centroids = _kmeans_fit_centroids(
        spark, emb, k=_semdedup_k(n), fast=True, n_rows=n
    )
    cdf = spark.createDataFrame(centroids, schema="cid INT, cvec ARRAY<DOUBLE>")
    # Pre-normalize once (n rows, not n²/K pairs): every pair score is
    # then a SINGLE dot fold instead of dot + two norms, and each
    # unordered pair is evaluated exactly once. The oracle performs
    # the identical normalize-then-dot ops, so exactness survives.
    ncdf = cdf.select(
        "cid",
        F.transform("cvec", lambda x: x / norm2(F.col("cvec"))).alias("ncvec"),
    )
    asg = (
        _assign_auto(emb, centroids)
        .withColumn("nrm", norm2(F.col("vec")))
        .join(F.broadcast(ncdf), "cid")
        .select(
            "cid",
            "vec_id",
            F.transform("vec", lambda x: x / F.col("nrm")).alias("nv"),
            "ncvec",
        )
        .select(
            "cid",
            "vec_id",
            "nv",
            F.round(dot(F.col("nv"), F.col("ncvec")), 6).alias("ccos"),
        )
        # no persist (r14): the fused per-cid report below is asg's
        # ONLY consumer — the r13 cache served the pair/pts double
        # consumption that no longer exists
    )
    # Per-cluster pairwise scoring as ONE numpy matmul per cluster
    # (the paper's own within-cluster step): shuffle by cid, then
    # NV @ NV.T inside the Arrow group — replacing the interpreted
    # fold per candidate pair (measured 26 s → see PLANS.md at the
    # 10× ladder). Exactness contract with the fold+round oracle:
    # round6(dot) >= TAU  ⟺  dot >= TAU − 0.5e-6, and numpy's dot
    # differs from the strict fold by ≤ ~1e-12 — so the decision can
    # only disagree within 1e-9 of the cut point, where the guard
    # raises instead of answering. Memory/skew bound: a hot cluster
    # of m rows builds an m×m block — K ∝ n keeps m near
    # SEMDEDUP_CLUSTER_TARGET by construction.
    tau_edge = SEMDEDUP_TAU - 0.5e-6
    report_schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("n_points", T.LongType(), False),
            T.StructField("n_dup_pairs", T.LongType(), False),
            T.StructField("n_dropped", T.LongType(), False),
            T.StructField("n_kept", T.LongType(), False),
        ]
    )

    # r14 (guide §2.2): the Arrow group ALREADY holds the whole
    # cluster, so the per-cid report row (n_points, pair count,
    # distinct-loser count) is computed inside the same batch that
    # builds S = NV@NVᵀ — the r13 shape shipped every duplicate pair
    # out of Python only to re-aggregate it (pairs shuffle + groupBy +
    # a separate n_points aggregation over asg + a join to stitch
    # them). len/sum/unique here are the identical arithmetic
    # (count(*), count(distinct loser) per cid); clusters with no
    # pairs emit n_dup_pairs = n_dropped = 0, exactly what the old
    # left join + coalesce produced. One aggregation pass, two fewer
    # shuffles, no join — and asg has a single consumer now, so the
    # r13 persist (added for the dup/pts double consumption) is gone.
    def cluster_report(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        NV = np.array(pdf["nv"].to_numpy()[order].tolist(), dtype=np.float64)
        cc = pdf["ccos"].to_numpy()[order]
        S = NV @ NV.T
        iu, ju = np.triu_indices(len(ids), k=1)
        s = S[iu, ju]
        if np.any(np.abs(s - tau_edge) < 1e-9):
            raise RuntimeError(
                "pair score within 1e-9 of the rounding cut point: "
                "the matmul decision is not provably fold-exact here"
            )
        hit = s >= tau_edge
        ia, ib = ids[iu[hit]], ids[ju[hit]]
        ca, cb = cc[iu[hit]], cc[ju[hit]]
        # exactly one member of a duplicate pair drops: the LATER in
        # (centroid-cos, vec_id) order — ids are sorted so ia < ib
        loser = np.where((ca > cb), ia, np.where(ca < cb, ib, ib))
        n_points = len(ids)
        n_dropped = len(np.unique(loser))
        return pd.DataFrame(
            {
                "cid": pd.Series([int(pdf["cid"].iloc[0])], dtype="int32"),
                "n_points": pd.Series([n_points], dtype="int64"),
                "n_dup_pairs": pd.Series([int(hit.sum())], dtype="int64"),
                "n_dropped": pd.Series([n_dropped], dtype="int64"),
                "n_kept": pd.Series([n_points - n_dropped], dtype="int64"),
            }
        )

    return asg.groupBy("cid").applyInPandas(cluster_report, report_schema)


# --------------------------------------------------------------------------
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS: LSH-candidate pairs (same result as
    exact — see embedding_neardup_lsh) → min-label connected components
    → one row per cluster (canonical = min vec_id, size). Cosine is not
    transitive, so pair output alone is not a dedup answer; the oracle
    computes the same fixpoint with a recursive CTE over exact pairs."""
    from orionld_to_hive_spark.operators.dedup import connected_components

    pairs = embedding_neardup_lsh(spark, sf_dir).select("vec_a", "vec_b")
    labels = connected_components(pairs, "vec_a", "vec_b")
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select(F.col("label").alias("canonical_vec_id"), "cluster_size")
    )


_COS_EXPR = """
  list_sum(list_transform(range(1, len(a.embedding)+1),
           i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
  / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x*x)))
     * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x*x))))
"""

EMBEDDING_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_COS_EXPR} >= {NEARDUP_COS}
),
und AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, peer) AS (
  SELECT u, u FROM und
  UNION
  SELECT r.node, u2.v FROM reach r JOIN und u2 ON r.peer = u2.u
),
labels AS (
  SELECT node, MIN(peer) AS label FROM reach GROUP BY node
)
SELECT label AS canonical_vec_id, COUNT(*) AS cluster_size
FROM labels
GROUP BY label
ORDER BY canonical_vec_id
"""


# --------------------------------------------------------------------------
def embedding_norm_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm audit of the embedding column: per-vector norm, dim, and
    a normalized? flag — the sanity gate before any cosine/IVF indexing
    (un-normalized vectors silently break inner-product shortcuts).
    Pure column expressions over one scan; the fold order matches
    DuckDB's list_sum, so norms are bit-identical cross-engine."""
    from orionld_to_hive_spark.functions.vectors import norm2

    emb = _emb(spark, sf_dir)
    nrm = norm2(F.col("vec"))
    return emb.select(
        "vec_id",
        F.size("vec").alias("dim"),
        F.round(nrm, 6).alias("l2_norm"),
        (F.abs(nrm - F.lit(1.0)) < F.lit(1e-6)).alias("is_unit"),
    )


EMBEDDING_NORM_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6)
         AS l2_norm,
       abs(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) - 1.0)
         < 1e-6 AS is_unit
FROM embeddings
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
def embedding_quantization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per-vector scale = max|x|/127,
    q_i = round(x_i/scale). Reports the quantized checksum (sum of int8
    codes) and L1 code mass — the pre-flight audit before shipping a
    quantized ANN index.

    Formulated as explode → per-vector window max (the scale) → one
    aggregate on the same key, so the window's (vec_id) exchange is
    reused by the groupBy — one shuffle total, everything inside
    whole-stage codegen. An array-local variant (three higher-order
    aggregate() folds) was tried and lost ~5×: HOF lambdas evaluate
    interpreted, and the scale subtree re-evaluated per element made it
    O(d²) per vector.

    Cross-engine exactness: float32→double is exact, max/abs/division
    are IEEE-deterministic, integer code sums are order-independent,
    and both engines round halves away from zero, so the integer codes
    match bit-for-bit. Zero-length embeddings are excluded (explode of
    an empty array emits nothing; the oracle filters len(v) > 0 to
    agree)."""
    from pyspark.sql import Window

    flat = _emb(spark, sf_dir).select("vec_id", F.explode("vec").alias("x"))
    max_abs_w = F.max(F.abs("x")).over(Window.partitionBy("vec_id"))
    scale_w = F.when(max_abs_w == 0.0, F.lit(1.0)).otherwise(
        max_abs_w / F.lit(127.0)
    )
    coded = flat.withColumn("q", F.round(F.col("x") / scale_w).cast("long"))
    max_abs = F.max(F.abs("x"))
    scale = F.when(max_abs == 0.0, F.lit(1.0)).otherwise(max_abs / F.lit(127.0))
    return (
        coded.groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("dim"),
            F.round(scale, 9).alias("scale"),
            F.sum("q").alias("q_sum"),
            F.sum(F.abs("q")).alias("q_l1"),
            F.sum(F.when(F.abs("q") == 127, 1).otherwise(0))
            .cast("long")
            .alias("n_saturated"),
        )
    )


EMBEDDING_QUANT_SQL = """
WITH scaled AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
              THEN 1.0
              ELSE list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
         END AS scale
  FROM embeddings
  -- zero-length vectors are excluded on BOTH engines: Spark's explode
  -- emits no row for an empty array, so the oracle must drop them too
  WHERE len(embedding::DOUBLE[]) > 0
),
coded AS (
  SELECT vec_id, scale,
         CAST(len(v) AS INTEGER) AS dim,
         list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) AS q
  FROM scaled
)
SELECT vec_id, dim, round(scale, 9) AS scale,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(list_sum(list_transform(q, x -> CASE WHEN abs(x) = 127 THEN 1 ELSE 0 END)) AS BIGINT)
         AS n_saturated
FROM coded
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension): posexplode →
    partial-aggregated sum per (label, pos). The shuffle carries only
    |labels|×dim×|partitions| partial rows (map-side combine), not the
    corpus — the standard distributed-centroid plan (same shape MLlib
    uses inside k-means).

    Exactness: each component is rounded to 9 dp and summed as
    DECIMAL(27,12) — order-independent, so Spark's unordered partial
    aggregation matches DuckDB exactly; the mean divides in DOUBLE."""
    emb = _emb(spark, sf_dir)
    ex = emb.select(
        "label", F.posexplode("vec").alias("pos", "x")
    )
    term = F.round(F.col("x"), 9).cast("decimal(27,12)")
    return (
        ex.withColumn("term", term)
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            # no final round: decimal→double cast and the division are
            # both IEEE-deterministic, so the raw double matches DuckDB
            # bit-for-bit (decimal-rounding a double at 9 dp does NOT —
            # the engines disagree by 1 ulp on edge values)
            (F.sum("term").cast("double") / F.count(F.lit(1))).alias(
                "centroid"
            ),
        )
    )


EMBEDDING_CENTROID_SQL = """
WITH ex AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
)
SELECT label, CAST(pos AS INTEGER) AS pos,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(round(x, 9) AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)
         AS centroid
FROM ex
GROUP BY label, pos
ORDER BY label, pos
"""


# --------------------------------------------------------------------------
def embedding_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outliers: cosine of each vector to its OWN label's
    centroid, z-scored within the label; bottom-20 (least typical) out.
    The mislabeled/contaminated-sample screen a curation pipeline runs
    over an embedded corpus (low cos-to-own-centroid ⇒ the vector sits
    far from its class).

    Scale: the centroid table is |labels|×dim (tiny — broadcast), built
    with the same partial-aggregated posexplode as
    embedding_centroid_by_label; per-label moment stats are another
    |labels|-row broadcast. The corpus is scanned twice (centroid pass,
    scoring pass), never self-joined. Determinism: centroid components
    are exact-decimal means; the cosine fold is the strict
    left-to-right order shared with DuckDB's list_sum (see
    functions/vectors.py); cos rounds to 6 before the exact-decimal
    moment sums; z is one deterministic double expression rounded to 6.
    """
    emb = _emb(spark, sf_dir).filter(F.size("vec") > 0)
    ex = emb.select("label", F.posexplode("vec").alias("pos", "x"))
    term = F.round(F.col("x"), 9).cast("decimal(27,12)")
    cent = (
        ex.withColumn("term", term)
        .groupBy("label", "pos")
        .agg((F.sum("term").cast("double") / F.count(F.lit(1))).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(cosine(F.col("vec"), F.col("cv")), 6).alias("cos"),
    )
    stats = (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cos").cast("decimal(27,6)")).cast("double").alias("s1"),
            F.sum(
                F.round(F.col("cos") * F.col("cos"), 12).cast("decimal(27,12)")
            )
            .cast("double")
            .alias("s2"),
        )
        .select(
            "label",
            (F.col("s1") / F.col("n")).alias("mu"),
            F.sqrt(
                F.greatest(
                    F.col("s2") / F.col("n")
                    - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")),
                    F.lit(0.0),
                )
            ).alias("sigma"),
        )
    )
    z = F.when(
        F.col("sigma") > 0, F.round((F.col("cos") - F.col("mu")) / F.col("sigma"), 6)
    ).otherwise(F.lit(0.0))
    return (
        scored.join(F.broadcast(stats), "label")
        .select("vec_id", "label", "cos", z.alias("z"))
        .orderBy(F.col("z").asc(), F.col("vec_id").asc())
        .limit(20)
    )


EMBEDDING_OUTLIER_SQL = """
WITH emb AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE len(embedding) > 0
),
ex AS (
  SELECT label,
         generate_subscripts(v, 1) - 1 AS pos,
         unnest(v) AS x
  FROM emb
),
cent AS (
  SELECT label, pos,
         CAST(SUM(CAST(round(x, 9) AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, pos
),
centl AS (
  SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label,
         round(
           list_sum(list_transform(range(1, len(e.v) + 1),
                                   i -> e.v[i] * cl.cv[i]))
           / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
              * sqrt(list_sum(list_transform(cl.cv, x -> x * x)))),
           6) AS cos
  FROM emb e JOIN centl cl USING (label)
),
stats AS (
  SELECT label,
         CAST(SUM(CAST(cos AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS mu,
         sqrt(GREATEST(
           CAST(SUM(CAST(round(cos * cos, 12) AS DECIMAL(27,12))) AS DOUBLE)
             / COUNT(*)
           - (CAST(SUM(CAST(cos AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*))
             * (CAST(SUM(CAST(cos AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)),
           0.0)) AS sigma
  FROM scored GROUP BY label
)
SELECT s.vec_id, s.label, s.cos,
       CASE WHEN st.sigma > 0
            THEN round((s.cos - st.mu) / st.sigma, 6) ELSE 0.0 END AS z
FROM scored s JOIN stats st USING (label)
ORDER BY z ASC, s.vec_id ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Exact oracle for the k-means fit (r6): KMEANS_ITERS is a fixed small
# constant, so Lloyd's loop UNROLLS into a chain of CTEs — one
# assignment + one exact-decimal mean per round, then the final
# assignment/report. Every step is already engine-exact: the L2²
# distance is the strict left fold both engines share, assignment
# tie-breaks on (d, cid), means use the DECIMAL(27,6) convention, and
# empty clusters drop out of both engines' mean tables identically.
# The chain is shared with the SemDeDup oracle below: _lloyd_ctes
# returns (ctes ending in the final assignment "af", the final
# centroid CTE's name).
def _lloyd_ctes(init_k_sql: str = str(KMEANS_K)) -> tuple[list, str]:
    l2 = (
        "list_sum(list_transform(range(1, len(e.v)+1), "
        "i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i])))"
    )

    def assign(a: str, c: str) -> str:
        return f"""{a} AS (
  SELECT vec_id, v, cid, d FROM (
    SELECT s.vec_id, s.v, s.cid, s.d,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY s.d ASC, s.cid ASC) AS rn
    FROM (SELECT e.vec_id, e.v, c.cid, {l2} AS d
          FROM emb e CROSS JOIN {c} c) s
  ) WHERE rn = 1
)"""

    def means(c: str, a: str) -> str:
        return f"""{c} AS (
  SELECT cid, list(m ORDER BY i) AS cvec FROM (
    SELECT cid, i,
           CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(x) AS m
    FROM (SELECT cid, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x
          FROM {a})
    GROUP BY cid, i
  ) GROUP BY cid
)"""

    ctes = [
        "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cvec "
        f"FROM emb WHERE vec_id < ({init_k_sql}))",
    ]
    cur = "c0"
    for it in range(KMEANS_ITERS):
        ctes.append(assign(f"a{it}", cur))
        cur = f"c{it + 1}"
        ctes.append(means(cur, f"a{it}"))
    ctes.append(assign("af", cur))
    return ctes, cur


def _kmeans_sql() -> str:
    ctes, _ = _lloyd_ctes()
    return (
        "WITH " + ",\n".join(ctes) + """
SELECT cid, COUNT(*) AS n_points,
       round(CAST(SUM(CAST(round(d, 6) AS DECIMAL(27,6))) AS DOUBLE), 6)
         AS inertia
FROM af GROUP BY cid ORDER BY cid
"""
    )


def _semdedup_sql() -> str:
    """SemDeDup oracle: the unrolled Lloyd's chain (shared with the
    k-means oracle) + final centroid-cosine, the within-cluster pair
    relation at tau, and the edge-wise keep-farthest-from-centroid
    drop rule — all in the engine-exact cosine/rounding convention."""
    # the corpus-proportional K rule, replayed verbatim in SQL
    ctes, cur = _lloyd_ctes(
        f"SELECT GREATEST({KMEANS_K}, COUNT(*) // {SEMDEDUP_CLUSTER_TARGET}) FROM emb"
    )
    dotf = (
        "list_sum(list_transform(range(1, len(x.nv)+1), i -> x.nv[i] * y.nv[i]))"
    )
    ctes.append(f"""ncv AS (
  SELECT cid, list_transform(cvec,
           x -> x / sqrt(list_sum(list_transform(cvec, t -> t*t)))) AS ncvec
  FROM {cur}
)""")
    ctes.append("""nv0 AS (
  SELECT vec_id, cid, v,
         sqrt(list_sum(list_transform(v, t -> t*t))) AS nrm
  FROM af
)""")
    ctes.append(f"""ac AS MATERIALIZED (
  SELECT n.vec_id, n.cid, list_transform(n.v, x -> x / n.nrm) AS nv,
         round(list_sum(list_transform(range(1, len(n.v)+1),
               i -> (n.v[i] / n.nrm) * c.ncvec[i])), 6) AS ccos
  FROM nv0 n JOIN ncv c ON n.cid = c.cid
)""")
    ctes.append(f"""pr AS MATERIALIZED (
  SELECT x.cid, x.vec_id AS ia, x.ccos AS ca, y.vec_id AS ib, y.ccos AS cb
  FROM ac x JOIN ac y ON x.cid = y.cid AND x.vec_id < y.vec_id
  WHERE round({dotf}, 6) >= {SEMDEDUP_TAU}
)""")
    return (
        "WITH " + ",\n".join(ctes) + """,
dropped AS (
  SELECT DISTINCT cid,
         CASE WHEN ca > cb OR (ca = cb AND ia > ib) THEN ia ELSE ib END AS loser
  FROM pr
),
pts AS (SELECT cid, COUNT(*) AS n_points FROM ac GROUP BY cid),
dup AS (SELECT cid, COUNT(*) AS n_dup_pairs FROM pr GROUP BY cid),
drp AS (SELECT cid, COUNT(*) AS n_dropped FROM dropped GROUP BY cid)
SELECT p.cid, CAST(p.n_points AS BIGINT) AS n_points,
       CAST(COALESCE(dup.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(drp.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(p.n_points - COALESCE(drp.n_dropped, 0) AS BIGINT) AS n_kept
FROM pts p
LEFT JOIN dup ON dup.cid = p.cid
LEFT JOIN drp ON drp.cid = p.cid
ORDER BY p.cid
"""
    )


KMEANS_SQL = _kmeans_sql()

# --------------------------------------------------------------------------
# Exact oracles for the approximate ANN paths (r6). Both reproduce the
# approximation itself — the LSH bucketing / IVF cell routing — in
# portable arithmetic, then the in-bucket exact search verbatim.
def _cos_sql(a: str, b: str) -> str:
    """Strict-left-fold cosine of two DOUBLE[] columns (DuckDB)."""
    return f"""
  list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))
  / (sqrt(list_sum(list_transform({a}, x -> x*x)))
     * sqrt(list_sum(list_transform({b}, x -> x*x))))"""


_LSH_SIGN_VALUES = ", ".join(
    f"({b}, {i}, {s})"
    for b, row in enumerate(_LSH_SIGNS)
    for i, s in enumerate(row)
)

ANN_LSH_SQL = f"""
WITH s(b, i, sgn) AS (VALUES {_LSH_SIGN_VALUES}),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bits AS (
  SELECT e.vec_id, s.b,
         CASE WHEN SUM(CAST(floor(e.v[s.i + 1] * {_LSH_QUANT}) AS BIGINT)
                       * s.sgn) > 0
              THEN 1 ELSE 0 END AS bit
  FROM emb e CROSS JOIN s
  GROUP BY e.vec_id, s.b
),
buckets AS (
  SELECT vec_id, CAST(SUM(bit << b) AS INTEGER) AS bucket
  FROM bits GROUP BY vec_id
),
q AS (
  SELECT e.vec_id AS query_id, e.v AS qv, bk.bucket AS qbucket
  FROM emb e JOIN buckets bk USING (vec_id)
  WHERE e.vec_id < {N_QUERIES}
),
cand AS (
  SELECT q.query_id, q.qv, e.vec_id AS neighbor_id, e.v AS nv
  FROM q
  JOIN buckets nb ON nb.bucket = q.qbucket
  JOIN emb e ON e.vec_id = nb.vec_id
  WHERE e.vec_id <> q.query_id
),
scored AS (
  SELECT query_id, neighbor_id, {_cos_sql("qv", "nv")} AS cos
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       round(cos, 6) AS cos
FROM ranked WHERE rank <= {TOP_K}
"""

# Balanced-multiprobe twin: same integer projections, per-bit type-1
# median threshold via histogram+cumsum, probe set = own bucket ∪ all
# 1-bit XOR flips — pure integer arithmetic end to end, so still exact.
# r9 adds the radius-2 mask set (all 2-bit flips too) for the
# higher-recall operating point; both probe lists come from the SAME
# mask functions the Spark queries use and feed one SQL template, so
# the twins cannot drift.
def _probe_list_sql(masks) -> str:
    return ", ".join(
        ["qbucket"] + [f"xor(qbucket, {m})" for m in masks]
    )


_LSH_PROBE_LIST = _probe_list_sql(_mp_masks_r1())

def _multiprobe_sql(probe_list: str) -> str:
    return f"""
WITH s(b, i, sgn) AS (VALUES {_LSH_SIGN_VALUES}),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
proj AS (
  SELECT e.vec_id, s.b,
         SUM(CAST(floor(e.v[s.i + 1] * {_LSH_QUANT}) AS BIGINT) * s.sgn)
           AS p
  FROM emb e CROSS JOIN s
  GROUP BY e.vec_id, s.b
),
hist AS (SELECT b, p, COUNT(*) AS c FROM proj GROUP BY b, p),
sized AS (
  SELECT b, p, c,
         SUM(c) OVER (PARTITION BY b ORDER BY p
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY b) AS tot
  FROM hist
),
thr AS (
  SELECT b, MIN(CASE WHEN cum >= ceil(tot * 0.5) THEN p END) AS t
  FROM sized GROUP BY b
),
buckets AS (
  SELECT proj.vec_id,
         CAST(SUM((CASE WHEN proj.p > thr.t THEN 1 ELSE 0 END) << proj.b)
              AS INTEGER) AS bucket
  FROM proj JOIN thr USING (b)
  GROUP BY proj.vec_id
),
q AS (
  SELECT e.vec_id AS query_id, e.v AS qv, bk.bucket AS qbucket
  FROM emb e JOIN buckets bk USING (vec_id)
  WHERE e.vec_id < {N_QUERIES}
),
probed AS (
  SELECT query_id, qv, unnest([{probe_list}]) AS pbucket FROM q
),
cand AS (
  SELECT p.query_id, p.qv, e.vec_id AS neighbor_id, e.v AS nv
  FROM probed p
  JOIN buckets nb ON nb.bucket = p.pbucket
  JOIN emb e ON e.vec_id = nb.vec_id
  WHERE e.vec_id <> p.query_id
),
scored AS (
  SELECT query_id, neighbor_id, {_cos_sql("qv", "nv")} AS cos
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       round(cos, 6) AS cos
FROM ranked WHERE rank <= {TOP_K}
"""


ANN_LSH_MULTIPROBE_SQL = _multiprobe_sql(_LSH_PROBE_LIST)
ANN_LSH_MULTIPROBE_R2_SQL = _multiprobe_sql(
    _probe_list_sql(_mp_masks_r2())
)

# Multi-table twin: same projections/thresholds machinery with a tbl
# dimension; sign rows come from the SAME _lsh_signs() the Spark UDFs
# use, so the twins cannot drift. Candidate pairs are DISTINCT-ed
# before the cosine re-rank, mirroring the Spark plan.
_LSH_SIGN_VALUES_MT = ", ".join(
    f"({t}, {b}, {i}, {s})"
    for t in range(ANN_TABLES)
    for b, row in enumerate(_lsh_signs(t))
    for i, s in enumerate(row)
)

ANN_MULTITABLE_SQL = f"""
WITH s(tbl, b, i, sgn) AS (VALUES {_LSH_SIGN_VALUES_MT}),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
proj AS (
  SELECT e.vec_id, s.tbl, s.b,
         SUM(CAST(floor(e.v[s.i + 1] * {_LSH_QUANT}) AS BIGINT) * s.sgn)
           AS p
  FROM emb e CROSS JOIN s
  GROUP BY e.vec_id, s.tbl, s.b
),
hist AS (SELECT tbl, b, p, COUNT(*) AS c FROM proj GROUP BY tbl, b, p),
sized AS (
  SELECT tbl, b, p, c,
         SUM(c) OVER (PARTITION BY tbl, b ORDER BY p
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY tbl, b) AS tot
  FROM hist
),
thr AS (
  SELECT tbl, b, MIN(CASE WHEN cum >= ceil(tot * 0.5) THEN p END) AS t
  FROM sized GROUP BY tbl, b
),
buckets AS (
  SELECT proj.vec_id, proj.tbl,
         CAST(SUM((CASE WHEN proj.p > thr.t THEN 1 ELSE 0 END) << proj.b)
              AS INTEGER) AS bucket
  FROM proj JOIN thr USING (tbl, b)
  GROUP BY proj.vec_id, proj.tbl
),
q AS (
  SELECT bk.vec_id AS query_id, bk.tbl, bk.bucket AS qbucket
  FROM buckets bk WHERE bk.vec_id < {N_QUERIES}
),
probed AS (
  SELECT query_id, tbl,
         unnest([{_probe_list_sql(_mp_masks_r2())}]) AS pbucket
  FROM q
),
pairs AS (
  SELECT DISTINCT p.query_id, nb.vec_id AS neighbor_id
  FROM probed p
  JOIN buckets nb ON nb.tbl = p.tbl AND nb.bucket = p.pbucket
  WHERE nb.vec_id <> p.query_id
),
scored AS (
  SELECT pr.query_id, pr.neighbor_id,
         {_cos_sql("qe.v", "ne.v")} AS cos
  FROM pairs pr
  JOIN emb qe ON qe.vec_id = pr.query_id
  JOIN emb ne ON ne.vec_id = pr.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       round(cos, 6) AS cos
FROM ranked WHERE rank <= {TOP_K}
"""

# Recall twin: both underlying answers are exact, so the recall table
# composes their SQL constants directly (no drift possible).
ANN_RECALL_SQL = f"""
WITH bf AS ({ANN_BRUTEFORCE_SQL}),
mt AS ({ANN_MULTITABLE_SQL}),
per AS (
  SELECT bf.query_id,
         CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN mt.neighbor_id IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM bf LEFT JOIN mt
    ON mt.query_id = bf.query_id AND mt.neighbor_id = bf.neighbor_id
  GROUP BY bf.query_id
)
SELECT query_id, n_true, n_hits,
       round(CAST(n_hits AS DOUBLE) / n_true, 6) AS recall
FROM per ORDER BY query_id
"""


def _ann_ivf_mp_sql() -> str:
    """IVF-multiprobe oracle: the unrolled Lloyd's chain at
    K = ANN_IVF_K (shared machinery with the k-means/SemDeDup
    oracles), top-ANN_IVF_PROBES cells per query by centroid cosine,
    then the exact in-cell re-rank verbatim."""
    ctes, cur = _lloyd_ctes(str(ANN_IVF_K))
    return (
        "WITH " + ",\n".join(ctes) + f""",
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}),
qc AS (
  SELECT q.query_id, c.cid, {_cos_sql("q.qv", "c.cvec")} AS ccos
  FROM q CROSS JOIN {cur} c
),
cells AS (
  SELECT query_id, cid FROM (
    SELECT query_id, cid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ccos DESC, cid ASC) AS rn
    FROM qc
  ) WHERE rn <= {ANN_IVF_PROBES}
),
cand AS (
  SELECT ce.query_id, a.vec_id AS neighbor_id
  FROM cells ce JOIN af a ON a.cid = ce.cid
  WHERE a.vec_id <> ce.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {_cos_sql("qe.v", "ne.v")} AS cos
  FROM cand c
  JOIN emb qe ON qe.vec_id = c.query_id
  JOIN emb ne ON ne.vec_id = c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       round(cos, 6) AS cos
FROM ranked WHERE rank <= {TOP_K}
"""
    )


ANN_IVF_MP_SQL = _ann_ivf_mp_sql()

ANN_IVF_RECALL_SQL = f"""
WITH bf AS ({ANN_BRUTEFORCE_SQL}),
mt AS ({ANN_IVF_MP_SQL}),
per AS (
  SELECT bf.query_id,
         CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN mt.neighbor_id IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM bf LEFT JOIN mt
    ON mt.query_id = bf.query_id AND mt.neighbor_id = bf.neighbor_id
  GROUP BY bf.query_id
)
SELECT query_id, n_true, n_hits,
       round(CAST(n_hits AS DOUBLE) / n_true, 6) AS recall
FROM per ORDER BY query_id
"""

ANN_IVF_SQL = f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
ex AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         CAST(SUM(CAST(round(x, 9) AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)
           AS c
  FROM ex GROUP BY label, pos
),
centl AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}),
qc AS (
  SELECT q.query_id, cl.label, {_cos_sql("q.qv", "cl.cv")} AS ccos
  FROM q CROSS JOIN centl cl
),
best AS (
  SELECT query_id, label AS cell FROM (
    SELECT query_id, label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ccos DESC, label ASC) AS rn
    FROM qc
  ) WHERE rn = 1
),
cand AS (
  SELECT b.query_id, q.qv, e.vec_id AS neighbor_id, e.v AS nv
  FROM best b
  JOIN q USING (query_id)
  JOIN emb e ON e.label = b.cell
  WHERE e.vec_id <> b.query_id
),
scored AS (
  SELECT query_id, neighbor_id, {_cos_sql("qv", "nv")} AS cos
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       round(cos, 6) AS cos
FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES = {
    "kmeans_embeddings_report": kmeans_embeddings_report,
    "semdedup_prune_report": semdedup_prune_report,
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_recall_report": ann_recall_report,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_lsh_multiprobe_topk": ann_lsh_multiprobe_topk,
    "ann_multiprobe_r2_topk": ann_multiprobe_r2_topk,
    "ann_multitable_topk": ann_multitable_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_multiprobe_topk": ann_ivf_multiprobe_topk,
    "ann_ivf_recall_report": ann_ivf_recall_report,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "embedding_neardup_lsh": embedding_neardup_lsh,
    "embedding_dedup_clusters": embedding_dedup_clusters,
    "embedding_norm_report": embedding_norm_report,
    "embedding_quantization_report": embedding_quantization_report,
    "embedding_centroid_by_label": embedding_centroid_by_label,
    "embedding_outlier_report": embedding_outlier_report,
}

ORACLES = {
    "semdedup_prune_report": _semdedup_sql(),
    "ann_bruteforce_topk": ANN_BRUTEFORCE_SQL,
    "ann_recall_report": ANN_RECALL_SQL,
    "embedding_neardup_pairs": EMBEDDING_NEARDUP_SQL,
    # The LSH variant is held to the SAME exact-pairs oracle: with
    # 16×2-bit bands the per-pair miss probability is ~3e-4 and the
    # seeded planes make recall deterministic — verified complete on
    # the test corpora, so it must match the exact answer.
    "embedding_neardup_lsh": EMBEDDING_NEARDUP_SQL,
    "embedding_dedup_clusters": EMBEDDING_CLUSTERS_SQL,
    "embedding_norm_report": EMBEDDING_NORM_SQL,
    "embedding_quantization_report": EMBEDDING_QUANT_SQL,
    "embedding_centroid_by_label": EMBEDDING_CENTROID_SQL,
    "embedding_outlier_report": EMBEDDING_OUTLIER_SQL,
    # r6: the approximate ANN paths carry exact oracles — the
    # approximation (portable-hash LSH bucketing / exact-decimal IVF
    # cells) is itself engine-reproducible, so the full result matches.
    "ann_lsh_topk": ANN_LSH_SQL,
    "ann_lsh_multiprobe_topk": ANN_LSH_MULTIPROBE_SQL,
    "ann_multiprobe_r2_topk": ANN_LSH_MULTIPROBE_R2_SQL,
    "ann_multitable_topk": ANN_MULTITABLE_SQL,
    "ann_ivf_topk": ANN_IVF_SQL,
    # r11: the IVF-multiprobe operating point — the Lloyd's fit, cell
    # routing, and re-rank are all engine-exact, so the approximate
    # result carries a full oracle (and the recall table composes it)
    "ann_ivf_multiprobe_topk": ANN_IVF_MP_SQL,
    "ann_ivf_recall_report": ANN_IVF_RECALL_SQL,
    # r6: the Lloyd's fit unrolls (KMEANS_ITERS is a fixed constant)
    # into an exact CTE chain — the last of the graduate-able
    # no_oracle rows
    "kmeans_embeddings_report": KMEANS_SQL,
}
