"""Vector (embedding) column helpers.

Embeddings are plain `array<float>` columns; all math is done in DOUBLE
with JVM-side expressions — no Python in the hot path. The widening
cast is a plain array Cast (codegen); dot/norm use higher-order folds,
which evaluate interpreted but keep a strict left-to-right accumulation
order — the same order DuckDB's list functions use — so cosine values
match the oracle bit-for-bit (don't "optimize" these into a different
association order; bulk scoring paths use the Arrow-batched numpy
kernels in `operators/similarity.py` instead).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|·|b|) — same association order as the DuckDB oracle
    (`dot / (sqrt(na) * sqrt(nb))`)."""
    return dot(a, b) / (norm2(a) * norm2(b))


# r14 measured-and-REJECTED: statically unrolled fixed-dim codegen
# twins of these folds (64-term left-associated Add chains, bit-exact
# op order, per-row fold fallback off-dim). Interleaved A/B: 0.39× on
# the bruteforce top-k, embedding_neardup_pairs ~0.5 s → ~32 s — the
# ~600-node expression tree per cosine generates code slower than the
# interpreted fold. Details at the decision note in
# operators/similarity.py; don't retry without new evidence.
