"""Vector (embedding) column helpers.

Embeddings are plain `array<float>` columns; all math is done in DOUBLE
with JVM-side higher-order functions (`zip_with` + `aggregate`), which
stay inside codegen — no Python in the hot path. The fold is a strict
left-to-right accumulation, the same order DuckDB's list functions use,
so cosine values match the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


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
