"""Latest-wins upsert view — the reference's T5 entity-upsert semantics
without MERGE.

The reference PATCHes the broker and overwrites HBase cells per rowkey,
so "current state" = last write per entity (`subscriber.py:79-90`,
`real_time_data_simulator.py:62-111`). Plain parquet has no MERGE; the
scale-correct equivalent is append-only storage + a latest-per-key view
(row_number over ts desc), optionally compacted periodically.

At 100 TB: the view costs one shuffle on entityid; periodic compaction
(`compact_latest`) amortizes it away for readers — the same
append+compact pattern Delta/Iceberg implement natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def latest_state(df: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """One row per key: the most recent by order_col (deterministic
    tie-break on all remaining columns via a stable struct max would
    over-constrain; ties are broken by descending order_col only, which
    suffices for monotonic processing-time stamps)."""
    w = W.partitionBy(key_col).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact_latest(
    spark: SparkSession,
    table_path: str,
    out_path: str,
    key_col: str = "entityid",
    order_col: str = "ts",
) -> DataFrame:
    """Materialize the latest-wins view (reader-side amortization)."""
    df = spark.read.parquet(table_path)
    latest = latest_state(df, key_col, order_col)
    latest.write.mode("overwrite").parquet(out_path)
    return latest
