"""Incrementally-maintained hourly rollup (continuous aggregate).

The reference re-runs its hourly GROUP BY from scratch on every query
(reference `hive.py:55-60`) — at 100 TB that is a full fact-table scan
per dashboard refresh. The streaming-native design maintains the
rollup incrementally: each micro-batch appends MERGEABLE PARTIAL
aggregates (count + exact-decimal sum per (hour, room)), and the
read-time view merges partials with a second tiny aggregate. The same
partial/final split Spark uses internally for every groupBy, made
durable.

Properties:
  - each micro-batch aggregates only its own rows — work per trigger is
    O(batch), never O(history);
  - the rollup table grows by ≤ (#rooms × #hours-touched) rows per
    batch — read-time merge is over partials, not events;
  - partials carry `batch_id`; a foreachBatch retry (at-least-once)
    rewrites identical (batch_id, hour, room) rows, and the read view's
    dropDuplicates on that key restores exactly-once semantics;
  - AVG is derivable because we store (sum, count), not averages —
    averages don't merge (SURVEY §2.4's A8 caveat applies at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import DECIMAL_T


def _partials(batch_df: DataFrame) -> DataFrame:
    dec = F.col("temperature").cast(DECIMAL_T)
    return batch_df.groupBy(
        F.date_trunc("hour", "event_ts").alias("hour"), "room"
    ).agg(
        F.count("temperature").alias("n_partial"),
        F.sum(dec).alias("sum_temp_partial"),
    )


def start_rollup(
    parsed_stream: DataFrame, rollup_path: str, checkpoint_dir: str
):
    """Maintain the rollup from the notification stream, availableNow."""

    def update(batch_df: DataFrame, batch_id: int) -> None:
        _partials(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(rollup_path)

    return (
        parsed_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Merge partials → final (hour, room) stats. The only aggregate a
    dashboard query ever runs — over partials, not the fact table."""
    partials = spark.read.parquet(rollup_path).dropDuplicates(
        ["batch_id", "hour", "room"]
    )
    return (
        partials.groupBy("hour", "room")
        .agg(
            F.sum("n_partial").alias("n_readings"),
            (
                F.sum("sum_temp_partial").cast("double") / F.sum("n_partial")
            ).alias("avg_temperature"),
        )
        .orderBy("hour", "room")
    )
