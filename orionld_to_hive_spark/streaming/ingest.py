"""Streaming ingestion — the Spark-native replacement for the
reference's Flask subscriber (reference `subscriber.py`).

The reference receives NGSI-LD notifications over HTTP, throttles
per-entity, queues, and writes rows to HBase with 3 worker threads
(S6/T1/T2/T3). Spark has no native HTTP push source, so the transport
adapter is a file-drop (or Kafka) of notification JSON — the same
out-of-engine shim role Flask played. Everything after transport is
engine code:

  readStream(json, NGSI schema)            # S6
    → explode(data[])                      # T1: batched entity updates
    → normalize to readings rows           # F11: Property.value extraction
    → keyed debounce (applyInPandasWithState)   # T2, see debounce.py
    → writeStream.foreachBatch(append parquet)  # S4, checkpointed

Checkpointing upgrades the reference's at-most-once delivery (HTTP 200
regardless of write outcome, `subscriber.py:123`) to exactly-once into
the warehouse.

Timestamp semantics (T4): the reference DISCARDS the event's observedAt
and stamps arrival time (`subscriber.py:62`). We keep both: `ts` is
processing time (parity), `event_ts` carries observedAt (fixing the
silent data loss; enables watermarked event-time ops as an extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.schemas import NGSI_NOTIFICATION_SCHEMA, SENSORS


def parse_notifications(df: DataFrame) -> DataFrame:
    """Notification envelope → one readings-shaped row per entity.

    Works identically on static and streaming frames (same lineage is
    used by tests and the live stream).
    """
    entity = F.explode("data").alias("entity")
    exploded = df.select("subscriptionId", entity)
    cols = [
        F.lower(F.col("entity.type")).alias("room"),
        F.col("entity.id").alias("entityid"),
        F.col("entity.temperature.value").alias("temperature"),
        F.col("entity.humidity.value").cast("int").alias("humidity"),
        F.col("entity.brightness.value").alias("brightness"),
        # processing-time stamp (T4 parity)
        F.current_timestamp().alias("ts"),
        # earliest observedAt across present attributes → event time
        F.coalesce(
            *[F.to_timestamp(F.col(f"entity.{s}.observedAt")) for s in SENSORS]
        ).alias("event_ts"),
    ]
    return exploded.select(*cols)


def read_notification_stream(
    spark: SparkSession, in_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    raw = (
        spark.readStream.schema(NGSI_NOTIFICATION_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(in_dir)
    )
    return parse_notifications(raw)


def start_ingest(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the notification stream into the parquet warehouse.

    foreachBatch + checkpoint = exactly-once appends; partitioned by
    room like the batch path so downstream queries prune identically.
    """
    parsed = read_notification_stream(spark, in_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy("room")
            .parquet(out_path)
        )

    writer = (
        parsed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
