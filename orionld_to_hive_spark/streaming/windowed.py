"""Watermarked event-time windowed aggregation over the notification
stream.

Extension beyond the reference: the reference is processing-time-only —
it discards `observedAt` at write (reference `subscriber.py:62`) so
late data silently lands in the wrong "hour". Because our ingest keeps
`event_ts` (see ingest.py), the engine can offer real event-time
semantics: tumbling windows on event time + a watermark that bounds
state and defines when a window is final.

Scale stance: windowed streaming aggregation keeps one state row per
(window, room) — state size is O(#rooms × watermark/window), not
O(events). The watermark evicts finalized windows every trigger, so a
1000-executor job's state store stays constant-size under any
throughput. Partial aggregation still applies within each micro-batch
(same map-side combine as batch groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import davg


def windowed_room_stats(
    parsed: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-room tumbling event-time window stats with late-data bound.

    `parsed` is the output of ingest.parse_notifications (streaming or
    static — the lineage is identical, which is how tests assert the
    streamed result equals the batch twin).
    """
    return (
        parsed.withWatermark("event_ts", watermark)
        # group on the window STRUCT — grouping on window.start would
        # sever the watermark association and append mode would refuse
        .groupBy(F.window("event_ts", window), "room")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            davg("temperature", "avg_temperature"),
            F.min("humidity").alias("min_humidity"),
            F.max("brightness").alias("max_brightness"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "room",
            "n_readings",
            "avg_temperature",
            "min_humidity",
            "max_brightness",
        )
    )


def start_windowed_query(
    parsed_stream: DataFrame,
    checkpoint_dir: str,
    query_name: str = "windowed_room_stats",
):
    """Run the windowed aggregate to an in-memory sink (append mode —
    only watermark-finalized windows are emitted), availableNow so
    tests and replays drain the source then stop."""
    agg = windowed_room_stats(parsed_stream)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
