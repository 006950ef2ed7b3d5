"""Streaming deduplication of redelivered notifications.

The reference's transport is HTTP push with an unconditional 200
(reference `subscriber.py:104-123`): a broker retry after a slow
response redelivers the same notification, and the reference writes it
twice. The Spark-native fix is `dropDuplicatesWithinWatermark` — state
keyed by the reading identity (entity, event time), evicted as soon as
the watermark passes, so memory is O(readings within the watermark
horizon) rather than O(stream history) like a plain dropDuplicates on
a stream would be.

Identity is (entityid, event_ts): a redelivery carries the same entity
and observedAt but a LATER processing-time `ts` — which is exactly why
the dedup must key on event identity, not the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_notifications(
    parsed: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Drop redelivered readings within the watermark horizon.

    Works on the parse_notifications schema; first delivery wins (its
    processing-time `ts` is the one retained). Duplicates arriving
    after the watermark passed the reading's event time are NOT
    suppressed — that is the documented contract of bounded-state
    streaming dedup, and the warehouse's batch MERGE (latest-wins)
    is the backstop for horizon-crossing replays.
    """
    return parsed.withWatermark(
        "event_ts", watermark
    ).dropDuplicatesWithinWatermark(["entityid", "event_ts"])
