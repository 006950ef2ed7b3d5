"""Streaming deduplication — `dropDuplicatesWithinWatermark`.

Complements the batch dedup family (operators/dedup.py) on the live
path: at-least-once sources (retried HTTP notifications, Kafka
redeliveries) produce duplicate entity updates; this drops any row
whose key was already seen within the watermark horizon.

vs. the debounce operator (debounce.py): debounce is a TIME policy
(drop bursts < 50 ms apart, even with different payloads); this is an
IDENTITY policy (drop exact redelivery of the same logical event, no
matter how far apart within the horizon). A real ingest composes both:
dedup first (delivery artifact), then debounce (rate policy).

Scale stance: state is one entry per distinct key within the watermark
window — bounded by key cardinality × horizon, evicted continuously;
far cheaper than an unbounded dropDuplicates whose state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: tuple[str, ...],
    event_ts_col: str,
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same (*key_cols) seen within `horizon`
    of event time. Works only on streaming DataFrames (state-backed)."""
    return stream.withWatermark(event_ts_col, horizon).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
