"""Per-key debounce — the reference's one genuinely stateful operator.

Reference semantics (`subscriber.py:21-23,111-118`): events are
processed in arrival order; an event is DROPPED if less than
`delay_seconds` (0.05 s) has passed since the last ACCEPTED event for
the same entity id; accepted events update the entity's last-accepted
time. State lives for the whole run (no timeout).

Two forms with identical per-key logic (`_debounce_pandas`):

  - streaming: `applyInPandasWithState` keyed on the entity column —
    state is the last-accepted arrival time, carried across
    micro-batches;
  - batch: `applyInPandas` — same algorithm over a static frame (used
    for deterministic replay testing and as a batch operator).

The kept-set depends on previous keeps, so this is NOT expressible as
a lag/window query — it is an inherently sequential per-key scan,
which is exactly what the grouped-map Pandas form gives us: one
ordered pass per key, keys distributed across executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _debounce_scan(
    pdf: pd.DataFrame,
    arrival_col: str,
    delay_s: float,
    last_emit: float | None,
    tiebreak_col: str | None = None,
) -> tuple[pd.DataFrame, float | None]:
    """Sequential keep/drop scan in arrival order; returns kept rows and
    the updated last-accepted time.

    Comparisons run in integer MICROSECONDS — Spark timestamps are
    micro-precision, so float arithmetic here would make events exactly
    `delay_s` apart flap on double rounding (~2.4e-7 s at 2020s epochs).
    `last_emit` stays a float epoch-seconds value for the streaming
    state schema; it is re-quantized to micros on entry.

    `tiebreak_col` (r7) pins the order of same-arrival-time rows — the
    kept-set depends on scan order, so without it equal timestamps
    resolve in shuffle order (run-dependent) and the result cannot be
    oracle-diffed. The mergesort is stable, so omitting it preserves
    the pre-r7 behavior exactly.
    """
    sort_cols = [arrival_col] + ([tiebreak_col] if tiebreak_col else [])
    pdf = pdf.sort_values(sort_cols, kind="mergesort")
    arrivals_us = pdf[arrival_col].astype("int64") // 1000  # ns → µs
    delay_us = round(delay_s * 1_000_000)
    last_us = None if last_emit is None else round(last_emit * 1_000_000)
    keep_mask = []
    for t_us in arrivals_us:
        if last_us is None or t_us - last_us >= delay_us:
            keep_mask.append(True)
            last_us = t_us
        else:
            keep_mask.append(False)
    last_emit = None if last_us is None else last_us / 1_000_000
    return pdf[pd.Series(keep_mask, index=pdf.index)], last_emit


def debounce_batch(
    df: DataFrame,
    key_col: str,
    arrival_col: str,
    delay_s: float,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Static-frame debounce via applyInPandas (grouped map)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        kept, _ = _debounce_scan(pdf, arrival_col, delay_s, None, tiebreak_col)
        return kept

    return df.groupBy(key_col).applyInPandas(fn, df.schema)


def debounce_stream(
    df: DataFrame,
    key_col: str,
    arrival_col: str,
    delay_s: float,
) -> DataFrame:
    """Streaming debounce via applyInPandasWithState.

    State = (last_emit: double epoch seconds) per key, no timeout —
    matching the reference's run-lifetime `last_sent` dict.
    """
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("last_emit", T.DoubleType())])

    def fn(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            kept, last = _debounce_scan(pdf, arrival_col, delay_s, last)
            if len(kept):
                yield kept
        if last is not None:
            state.update((float(last),))

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
