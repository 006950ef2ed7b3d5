"""Streaming sessionization with event-time timeouts — custom session
windows over `applyInPandasWithState`.

`F.session_window` (used by the batch `session_window_stats`,
`operators/temporal.py`) covers gap-based sessions natively; this
operator is the ESCAPE HATCH shape for session semantics the built-in
can't express (per-session running aggregates, mid-session emission
rules, session caps), demonstrated with the standard gap rule so the
batch twin and the native window agree and the tests can triangulate
all three.

Twin structure (same as debounce/EWMA/transitions):

  - streaming: state = the key's single OPEN session (start, last_ts,
    n_events, sum_value); events extend or rotate it; sessions whose
    gap closes WITHIN a batch are emitted immediately; the trailing
    open session is emitted when the EVENT-TIME TIMEOUT fires — i.e.
    when the watermark passes last_ts + gap, the exact definition of
    "the session can no longer grow" (no late event can extend it).
  - batch: the same pandas scan per key with no state, emitting every
    session including the trailing one.

Scale: O(#keys) state of four scalars; one keyed exchange per
micro-batch; per-key processing is an ordered pandas scan of that
key's batch slice. Sessions close on watermark progress, so state
does NOT grow with quiet keys (the timeout reaps them) — the property
that makes this viable at 10⁸ keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 30.0

_OUT_FIELDS = [
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
]

# state: open-session scalars, timestamps as epoch µs
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _out_schema(df: DataFrame, key_col: str) -> T.StructType:
    key_field = next(f for f in df.schema.fields if f.name == key_col)
    return T.StructType([key_field] + _OUT_FIELDS)


def _us(series: pd.Series) -> pd.Series:
    return series.astype("datetime64[us]").astype("int64")


def _scan(
    pdf: pd.DataFrame,
    ts_col: str,
    value_col: str,
    gap_us: int,
    open_state: tuple | None,
) -> tuple[list[tuple], tuple | None]:
    """Walk one key's events in event-time order; return (closed
    sessions, open session) as (start_us, last_us, n, sum) tuples."""
    pdf = pdf.sort_values([ts_col], kind="mergesort")
    ts = list(_us(pdf[ts_col]))
    vals = list(pdf[value_col].astype("float64"))
    closed: list[tuple] = []
    cur = open_state
    for t, v in zip(ts, vals):
        if cur is not None and t - cur[1] <= gap_us:
            cur = (cur[0], t, cur[2] + 1, cur[3] + v)
        else:
            if cur is not None:
                closed.append(cur)
            cur = (t, t, 1, v)
    return closed, cur


def _rows(key, sessions: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": [key] * len(sessions),
            "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
            "session_end": pd.to_datetime([s[1] for s in sessions], unit="us"),
            "n_events": [s[2] for s in sessions],
            "sum_value": [round(s[3], 6) for s in sessions],
        }
    )


def sessionize_batch(
    df: DataFrame, key_col: str, ts_col: str, value_col: str,
    gap_s: float = SESSION_GAP_S,
) -> DataFrame:
    """Static twin: every session emitted, including the trailing one."""
    gap_us = int(gap_s * 1_000_000)

    def fn(key, pdf):
        closed, cur = _scan(pdf, ts_col, value_col, gap_us, None)
        if cur is not None:
            closed.append(cur)
        out = _rows(key[0], closed)
        return out.rename(columns={"key": key_col})

    return df.groupBy(key_col).applyInPandas(fn, _out_schema(df, key_col))


def sessionize_stream(
    df: DataFrame, key_col: str, ts_col: str, value_col: str,
    gap_s: float = SESSION_GAP_S, watermark: str = "1 second",
) -> DataFrame:
    """Streaming sessionizer; input gains a watermark on ts_col.

    Emits a session when (a) a later event of the same key opens the
    next session (gap exceeded within data), or (b) the event-time
    timeout fires because the watermark passed last_ts + gap.
    """
    gap_us = int(gap_s * 1_000_000)
    out_schema = _out_schema(df, key_col)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_us, last_us, n, s = state.get
            state.remove()
            out = _rows(key[0], [(start_us, last_us, n, s)])
            yield out.rename(columns={"key": key_col})
            return
        cur = tuple(state.get) if state.exists else None
        closed: list[tuple] = []
        for pdf in pdfs:
            if len(pdf):
                c, cur = _scan(pdf, ts_col, value_col, gap_us, cur)
                closed.extend(c)
        if cur is not None:
            state.update(cur)
            # fires once the watermark proves no event can extend it.
            # Clamp to strictly-after the current watermark: a
            # sufficiently late event can make last_ts + gap <= the
            # watermark (gap 30 s vs 1 s watermark delay), and
            # setTimeoutTimestamp at-or-below the watermark raises an
            # IllegalArgumentException that kills the streaming query.
            timeout_ms = cur[1] // 1000 + int(gap_s * 1000)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
        if closed:
            out = _rows(key[0], closed)
            yield out.rename(columns={"key": key_col})

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
