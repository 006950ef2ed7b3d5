"""Per-key EWMA anomaly scoring — a second custom stateful operator.

The reference's domain is sensor streams (rooms × temperature/humidity/
brightness); the natural streaming analytic it never built is online
anomaly detection. This operator keeps an exponentially-weighted mean
and variance per key and flags events whose residual exceeds
`threshold · sqrt(ewvar)`:

    resid   = x − ewma
    anomaly = |resid| > threshold·sqrt(ewvar)      (after a warm-up count)
    ewma'   = α·x + (1−α)·ewma
    ewvar'  = α·resid² + (1−α)·ewvar

Like the debounce (reference `subscriber.py:111-118` analog), the score
of an event depends on every prior event of its key, so it is an
inherently sequential per-key scan — NOT expressible as a finite-frame
window. Same two forms, same per-key code path:

  - streaming: `applyInPandasWithState`, state = (ewma, ewvar, n)
    carried across micro-batches, no timeout;
  - batch: `applyInPandas` over a static frame (deterministic replay
    twin — the tests assert stream ≡ batch on the concatenated input).

Scale: keys distribute across executors; state is 3 doubles per key;
each micro-batch is one ordered pandas pass per key — O(batch) work,
O(#keys) state, no shuffle beyond the keyed exchange.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_ALPHA = 0.2
EWMA_THRESHOLD = 3.0
EWMA_WARMUP = 3  # events before anomalies can fire


def _out_schema(df: DataFrame) -> T.StructType:
    return T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("ewma", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )


def _ewma_scan(
    pdf: pd.DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float,
    threshold: float,
    state: tuple[float, float, int] | None,
) -> tuple[pd.DataFrame, tuple[float, float, int]]:
    """Sequential per-key pass in event-time order. Returns the scored
    rows (input columns + ewma-after-update + is_anomaly) and the new
    (ewma, ewvar, n) state."""
    pdf = pdf.sort_values(ts_col, kind="mergesort")
    ewma, ewvar, n = state if state is not None else (0.0, 0.0, 0)
    ewmas, flags = [], []
    for x in pdf[value_col].astype(float):
        if n == 0:
            ewma, ewvar, flag = x, 0.0, False
        else:
            resid = x - ewma
            flag = n >= EWMA_WARMUP and abs(resid) > threshold * math.sqrt(ewvar)
            ewma = alpha * x + (1 - alpha) * ewma
            ewvar = alpha * resid * resid + (1 - alpha) * ewvar
        n += 1
        ewmas.append(ewma)
        flags.append(flag)
    out = pdf.copy()
    out["ewma"] = ewmas
    out["is_anomaly"] = flags
    return out, (float(ewma), float(ewvar), int(n))


def ewma_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = EWMA_ALPHA,
    threshold: float = EWMA_THRESHOLD,
) -> DataFrame:
    """Static-frame twin via applyInPandas (grouped map)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _ewma_scan(pdf, ts_col, value_col, alpha, threshold, None)
        return out

    return df.groupBy(key_col).applyInPandas(fn, _out_schema(df))


def ewma_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = EWMA_ALPHA,
    threshold: float = EWMA_THRESHOLD,
) -> DataFrame:
    """Streaming scorer via applyInPandasWithState; state carried across
    micro-batches for the run's lifetime (NoTimeout, like the debounce)."""
    out_schema = _out_schema(df)
    state_schema = T.StructType(
        [
            T.StructField("ewma", T.DoubleType()),
            T.StructField("ewvar", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        st = tuple(state.get) if state.exists else None
        if st is not None:
            st = (st[0], st[1], int(st[2]))
        for pdf in pdfs:
            out, st = _ewma_scan(pdf, ts_col, value_col, alpha, threshold, st)
            if len(out):
                yield out
        if st is not None:
            state.update((float(st[0]), float(st[1]), int(st[2])))

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
