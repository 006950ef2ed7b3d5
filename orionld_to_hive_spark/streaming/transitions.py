"""Streaming lag: attach each event's per-key PREDECESSOR attribute as
it arrives — the streaming analog of `lag() OVER (PARTITION BY key
ORDER BY ts)`, which no finite watermark-window expresses because the
predecessor may be arbitrarily far in the past.

Use case mirrored from the batch side: the Markov event-transition
matrix (`operators/analytics.py::event_transition_matrix`) becomes a
live dashboard by feeding this operator's (prev_type, type) pairs into
any downstream streaming aggregate.

Same twin structure as the debounce and EWMA operators (reference
`subscriber.py:111-118` is the per-key-state precedent):

  - streaming: `applyInPandasWithState`, state = the key's last seen
    attribute (one string per key), carried across micro-batches;
  - batch: `applyInPandas` over a static frame — the deterministic
    replay twin the tests compare against, plus against the pure
    window-lag formulation.

Scale: O(#keys) state of one value each, one keyed exchange, one
ordered pandas pass per key per micro-batch. Events are processed in
event-time order WITHIN a micro-batch (sorted), in arrival order
across micro-batches — the same at-arrival contract as the debounce.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _out_schema(df: DataFrame, type_col: str) -> T.StructType:
    src = {f.name: f for f in df.schema.fields}
    return T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"prev_{type_col}", src[type_col].dataType)]
    )


def _scan(
    pdf: pd.DataFrame,
    ts_col: str,
    type_col: str,
    last: str | None,
    tiebreak_col: str | None = None,
) -> tuple[pd.DataFrame, str | None]:
    # rows with equal timestamps would otherwise keep Spark's
    # nondeterministic shuffle order — sort by (ts, tiebreak) so
    # prev-attribution is stable run-to-run and batch ≡ stream
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    pdf = pdf.sort_values(sort_cols, kind="mergesort")
    vals = list(pdf[type_col])
    out = pdf.copy()
    out[f"prev_{type_col}"] = [last] + vals[:-1]
    return out, (vals[-1] if vals else last)


def transitions_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Static-frame twin via applyInPandas (grouped map)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _scan(pdf, ts_col, type_col, None, tiebreak_col)
        return out

    return df.groupBy(key_col).applyInPandas(fn, _out_schema(df, type_col))


def transitions_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming lag via applyInPandasWithState (NoTimeout: a key's
    predecessor stays valid however long it goes quiet)."""
    out_schema = _out_schema(df, type_col)
    state_schema = T.StructType([T.StructField("last", T.StringType())])

    def fn(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            out, last = _scan(pdf, ts_col, type_col, last, tiebreak_col)
            if len(out):
                yield out
        if last is not None:
            state.update((last,))

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
