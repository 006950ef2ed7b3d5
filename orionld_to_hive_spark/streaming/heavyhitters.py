"""Streaming heavy hitters: a space-saving (Metwally et al. 2005)
top-K sketch per key, maintained across micro-batches with
`applyInPandasWithState` — the custom-sketch stateful operator the
reference's Hive stack could never express.

Semantics: per group key (e.g. event_type), track the most frequent
values (e.g. user_id) in O(capacity) state regardless of stream
cardinality. Space-saving guarantees: every true count c_v is bounded
by est - err <= c_v <= est for its counter, and any value with true
count > N/capacity is present. When capacity >= distinct values the
sketch is EXACT — the unit tests exploit this for a stream ≡ batch
equality, and separately check the bounded-state + guarantee
properties under eviction.

Scale: state is two arrays of `capacity` entries per key — constant
memory per key however long the stream runs; one keyed exchange per
micro-batch; each batch folds partition-locally in pandas before
touching state.

Same twin structure as debounce/EWMA/lag: `heavyhitters_batch` is the
deterministic replay twin over a static frame.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_CAPACITY = 8  # counters per key (the "k" of space-saving)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("item", T.LongType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("max_err", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
    ]
)


def _fold(
    items: list[int],
    counters: dict[int, tuple[int, int]],
    capacity: int,
) -> dict[int, tuple[int, int]]:
    """Space-saving update: counters maps item -> (count, err)."""
    for it in items:
        it = int(it)
        if it in counters:
            c, e = counters[it]
            counters[it] = (c + 1, e)
        elif len(counters) < capacity:
            counters[it] = (1, 0)
        else:
            # evict the (deterministically smallest) min-count counter
            victim = min(counters, key=lambda k: (counters[k][0], k))
            vc, _ = counters.pop(victim)
            counters[it] = (vc + 1, vc)
    return counters


def _emit(key: str, counters: dict[int, tuple[int, int]]) -> pd.DataFrame:
    rows = sorted(
        ((it, c, e) for it, (c, e) in counters.items()),
        key=lambda r: (-r[1], r[0]),
    )
    return pd.DataFrame(
        {
            "key": [key] * len(rows),
            "item": [r[0] for r in rows],
            "est_count": [r[1] for r in rows],
            "max_err": [r[2] for r in rows],
        }
    )


def heavyhitters_batch(
    df: DataFrame,
    key_col: str,
    item_col: str,
    ts_col: str,
    capacity: int = HH_CAPACITY,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Static-frame twin: one space-saving pass per key in event-time
    order (sorted, event order = arrival order of the replayed
    stream). Pass `tiebreak_col` (e.g. an event id) to pin the fold
    order of equal-timestamp rows — sketch eviction is order-sensitive,
    so without it results can differ run-to-run on ts ties."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
        pdf = pdf.sort_values(cols, kind="mergesort")
        counters = _fold(list(pdf[item_col]), {}, capacity)
        return _emit(str(pdf[key_col].iloc[0]), counters)

    return df.groupBy(key_col).applyInPandas(fn, _OUT_SCHEMA)


def heavyhitters_stream(
    df: DataFrame,
    key_col: str,
    item_col: str,
    ts_col: str,
    capacity: int = HH_CAPACITY,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming sketch; state = the counter arrays, carried across
    micro-batches (NoTimeout — heavy hitters accumulate for the run's
    lifetime). Output mode `update`: each batch re-emits the key's
    current top-K estimate. `tiebreak_col` pins equal-ts fold order
    (see heavyhitters_batch)."""

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            items, counts, errs = state.get
            counters = {
                int(i): (int(c), int(e))
                for i, c, e in zip(items, counts, errs)
            }
        else:
            counters = {}
        for pdf in pdfs:
            cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(cols, kind="mergesort")
            counters = _fold(list(pdf[item_col]), counters, capacity)
        its = sorted(counters)
        state.update(
            (
                [int(i) for i in its],
                [int(counters[i][0]) for i in its],
                [int(counters[i][1]) for i in its],
            )
        )
        yield _emit(str(key[0]), counters)

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
