"""Property-based tests (hypothesis): the custom operators must agree
with independent reference implementations on arbitrary inputs — not
just the fixed testdata distributions the oracle diff exercises.

Spark jobs per example are expensive, so examples are capped low; the
value is the input-shape coverage (duplicates, empty sides, ties,
single-key bursts), not the example count.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.temporal import asof_join
from orionld_to_hive_spark.streaming.debounce import debounce_batch

BASE = datetime(2024, 1, 1)

# (key, ts_offset_seconds, value)
_row = st.tuples(
    st.sampled_from(["k1", "k2", "k3"]),
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=-100, max_value=100),
)


def _unique_by_key_ts(rows):
    seen = {}
    for k, ts, v in rows:
        seen[(k, ts)] = v
    return [(k, ts, v) for (k, ts), v in seen.items()]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=st.lists(_row, min_size=0, max_size=15),
    right=st.lists(_row, min_size=0, max_size=15),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    left = _unique_by_key_ts(left)
    right = _unique_by_key_ts(right)

    def frame(rows, vcol):
        return pd.DataFrame(
            {
                "key": [r[0] for r in rows],
                "ts": [BASE + timedelta(seconds=r[1]) for r in rows],
                vcol: [float(r[2]) for r in rows],
            }
        )

    lpdf, rpdf = frame(left, "lval"), frame(right, "rval")
    schema_l = "key string, ts timestamp, lval double"
    schema_r = "key string, ts timestamp, rval double"
    ldf = spark.createDataFrame(lpdf, schema_l) if left else spark.createDataFrame([], schema_l)
    rdf = spark.createDataFrame(rpdf, schema_r) if right else spark.createDataFrame([], schema_r)

    got = (
        asof_join(ldf, rdf, key="key", ts="ts", value_cols=("rval",))
        .select("key", "ts", "lval", "asof_ts", "asof_rval")
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )

    if left and right:
        exp = pd.merge_asof(
            lpdf.sort_values("ts"),
            rpdf.sort_values("ts"),
            on="ts",
            by="key",
            direction="backward",
        )
        exp = exp[exp["rval"].notna()]  # inner semantics: drop no-match rows
    else:
        exp = pd.DataFrame(columns=["key", "ts", "lval", "rval"])
    exp = exp.sort_values(["key", "ts"]).reset_index(drop=True)

    assert len(got) == len(exp)
    for i in range(len(exp)):
        assert got.loc[i, "key"] == exp.loc[i, "key"]
        assert got.loc[i, "ts"] == exp.loc[i, "ts"]
        assert got.loc[i, "asof_rval"] == exp.loc[i, "rval"]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    arrivals=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=1000),  # milliseconds
        ),
        min_size=0,
        max_size=20,
        unique=True,
    )
)
def test_debounce_matches_sequential_scan(spark, arrivals):
    """The distributed debounce must equal the reference's sequential
    per-entity scan (keep iff >= 50ms since last KEPT event).

    Timestamps are built from exact integer microseconds (Spark's
    timestamp precision) so the >= boundary at exactly 50ms is
    deterministic, matching the operator's integer-µs comparison.
    """
    rows = [
        (k, 1700000000_000_000 + ms * 1000, float(i))
        for i, (k, ms) in enumerate(arrivals)
    ]
    schema = "entityid string, arrival_us long, value double"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    ).withColumn("arrival_ts", F.timestamp_micros("arrival_us"))

    got = sorted(
        (r.entityid, r.value)
        for r in debounce_batch(df, "entityid", "arrival_ts", 0.05).collect()
    )

    expected = []
    last_kept: dict[str, int] = {}
    for k, arr_us, v in sorted(rows, key=lambda r: (r[0], r[1])):
        if k not in last_kept or arr_us - last_kept[k] >= 50_000:
            last_kept[k] = arr_us
            expected.append((k, v))
    assert got == sorted(expected)
