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


# ---------------------------------------------------------------------------
# curation / sequence operators vs pure-Python references

import math

from orionld_to_hive_spark.operators.analytics import (
    dwell_time_profile,
    event_transition_matrix,
)
from orionld_to_hive_spark.operators.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    doc_chunks,
)

_word = st.text(alphabet="ab", min_size=1, max_size=3)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(st.lists(_word, min_size=1, max_size=150), min_size=1, max_size=4))
def test_doc_chunks_match_python_chunker(spark, tmp_path_factory, docs):
    tmp = tmp_path_factory.mktemp("chunks")
    rows = [
        (i, " ".join(toks), "en", "web", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    got = {
        (r.doc_id, r.chunk_id): r.chunk_text.split(" ")
        for r in doc_chunks(spark, str(tmp)).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        for ci, s in enumerate(range(0, len(toks), CHUNK_STRIDE)):
            want[(i, ci)] = toks[s : s + CHUNK_TOKENS]
    assert got == want


# (user, ts_offset, type) — duplicate timestamps allowed; event_id breaks ties
_ev = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=300),
    st.sampled_from(["a", "b", "c"]),
)


def _write_events(spark, tmp, evs):
    rows = [
        (i, BASE + timedelta(seconds=ts), u, t, 0.0, "{}")
        for i, (u, ts, t) in enumerate(evs)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "events.parquet"))


def _sequences(evs):
    by_user = {}
    for eid, (u, ts, t) in enumerate(evs):
        by_user.setdefault(u, []).append((ts, eid, t))
    return {u: sorted(s) for u, s in by_user.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(evs=st.lists(_ev, min_size=2, max_size=30))
def test_transition_matrix_matches_python_reference(spark, tmp_path_factory, evs):
    tmp = tmp_path_factory.mktemp("trans")
    _write_events(spark, tmp, evs)
    want = {}
    for seq in _sequences(evs).values():
        for (_, _, p), (_, _, n) in zip(seq, seq[1:]):
            want[(p, n)] = want.get((p, n), 0) + 1
    got = {}
    for r in event_transition_matrix(spark, str(tmp)).collect():
        got[(r.prev_type, r.next_type)] = r.n_trans
        row_tot = sum(v for (p, _), v in want.items() if p == r.prev_type)
        assert r.p == round(r.n_trans / row_tot, 6)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(evs=st.lists(_ev, min_size=2, max_size=30))
def test_dwell_quantiles_match_discrete_definition(spark, tmp_path_factory, evs):
    tmp = tmp_path_factory.mktemp("dwell")
    _write_events(spark, tmp, evs)
    gaps_by_type = {}
    for seq in _sequences(evs).values():
        for (ts0, _, p), (ts1, _, _) in zip(seq, seq[1:]):
            gaps_by_type.setdefault(p, []).append((ts1 - ts0) * 1_000_000)

    def dq(vals, q):
        return sorted(vals)[math.ceil(q * len(vals)) - 1]

    rows = {r.prev_type: r for r in dwell_time_profile(spark, str(tmp)).collect()}
    assert set(rows) == set(gaps_by_type)
    for t, gaps in gaps_by_type.items():
        r = rows[t]
        assert r.n_gaps == len(gaps)
        assert r.p50_gap_us == dq(gaps, 0.5)
        assert r.p90_gap_us == dq(gaps, 0.9)
        assert r.max_gap_us == max(gaps)


# ---------------------------------------------------------------------------
# Copy-on-write MERGE vs a pure-Python model of its documented contract
# (merge.py:35-159): latest version_col per key wins across the touched
# slice, keys may move between touched partitions, a partition emptied by
# latest-wins is deleted, and a key moving FROM an untouched partition
# leaves the documented stale duplicate (stability check off). Versions
# are globally distinct by construction — base=1, fresh batch bi=bi+2,
# stale batch bi=-1-bi — because at equal (version, _src) row_number's
# pick is tie-broken arbitrarily and both engines would be guessing.
_mrow = st.tuples(
    st.integers(min_value=1, max_value=6),  # key
    st.sampled_from(["a", "b", "c"]),       # partition
)
_mbatch = st.tuples(
    st.lists(_mrow, min_size=0, max_size=6),
    st.booleans(),  # fresh (version above all prior) vs stale (below base)
)


def _dedupe_by_key(rows):
    return list({k: (k, p) for k, p in rows}.values())


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    base=st.lists(_mrow, min_size=1, max_size=6),
    batches=st.lists(_mbatch, min_size=1, max_size=3),
)
def test_merge_sequences_match_python_model(spark, tmp_path_factory, base, batches):
    from orionld_to_hive_spark.sources.merge import merge_upsert
    from orionld_to_hive_spark.sources.warehouse import write_partitioned

    tmp = tmp_path_factory.mktemp("mergeprop")
    path = str(tmp / "tbl")
    base = _dedupe_by_key(base)
    schema = "id LONG, day STRING, version LONG, value DOUBLE"
    write_partitioned(
        spark.createDataFrame(
            [(k, p, 1, k * 10.0) for k, p in base], schema
        ),
        path,
        partition_cols=("day",),
    )

    table: dict[str, dict[int, tuple[int, float]]] = {}
    for k, p in base:
        table.setdefault(p, {})[k] = (1, k * 10.0)

    for bi, (rows, fresh) in enumerate(batches):
        rows = _dedupe_by_key(rows)
        ver = bi + 2 if fresh else -1 - bi
        updates = spark.createDataFrame(
            [(k, p, ver, k * 100.0 + bi) for k, p in rows], schema
        )
        n = merge_upsert(path, updates, ("id",), "version", ("day",))
        touched = {p for _, p in rows}
        assert n == len(touched)
        if not rows:
            continue
        cands = [
            (k, v, 0, p, val)
            for p in touched
            for k, (v, val) in table.get(p, {}).items()
        ] + [(k, ver, 1, p, k * 100.0 + bi) for k, p in rows]
        best: dict[int, tuple[int, int, str, float]] = {}
        for k, v, src, p, val in cands:
            if k not in best or (v, src) > best[k][:2]:
                best[k] = (v, src, p, val)
        for p in touched:
            table[p] = {}
        for k, (v, _, p, val) in best.items():
            table[p][k] = (v, val)
        for p in [p for p in touched if not table[p]]:
            del table[p]

    want = sorted(
        (k, p, v, val)
        for p, by_key in table.items()
        for k, (v, val) in by_key.items()
    )
    got = sorted(
        (r.id, r.day, r.version, r.value)
        for r in spark.read.parquet(path).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Batch sessionization (windows.py::sessionize_events, 30-min gap rule,
# (ts, event_id) total order) vs a sequential Python scan. Duplicate
# timestamps are generated on purpose: event_id must break the ordering
# tie identically in both implementations.
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(evs=st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user
        st.integers(min_value=0, max_value=7200),     # ts offset seconds
    ),
    min_size=1, max_size=40,
))
def test_sessionize_matches_sequential_scan(spark, tmp_path_factory, evs):
    from orionld_to_hive_spark.operators.windows import sessionize_events

    tmp = tmp_path_factory.mktemp("sess")
    _write_events(spark, tmp, [(u, ts, "a") for u, ts in evs])

    want = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for eid, (u, ts) in enumerate(evs):
        by_user.setdefault(u, []).append((ts, eid))
    for u, seq in by_user.items():
        seq.sort()
        sid = 0
        prev_ts = None
        for ts, _eid in seq:
            if prev_ts is None or ts - prev_ts > 1800:
                sid += 1
                want[(u, sid)] = [ts, ts, 0]
            want[(u, sid)][1] = ts
            want[(u, sid)][2] += 1
            prev_ts = ts

    got = {
        (r.user_id, r.session_id): [
            int((r.session_start - BASE).total_seconds()),
            int((r.session_end - BASE).total_seconds()),
            r.n_events,
        ]
        for r in sessionize_events(spark, str(tmp)).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Portable hash families: the whole point of ((a·k+b) mod p) mod w (and
# the r5 polynomial string hash feeding SimHash) is that an independent
# engine reproduces them bit-for-bit — so an independent PYTHON
# evaluation must too, over arbitrary inputs, not just the corpus.
_ascii_word = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=20,
)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(words=st.lists(_ascii_word, min_size=1, max_size=30, unique=True))
def test_portable_shingle_hash_matches_python(spark, words):
    from orionld_to_hive_spark.operators.dedup import (
        MERSENNE_P,
        _SH_CHUNK_AB,
        _SH_POLY_B,
        _portable_shingle_hash,
    )

    def py_hash(s: str) -> int:
        poly = 0
        for ch in s:
            poly = (poly * _SH_POLY_B + ord(ch)) % MERSENNE_P
        h = 0
        for j, (a, b) in enumerate(_SH_CHUNK_AB):
            h |= (((a * poly + b) % MERSENNE_P) % 65536) << (16 * j)
        return h - (1 << 64) if h >= (1 << 63) else h  # signed 64-bit

    df = spark.createDataFrame([(w,) for w in words], "s STRING")
    got = {
        r.s: r.h
        for r in df.select(
            "s", _portable_shingle_hash(F.col("s")).alias("h")
        ).collect()
    }
    assert got == {w: py_hash(w) for w in words}


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(keys=st.lists(
    st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=30,
    unique=True,
))
def test_countmin_bucket_matches_python(spark, keys):
    from orionld_to_hive_spark.operators.sketches import (
        _CM_HASHES,
        _CM_P,
        _CM_W,
        _cm_bucket,
    )

    a0, b0 = _CM_HASHES[0]
    df = spark.createDataFrame([(k,) for k in keys], "k LONG")
    got = {
        r.k: [r[f"h{i}"] for i in range(len(_CM_HASHES))]
        for r in df.select(
            "k",
            *[
                _cm_bucket(F.col("k"), a, b).alias(f"h{i}")
                for i, (a, b) in enumerate(_CM_HASHES)
            ],
        ).collect()
    }
    want = {
        k: [((a * (k % _CM_P) + b) % _CM_P) % _CM_W for a, b in _CM_HASHES]
        for k in keys
    }
    assert got == want


# ---------------------------------------------------------------------------
# Hour-spine linear interpolation: the DuckDB oracle already pins values
# bit-for-bit on the corpus; this pins the STRUCTURAL contract on
# arbitrary shapes (single-observation types, fully-observed types, long
# edge gaps): complete |types|x|hours| spine, is_interpolated iff the
# (type, hour) had no events, observed rows echo their own value, edge
# rows clamp to the nearest observation, and every interpolated value
# lies within [min, max] of its two neighbors.
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(evs=st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                 # event_type
        st.integers(min_value=0, max_value=48),      # hour offset
        st.integers(min_value=-50, max_value=50),    # value
    ),
    min_size=1, max_size=30,
))
def test_interpolation_structural_contract(spark, tmp_path_factory, evs):
    from orionld_to_hive_spark.operators.temporal import (
        interpolate_hourly_values,
    )

    tmp = tmp_path_factory.mktemp("interp")
    rows = [
        (i, BASE + timedelta(hours=h, minutes=7), 1, t, float(v), "{}")
        for i, (t, h, v) in enumerate(evs)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    observed: dict[tuple[str, int], list[int]] = {}
    for t, h, v in evs:
        observed.setdefault((t, h), []).append(v)
    types = {t for t, _, _ in evs}
    lo = min(h for _, h, _ in evs)
    hi = max(h for _, h, _ in evs)

    out = interpolate_hourly_values(spark, str(tmp)).collect()
    got = {
        (r.event_type, int((r.hour - BASE).total_seconds() // 3600)): r
        for r in out
    }
    assert set(got) == {
        (t, h) for t in types for h in range(lo, hi + 1)
    }
    for (t, h), r in got.items():
        assert r.is_interpolated == ((t, h) not in observed)
        if not r.is_interpolated:
            assert r.v_interp == r.v_obs
            assert r.v_interp == round(
                sum(observed[(t, h)]) / len(observed[(t, h)]), 6
            )
        else:
            assert r.v_obs is None
            obs_hours = sorted(hh for (tt, hh) in observed if tt == t)
            prevs = [hh for hh in obs_hours if hh < h]
            nxts = [hh for hh in obs_hours if hh > h]
            neighbors = []
            if prevs:
                neighbors.append(got[(t, prevs[-1])].v_interp)
            if nxts:
                neighbors.append(got[(t, nxts[0])].v_interp)
            assert neighbors, "spine row outside any observation span"
            eps = 1e-6  # betweenness up to the 6-dp output rounding
            assert min(neighbors) - eps <= r.v_interp <= max(neighbors) + eps


# ---------------------------------------------------------------------------
# Order-insensitive content fingerprint: independent hashlib model.
# Checks the full canonicalization chain (split on ' ', distinct, sort,
# join, sha256) including empty tokens from repeated delimiters and the
# permutation-invariance the operator exists to provide.
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(
    st.lists(st.text(alphabet="abXY.9", min_size=0, max_size=4),
             min_size=1, max_size=12),
    min_size=1, max_size=8,
))
def test_doc_fingerprint_matches_hashlib(spark, tmp_path_factory, docs):
    import hashlib

    from orionld_to_hive_spark.operators.text import doc_fingerprint

    tmp = tmp_path_factory.mktemp("fp")
    rows = [
        (i, " ".join(toks), "en", "web", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    got = {
        r.doc_id: r.fingerprint
        for r in doc_fingerprint(spark, str(tmp)).collect()
    }
    want = {
        i: hashlib.sha256(
            " ".join(sorted(set(" ".join(toks).split(" ")))).encode()
        ).hexdigest()
        for i, toks in enumerate(docs)
    }
    assert got == want
    # permutation invariance: same vocabulary, shuffled order -> same hash
    for i, toks in enumerate(docs):
        rev = " ".join(reversed(" ".join(toks).split(" ")))
        assert want[i] == hashlib.sha256(
            " ".join(sorted(set(rev.split(" ")))).encode()
        ).hexdigest()


# ---------------------------------------------------------------------------
# Streaming CDC apply (streaming/cdc.py) vs a sequential Python replay:
# for ANY changelog split into ANY batch sequence, read_current must be
# the max-version-per-key state with delete-winners absent. (k, version)
# pairs are globally deduped so the model never depends on the row-hash
# tiebreak; order-independence is the point — batches deliver versions
# in whatever order hypothesis picks.
_cdc_row = st.tuples(
    st.integers(min_value=0, max_value=8),  # key
    st.integers(min_value=1, max_value=6),  # version
    st.booleans(),                          # tombstone?
)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    batches=st.lists(
        st.lists(_cdc_row, min_size=0, max_size=10),
        min_size=1,
        max_size=4,
    )
)
def test_cdc_stream_apply_matches_python_replay(
    spark, tmp_path_factory, batches
):
    from orionld_to_hive_spark.streaming.cdc import StreamingCdcApplier

    tmp = tmp_path_factory.mktemp("cdcprop")
    path = str(tmp / "tbl")
    schema = (
        "id LONG, day STRING, version LONG, value DOUBLE, deleted BOOLEAN"
    )
    applier = StreamingCdcApplier(
        path, ("id",), "version", ("day",), "deleted"
    )
    seen: set[tuple[int, int]] = set()
    best: dict[int, tuple[int, bool]] = {}
    any_rows = False
    for bid, rows in enumerate(batches):
        batch = []
        for k, v, d in rows:
            if (k, v) in seen:
                continue
            seen.add((k, v))
            day = "ab"[k % 2]
            val = None if d else float(k * 100 + v)
            batch.append((k, day, v, val, d))
            if k not in best or v > best[k][0]:
                best[k] = (v, d)
        applier.apply_batch(spark.createDataFrame(batch, schema), bid)
        any_rows = any_rows or bool(batch)
    if not any_rows:
        return  # nothing ever delivered: no table to read
    want = sorted(
        (k, "ab"[k % 2], v, float(k * 100 + v))
        for k, (v, d) in best.items()
        if not d
    )
    got = sorted(
        (r.id, r.day, r.version, r.value)
        for r in applier.read_current(spark)
        .select("id", "day", "version", "value")
        .collect()
    )
    assert got == want
    # raw table: exactly one row per key ever delivered (live or tomb)
    raw = spark.read.parquet(path)
    assert raw.count() == len(best)


# ---------------------------------------------------------------------------
# delete_where (sources/merge.py) vs a Python filter: arbitrary tables
# and thresholds — surviving rows are exactly the non-matches, the
# rewrite count is the matching-partition count, and fully-matched
# partitions leave the disk.
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # id (unique)
            st.integers(min_value=0, max_value=2),    # partition pick
            st.integers(min_value=-50, max_value=50), # value
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    ),
    thresh=st.integers(min_value=-50, max_value=50),
)
def test_delete_where_matches_python_filter(
    spark, tmp_path_factory, rows, thresh
):
    from pathlib import Path

    from orionld_to_hive_spark.sources.merge import delete_where
    from orionld_to_hive_spark.sources.warehouse import write_partitioned

    tmp = tmp_path_factory.mktemp("delprop")
    path = str(tmp / "tbl")
    schema = "id LONG, day STRING, version LONG, value DOUBLE"
    data = [(k, "abc"[p], 1, float(v)) for k, p, v in rows]
    write_partitioned(
        spark.createDataFrame(data, schema), path, partition_cols=("day",)
    )
    n = delete_where(spark, path, f"value < {thresh}", ("day",))
    touched = {d for _, d, _, v in data if v < thresh}
    assert n == len(touched)
    want = sorted((k, d, v) for k, d, _, v in data if not v < thresh)
    got = sorted(
        (r.id, r.day, r.value) for r in spark.read.parquet(path).collect()
    ) if want else []
    assert got == want
    for d in {d for _, d, _, _ in data}:
        should_exist = any(dd == d and not v < thresh for _, dd, _, v in data)
        assert (Path(path) / f"day={d}").exists() == should_exist


# ---------------------------------------------------------------------------
# update_where (sources/merge.py) vs a Python map: arbitrary tables,
# thresholds, and a SET that touches two columns — updated rows carry
# the assigned expressions, non-matches (including NULL-predicate rows)
# are byte-identical, and the rewrite count is the matching-partition
# count.
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=2),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    ),
    thresh=st.integers(min_value=-50, max_value=50),
)
def test_update_where_matches_python_map(
    spark, tmp_path_factory, rows, thresh
):
    from orionld_to_hive_spark.sources.merge import update_where
    from orionld_to_hive_spark.sources.warehouse import write_partitioned

    tmp = tmp_path_factory.mktemp("updprop")
    path = str(tmp / "tbl")
    schema = "id LONG, day STRING, version LONG, value DOUBLE"
    data = [
        (k, "abc"[p], 1, float(v) if v is not None else None)
        for k, p, v in rows
    ]
    write_partitioned(
        spark.createDataFrame(data, schema), path, partition_cols=("day",)
    )
    n = update_where(
        spark,
        path,
        f"value >= {thresh}",
        {"value": "value * 2 + 1", "version": "version + 1"},
        ("day",),
    )
    hit = lambda v: v is not None and v >= thresh  # NULL: not matched
    assert n == len({d for _, d, _, v in data if hit(v)})
    want = sorted(
        (k, d, 2 if hit(v) else 1, v * 2 + 1 if hit(v) else v)
        for k, d, _, v in data
    )
    got = sorted(
        (r.id, r.day, r.version, r.value)
        for r in spark.read.parquet(path).collect()
    )
    assert got == want
