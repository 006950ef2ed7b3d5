"""Property-based tests for the r9 operators: the JPEG flat-block
codec and the overlapping exact-substring rewrite must agree with
independent reference implementations on ARBITRARY inputs, not just
the corpus shapes the oracle diff exercises (duplicate-free docs,
natural text). Spark examples are capped low per the repo convention;
the codec property is pure Python and runs many."""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.dedup import (
    EXACT_SUBSTR_K,
    _substr_cut,
    _substr_dups,
)
from orionld_to_hive_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_color_flat,
    encode_jpeg_gray_flat,
    parse_jpeg_dims,
)


@settings(max_examples=60, deadline=None)
@given(raw=st.lists(st.integers(0, 255), min_size=0, max_size=200))
def test_jpeg_gray_flat_roundtrip_property(raw):
    """Every byte sequence survives encode→decode exactly (flat blocks
    under DC-quant 8 are lossless by construction), zero-padded to
    full block rows; the header dims pass agrees with the decode."""
    arr = np.array(raw, dtype=np.uint8)
    payload = encode_jpeg_gray_flat(arr)
    img = decode_jpeg(payload)
    assert parse_jpeg_dims(payload) == (img.width, img.height, 1)
    grid = img.samples.reshape(img.height // 8, 8, img.width // 8, 8)
    n_blocks = (img.height // 8) * (img.width // 8)
    padded = np.zeros(n_blocks, dtype=np.uint8)
    padded[: len(arr)] = arr
    for i, b in enumerate(padded):
        assert (grid[i // 4, :, i % 4, :] == b).all()


@settings(max_examples=25, deadline=None)
@given(raw=st.lists(st.integers(0, 255), min_size=0, max_size=60))
def test_jpeg_color_flat_closed_form_property(raw):
    arr = np.array(raw, dtype=np.uint8)
    img = decode_jpeg(encode_jpeg_color_flat(arr))
    assert img.channels == 3
    rgb = img.samples.reshape(img.height // 8, 8, img.width // 8, 8, 3)
    n_blocks = (img.height // 8) * (img.width // 8)
    padded = np.zeros(n_blocks, dtype=np.uint8)
    padded[: len(arr)] = arr
    for i, b in enumerate(padded):
        b = int(b)
        want = (max(0, b - 14), b, min(255, b + 35))
        assert (rgb[i // 4, :, i % 4, :, :] == want).all()


def _substr_model(rows, k=EXACT_SUBSTR_K):
    """Independent pure-Python model of the keep-first overlap-cut
    semantics: global first occurrence by (doc_id, pos) survives,
    every later occurrence of a duplicated gram covers its window."""
    toks = {d: t.split(" ") for d, t in rows}
    occ = []
    first = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - k + 1):
            g = " ".join(ts[p : p + k])
            occ.append((g, d, p))
            if g not in first:
                first[g] = (d, p)
    cnt = Counter(g for g, _, _ in occ)
    covered = {d: set() for d in toks}
    for g, d, p in occ:
        if cnt[g] > 1 and first[g] != (d, p):
            covered[d].update(range(p, p + k))
    out = []
    for d, ts in toks.items():
        kept = [t for i, t in enumerate(ts) if i not in covered[d]]
        out.append((d, len(ts), len(ts) - len(kept), " ".join(kept)))
    return sorted(out)


# token lists over a 2-symbol alphabet: 8-gram collisions (within and
# across docs) are common, which is exactly the regime the fixed
# corpus never produces
_doc = st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=25)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=st.lists(_doc, min_size=1, max_size=5))
def test_exact_substr_rewrite_matches_model(spark, docs):
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    frame = df.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    got = sorted(
        tuple(r)
        for r in _substr_cut(frame, _substr_dups(frame)).collect()
    )
    assert got == _substr_model(rows)
