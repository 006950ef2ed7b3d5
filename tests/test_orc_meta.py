"""ORC postscript/footer walk units: pyarrow-writer agreement,
closed forms, the stripe/footer row cross-check, refusal matrix
(compressed footers, bad magic, truncations), and fuzz."""

from __future__ import annotations

import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.orc_meta import (
    encode_orc,
    parse_orc_meta,
)

OK = (ValueError, NotImplementedError)


def test_roundtrip_closed_forms_and_pyarrow_agreement():
    import pyarrow.orc as orc

    for d in range(10):
        text = "órc çhunk €%d " % d * (d + 1)
        raw = encode_orc(d, text)
        m = parse_orc_meta(raw)
        n = 1 + d % 5
        assert m.compression == "NONE"
        assert (m.n_rows, m.n_stripes) == (n, 1)
        assert m.n_leaf_columns == 2 and m.field_names == "id,chunk"
        f = orc.ORCFile(io.BytesIO(raw))
        assert f.nrows == m.n_rows and f.nstripes == m.n_stripes


def test_multi_stripe_rows_cross_check():
    # force several stripes via a tiny stripe size and verify the
    # walker's Σ-stripe-rows ≡ footer-rows invariant on real output
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({"id": pa.array(range(100_000), pa.int64())})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="uncompressed",
                    stripe_size=64 * 1024)
    m = parse_orc_meta(buf.getvalue())
    assert m.n_rows == 100_000
    assert m.n_stripes == orc.ORCFile(io.BytesIO(buf.getvalue())).nstripes
    assert m.n_stripes > 1
    assert m.n_leaf_columns == 1 and m.field_names == "id"


def test_compressed_footer_refuses():
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64())})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zlib")
    with pytest.raises(NotImplementedError, match="ZLIB"):
        parse_orc_meta(buf.getvalue())


def test_refusals():
    base = encode_orc(1, "payload text")
    with pytest.raises(ValueError, match="too short"):
        parse_orc_meta(b"OR")
    # corrupt the trailing magic inside the postscript
    b = bytearray(base)
    i = bytes(b).rindex(b"ORC")
    b[i] = ord("X")
    with pytest.raises(ValueError, match="magic"):
        parse_orc_meta(bytes(b))
    # postscript length byte overruns the file
    with pytest.raises(ValueError, match="overruns"):
        parse_orc_meta(base[:-1] + bytes([250]))


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_orc_random_bytes_never_crash(raw):
    try:
        parse_orc_meta(raw)
    except OK:
        pass


_BASE = encode_orc(7, "fuzz the orc container " * 3)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_orc_mutated_base_never_crashes(pos, xor):
    b = bytearray(_BASE)
    b[pos % len(b)] ^= xor
    try:
        parse_orc_meta(bytes(b))
    except OK:
        pass
