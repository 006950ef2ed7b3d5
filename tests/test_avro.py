"""Avro OCF walk units: closed-form roundtrips over both codecs,
varint/zigzag edges, the spec's negative-count metadata block form,
sync-marker enforcement, exact block consumption, the refusal matrix
(snappy, bad schema, truncations), and fuzz."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.avro import (
    _MAGIC,
    _SCHEMA_JSON,
    _SYNC,
    _avro_string,
    _zigzag_decode,
    _zigzag_encode,
    encode_avro,
    parse_avro_meta,
)

OK = (ValueError, NotImplementedError)


def test_roundtrip_closed_forms():
    for d in range(10):
        text = "unicode € çhünk %d " % d * (d + 1)
        m = parse_avro_meta(encode_avro(d, text))
        n = 1 + d % 5
        assert m.codec == ("deflate" if d % 2 == 0 else "null")
        assert m.schema_name == "Doc"
        assert m.n_records == n and m.n_blocks == (n + 1) // 2
        assert m.meta_entries == (2 if d % 2 == 0 else 1)
        assert m.body_text == text, d
    assert parse_avro_meta(encode_avro(3, "")).body_text == ""


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_roundtrip(n):
    buf = _zigzag_encode(n)
    got, pos = _zigzag_decode(buf, 0)
    assert got == n and pos == len(buf)


def test_negative_count_metadata_block_form():
    hdr = (
        _MAGIC
        + _zigzag_encode(-1)
        + _zigzag_encode(0)  # byte size (unused by the walk)
        + _avro_string(b"avro.schema")
        + _avro_string(_SCHEMA_JSON.encode())
        + _zigzag_encode(0)
        + _SYNC
    )
    m = parse_avro_meta(bytes(hdr))
    assert m.n_blocks == 0 and m.codec == "null" and m.meta_entries == 1


def test_refusals():
    base = encode_avro(1, "some text for the container")  # null codec

    with pytest.raises(ValueError, match="magic"):
        parse_avro_meta(b"NOTAVRO")
    with pytest.raises(NotImplementedError, match="snappy"):
        raw = base.replace(_SCHEMA_JSON.encode(), _SCHEMA_JSON.encode())
        hdr = (
            _MAGIC
            + _zigzag_encode(2)
            + _avro_string(b"avro.schema") + _avro_string(_SCHEMA_JSON.encode())
            + _avro_string(b"avro.codec") + _avro_string(b"snappy")
            + _zigzag_encode(0)
            + _SYNC
        )
        parse_avro_meta(bytes(hdr))
    with pytest.raises(ValueError, match="schema"):
        parse_avro_meta(
            _MAGIC + _zigzag_encode(0) + _SYNC  # no avro.schema at all
        )
    # corrupt the sync marker after the first data block
    b = bytearray(base)
    sync_at = base.index(_SYNC, 4)  # header sync
    # find the NEXT sync (after block 1) and flip a byte
    next_sync = base.index(_SYNC, sync_at + 16)
    b[next_sync] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        parse_avro_meta(bytes(b))
    # truncated container (the final sync is cut short)
    with pytest.raises(ValueError, match="truncated|bad|sync marker"):
        parse_avro_meta(base[:-3])
    # deflate garbage under the deflate codec
    even = encode_avro(2, "text")
    sync_at = even.index(_SYNC, 4)
    blk = sync_at + 16  # first data block: count varint, size varint
    _, p1 = _zigzag_decode(even, blk)
    size, p2 = _zigzag_decode(even, p1)
    bad = even[:p2] + b"\x00" * size + even[p2 + size :]
    with pytest.raises(ValueError, match="deflate"):
        parse_avro_meta(bad)


def test_block_must_be_consumed_exactly():
    # append a stray byte inside the (null-codec) block and grow the
    # declared size accordingly: records decode but leave residue
    base = encode_avro(1, "abc")  # 2 records, 1 block, null codec
    sync_at = base.index(_SYNC, 4)
    blk = sync_at + 16
    cnt, p1 = _zigzag_decode(base, blk)
    size, p2 = _zigzag_decode(base, p1)
    mutated = (
        base[:p1]
        + _zigzag_encode(size + 1)
        + base[p2 : p2 + size]
        + b"\xee"
        + base[p2 + size :]
    )
    with pytest.raises(ValueError, match="beyond its records"):
        parse_avro_meta(mutated)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_avro_random_bytes_never_crash(raw):
    try:
        parse_avro_meta(raw)
    except OK:
        pass


_BASE = encode_avro(9, "fuzz the avro container " * 3)
_BASE_EVEN = encode_avro(6, "fuzz the deflate container " * 3)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
    st.booleans(),
)
def test_avro_mutated_base_never_crashes(pos, xor, even):
    b = bytearray(_BASE_EVEN if even else _BASE)
    b[pos % len(b)] ^= xor
    try:
        parse_avro_meta(bytes(b))
    except OK:
        pass
    except zlib.error:
        pytest.fail("zlib.error leaked through the decode boundary")
