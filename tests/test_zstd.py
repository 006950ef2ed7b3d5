"""zstd frame-walk units: closed-form roundtrips, FCS bias, RLE/Raw
reassembly, skippable frames, the refusal matrix, and fuzz. Pure
header/block arithmetic — no zstd library exists in this container,
which is the operator's point."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.zstd import (
    _MAGIC,
    _block_header,
    encode_zstd,
    parse_zstd_meta,
)

OK = (ValueError, NotImplementedError)


def test_roundtrip_closed_forms():
    text = b"zstd stream body " * 100  # 1700 bytes → 2 raw blocks
    m = parse_zstd_meta(encode_zstd(6, text))  # even+%3: skippable+checksum
    assert m.n_frames == 2 and m.n_skippable == 1
    assert m.n_blocks == 2 + 1  # two raw + one rle
    rle = 6 % 9 + 1
    assert m.content_bytes == len(text) + rle
    assert m.declared_bytes == len(text) + rle
    assert m.checksum_frames == 1
    assert m.decoded == text + b"!" * rle

    m = parse_zstd_meta(encode_zstd(7, b"x"))  # odd, no checksum
    assert m.n_frames == 1 and m.n_skippable == 0 and m.checksum_frames == 0
    assert m.decoded == b"x" + b"!" * (7 % 9 + 1)


def test_empty_text():
    m = parse_zstd_meta(encode_zstd(1, b""))
    assert m.n_blocks == 2  # one empty raw + rle
    assert m.decoded == b"!" * 2


def test_two_byte_fcs_bias():
    # hand-build a frame with FCS flag 1 (2 bytes, biased +256)
    content = bytes(300)
    frame = (
        _MAGIC.to_bytes(4, "little")
        + bytes([(1 << 6) | 0x20])  # single segment + 2-byte FCS
        + (300 - 256).to_bytes(2, "little")
        + _block_header(True, 0, 300)
        + content
    )
    (f,) = [f for f in [parse_zstd_meta(frame)] ]
    assert f.content_bytes == 300 and f.declared_bytes == 300


def test_compressed_blocks_walked_opaquely():
    # Raw + Compressed + RLE: sizes known from headers, content opaque
    frame = (
        _MAGIC.to_bytes(4, "little")
        + bytes([0x20 | (0 << 6)])  # single segment, 1-byte FCS
        + (0).to_bytes(1, "little")  # declared 0 — ignored when opaque
        + _block_header(False, 0, 4) + b"abcd"
        + _block_header(False, 2, 10) + bytes(10)  # opaque compressed
        + _block_header(True, 1, 3) + b"z"
    )
    m = parse_zstd_meta(frame)
    assert m.n_blocks == 3
    assert m.decoded == b""  # opaque frame contributes no decoded bytes
    assert m.content_bytes == 0


def test_refusals():
    good = encode_zstd(5, b"hello")

    with pytest.raises(ValueError, match="magic"):
        parse_zstd_meta(b"\x00\x00\x00\x00rest")
    with pytest.raises(ValueError, match="truncated u32"):
        parse_zstd_meta(b"\x28")
    with pytest.raises(ValueError, match="empty"):
        parse_zstd_meta(b"")

    b = bytearray(good)  # reserved frame-header bit
    b[4] |= 0x08
    with pytest.raises(ValueError, match="reserved frame-header"):
        parse_zstd_meta(bytes(b))

    # reserved block type 3 (first block header starts after magic+fhd+fcs8)
    off = 4 + 1 + 8
    b = bytearray(good)
    hdr = int.from_bytes(b[off : off + 3], "little") | 0x6
    b[off : off + 3] = hdr.to_bytes(3, "little")
    with pytest.raises(ValueError, match="reserved block type"):
        parse_zstd_meta(bytes(b))

    # FCS lies about the decoded size
    b = bytearray(good)
    b[5] ^= 0x01
    with pytest.raises(ValueError, match="declared content size"):
        parse_zstd_meta(bytes(b))

    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_zstd_meta(good[:-3])

    # skippable frame that overruns
    sk = (0x184D2A50).to_bytes(4, "little") + (100).to_bytes(4, "little") + b"xx"
    with pytest.raises(ValueError, match="skippable frame overruns"):
        parse_zstd_meta(sk)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=3000), st.integers(min_value=0, max_value=50))
def test_zstd_roundtrip_arbitrary_bytes(data, doc_id):
    m = parse_zstd_meta(encode_zstd(doc_id, data))
    rle = doc_id % 9 + 1
    assert m.decoded == data + b"!" * rle
    assert m.content_bytes == len(data) + rle


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_zstd_random_bytes_never_crash(raw):
    try:
        parse_zstd_meta(raw)
    except OK:
        pass


_BASE = encode_zstd(9, b"fuzz zstd base " * 10)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_zstd_mutated_base_never_crashes(pos, xor):
    b = bytearray(_BASE)
    b[pos % len(b)] ^= xor
    try:
        parse_zstd_meta(bytes(b))
    except OK:
        pass
