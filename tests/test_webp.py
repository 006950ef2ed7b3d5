"""WebP triage units: all three variants, bit-field extremes, the
refusal matrix (inter frames, bad start codes, reserved bits, chunk
overruns), and fuzz."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.webp import (
    encode_webp_extended,
    encode_webp_lossless,
    encode_webp_lossy,
    parse_webp_meta,
)

OK = (ValueError, NotImplementedError)


def test_lossy_roundtrip():
    m = parse_webp_meta(encode_webp_lossy(320, 240, fill=32))
    assert m.fmt == "lossy" and (m.width, m.height) == (320, 240)
    assert not m.has_alpha and not m.has_anim and m.n_chunks == 1


def test_lossless_roundtrip_and_alpha_bit():
    m = parse_webp_meta(encode_webp_lossless(1, 1, alpha=False))
    assert m.fmt == "lossless" and (m.width, m.height) == (1, 1)
    m = parse_webp_meta(encode_webp_lossless(16383, 16383, alpha=True))
    assert (m.width, m.height) == (16383, 16383) and m.has_alpha


def test_extended_variants():
    m = parse_webp_meta(encode_webp_extended(800, 600, alpha=True, anim=False))
    assert m.fmt == "extended" and (m.width, m.height) == (800, 600)
    assert m.has_alpha and not m.has_anim and m.n_chunks == 2
    m = parse_webp_meta(
        encode_webp_extended(64, 64, alpha=False, anim=True, exif=b"II*\x00")
    )
    assert m.has_anim and m.n_chunks == 4  # VP8X + ANIM + ANMF + EXIF


def test_vp8_dims_mask_14_bits():
    # scale bits (top 2) must be masked out of the dims
    raw = bytearray(encode_webp_lossy(100, 50))
    off = raw.index(b"\x9d\x01\x2a") + 3
    w = struct.unpack_from("<H", raw, off)[0]
    struct.pack_into("<H", raw, off, w | 0xC000)  # scale=3
    m = parse_webp_meta(bytes(raw))
    assert (m.width, m.height) == (100, 50)


def test_odd_chunk_padding():
    # fill=15 → odd VP8 chunk size (10 + 15) → pad byte in the walk
    m = parse_webp_meta(encode_webp_lossy(10, 10, fill=15))
    assert m.n_chunks == 1


def test_refusals():
    with pytest.raises(ValueError, match="magic"):
        parse_webp_meta(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="magic"):
        parse_webp_meta(b"")

    base = encode_webp_lossy(20, 20)
    b = bytearray(base)  # RIFF size lies
    struct.pack_into("<I", b, 4, len(base))
    with pytest.raises(ValueError, match="RIFF size"):
        parse_webp_meta(bytes(b))

    b = bytearray(base)  # inter frame: frame_type bit set
    off = len(b) - (len(b) - 20)  # first tag byte is at offset 20
    b[20] |= 0x01
    with pytest.raises(ValueError, match="inter frame"):
        parse_webp_meta(bytes(b))

    b = bytearray(base)  # bad start code
    b[23] ^= 0xFF
    with pytest.raises(ValueError, match="start code"):
        parse_webp_meta(bytes(b))

    b = bytearray(encode_webp_lossless(5, 5, False))  # bad VP8L sig
    b[20] = 0x2E
    with pytest.raises(ValueError, match="VP8L signature"):
        parse_webp_meta(bytes(b))

    b = bytearray(encode_webp_lossless(5, 5, False))  # nonzero version
    bits = struct.unpack_from("<I", b, 21)[0] | (1 << 29)
    struct.pack_into("<I", b, 21, bits)
    with pytest.raises(ValueError, match="version"):
        parse_webp_meta(bytes(b))

    b = bytearray(encode_webp_extended(8, 8, False, False))
    b[20] |= 0x80  # reserved VP8X flag bit
    with pytest.raises(ValueError, match="reserved VP8X"):
        parse_webp_meta(bytes(b))

    # animation flag without an ANIM chunk
    b = bytearray(encode_webp_extended(8, 8, False, False))
    b[20] |= 0x02
    with pytest.raises(ValueError, match="without an ANIM"):
        parse_webp_meta(bytes(b))

    # zero dimension on the lossy path
    with pytest.raises(ValueError, match="zero VP8 dimension"):
        parse_webp_meta(encode_webp_lossy(0, 10))

    # chunk overrun: truncate mid-chunk but fix the RIFF size so the
    # failure is the chunk walk, not the outer frame check
    cut = bytearray(base[:-4])
    struct.pack_into("<I", cut, 4, len(cut) - 8)
    with pytest.raises(ValueError, match="overruns"):
        parse_webp_meta(bytes(cut))


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_webp_random_bytes_never_crash(raw):
    try:
        parse_webp_meta(raw)
    except OK:
        pass


_BASES = [
    encode_webp_lossy(33, 21, fill=13),
    encode_webp_lossless(40, 40, alpha=True),
    encode_webp_extended(12, 34, alpha=True, anim=True, exif=b"MM\x00*"),
]


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_webp_mutated_base_never_crashes(which, pos, xor):
    b = bytearray(_BASES[which])
    b[pos % len(b)] ^= xor
    try:
        parse_webp_meta(bytes(b))
    except OK:
        pass
