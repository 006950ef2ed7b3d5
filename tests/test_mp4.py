"""ISO-BMFF metadata-walk units: hand-built box streams pin 64-bit
sizes, size-0 (to-end) boxes, mvhd v0/v1, unknown-box skipping, and
the malformed-container refusals; fuzz pins the crash-free contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.mp4 import (
    Mp4Meta,
    _box,
    encode_mp4_meta,
    parse_mp4_meta,
)


def test_roundtrip_v0_and_v1():
    for version in (0, 1):
        p = encode_mp4_meta(duration=1234, n_tracks=2, version=version,
                            mdat=b"payload-the-walker-must-skip")
        m = parse_mp4_meta(p)
        assert m == Mp4Meta("isom", 1000, 1234, 2)


def test_largesize_box_and_size_zero():
    # wrap mvhd in a moov written with a 64-bit largesize header, and
    # append a trailing size-0 free box extending to EOF
    inner = encode_mp4_meta(duration=77, n_tracks=1)
    # extract the moov body from the canonical encoding
    ftyp_len = struct.unpack_from(">I", inner, 0)[0]
    moov_len = struct.unpack_from(">I", inner, ftyp_len)[0]
    moov_body = inner[ftyp_len + 8 : ftyp_len + moov_len]
    large_moov = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_body))
        + moov_body
    )
    free_to_eof = struct.pack(">I", 0) + b"free" + b"x" * 11
    p = inner[:ftyp_len] + large_moov + free_to_eof
    m = parse_mp4_meta(p)
    assert (m.duration, m.n_tracks) == (77, 1)


def test_unknown_boxes_skipped():
    base = encode_mp4_meta(duration=5, n_tracks=3)
    p = _box(b"skip", b"\xde\xad" * 9) + base + _box(b"uuid", bytes(16))
    assert parse_mp4_meta(p).n_tracks == 3


def test_refusals():
    with pytest.raises(ValueError, match="too short"):
        parse_mp4_meta(b"1234")
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4_meta(_box(b"ftyp", b"isom" + bytes(4)))
    # a box whose size overruns its container
    bad = struct.pack(">I", 10_000) + b"moov" + bytes(8)
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(bad)
    # mvhd version 2 is undefined
    body = bytes([2]) + bytes(31)
    with pytest.raises(ValueError, match="mvhd version"):
        parse_mp4_meta(_box(b"moov", _box(b"mvhd", body)))


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_crash(raw):
    try:
        parse_mp4_meta(raw)
    except ValueError:
        pass


@settings(max_examples=120, deadline=None)
@given(st.integers(min_value=0, max_value=1 << 30), st.binary(min_size=1, max_size=6))
def test_mutated_container_never_crashes(pos, junk):
    base = bytearray(encode_mp4_meta(duration=999, n_tracks=2, mdat=b"abc" * 40))
    pos %= len(base)
    base[pos : pos + len(junk)] = junk
    try:
        parse_mp4_meta(bytes(base))
    except ValueError:
        pass
