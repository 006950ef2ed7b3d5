"""EXIF/TIFF walker units: both byte orders, inline vs out-of-line
values, the private Exif sub-IFD, strict refusals, decode-path
non-interference, and crash-free fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.exif import (
    encode_jpeg_with_exif,
    encode_tiff_exif,
    exif_fields_for,
    insert_exif_app1,
    parse_jpeg_exif,
    parse_tiff,
)

OK = (ValueError, NotImplementedError, struct.error)


@pytest.mark.parametrize("e,order", [("<", "II"), (">", "MM")])
def test_roundtrip_both_byte_orders(e, order):
    tiff = encode_tiff_exif(e, "synth-cam", "m3", 6,
                            "2024:01:05 12:30:00", 1234, 481)
    m = parse_tiff(tiff)
    assert m.byte_order == order
    assert m.n_ifd0 == 5
    assert m.orientation == 6
    assert m.make == "synth-cam"  # out-of-line ASCII (10 bytes)
    assert m.model == "m3"  # inline ASCII (3 bytes)
    assert m.datetime == "2024:01:05 12:30:00"
    assert (m.pixel_x, m.pixel_y) == (1234, 481)


def test_fixture_closed_forms():
    for d, nb in [(0, 0), (1, 7), (7, 500), (28, 3), (479, 99)]:
        blob = encode_jpeg_with_exif(d, b"x" * nb)
        m = parse_jpeg_exif(blob)
        make, model, orient, dt, px, py = exif_fields_for(d, nb)
        assert (m.make, m.model, m.orientation, m.datetime,
                m.pixel_x, m.pixel_y) == (make, model, orient, dt, px, py)
        assert m.byte_order == ("II" if d % 2 == 0 else "MM")


def test_exif_insertion_does_not_disturb_pixel_decode():
    from orionld_to_hive_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray_flat,
    )

    data = np.frombuffer(bytes(range(200)), dtype=np.uint8)
    plain = encode_jpeg_gray_flat(data)
    tagged = encode_jpeg_with_exif(5, bytes(range(200)))
    a, b = decode_jpeg(plain), decode_jpeg(tagged)
    assert (a[0] == b[0]).all() and a[1:] == b[1:]


def test_refusals():
    good = encode_tiff_exif("<", "make", "md", 1, "2024:01:01 00:00:00",
                            10, 20)
    # bad byte order / magic
    with pytest.raises(ValueError, match="byte order"):
        parse_tiff(b"XX" + good[2:])
    bad_magic = good[:2] + struct.pack("<H", 43) + good[4:]
    with pytest.raises(ValueError, match="magic"):
        parse_tiff(bad_magic)
    # orientation out of 1..8
    with pytest.raises(ValueError, match="orientation"):
        parse_tiff(encode_tiff_exif("<", "m", "m", 9,
                                    "2024:01:01 00:00:00", 1, 1))
    # truncation → overrun
    with pytest.raises(ValueError, match="overrun|truncated"):
        parse_tiff(good[:20])
    # JPEG without an Exif APP1
    from orionld_to_hive_spark.operators.jpeg import encode_jpeg_gray_flat

    plain = encode_jpeg_gray_flat(np.frombuffer(b"abc", dtype=np.uint8))
    with pytest.raises(ValueError, match="no Exif APP1"):
        parse_jpeg_exif(plain)
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_exif(b"nope")
    with pytest.raises(ValueError, match="SOI"):
        insert_exif_app1(b"nope", good)


def test_ascii_nul_termination_enforced():
    tiff = bytearray(encode_tiff_exif("<", "synth-cam", "m1", 1,
                                      "2024:01:01 00:00:00", 1, 1))
    # out-of-line Make value sits after both IFDs; clobber its NUL
    i = tiff.find(b"synth-cam\x00")
    tiff[i + 9] = ord("!")
    with pytest.raises(ValueError, match="NUL-terminated"):
        parse_tiff(bytes(tiff))


@settings(max_examples=390, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_exif_mutated_payloads_never_crash(pos, junk):
    base = encode_jpeg_with_exif(9, b"fuzz the ifd walker")
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        parse_jpeg_exif(bytes(b))
    except (OK + (UnicodeDecodeError,)):
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_tiff_random_bytes_never_crash(raw):
    try:
        parse_tiff(raw)
    except (OK + (UnicodeDecodeError,)):
        pass
