"""Full-baseline PNG decode (r8): color types 4/6, 16-bit depth, Adam7
interlacing, grey/RGB tRNS transparent-color keys — every case built
as a hand-constructed chunk stream so the expectations are independent
of the encoder under test. (The scanline-filter matrix itself is
certified end-to-end by the oracle-checked PNG stats queries, which
cycle all five filters.)"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from orionld_to_hive_spark.operators.multimodal import decode_png

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def build(w, h, depth, color, raw, interlace=0, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        SIG
        + chunk(b"IHDR", ihdr)
        + extra
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def scanlines(rows_of_bytes) -> bytes:
    """Filter-0 scanlines from per-row byte lists."""
    return b"".join(b"\x00" + bytes(r) for r in rows_of_bytes)


def test_grey_trns_key_decodes_to_grey_alpha():
    img = [[10, 32, 10], [32, 5, 32]]
    payload = build(
        3, 2, 8, 0, scanlines(img),
        extra=chunk(b"tRNS", struct.pack(">H", 32)),
    )
    px, w, h, *_ = decode_png(payload)
    assert (w, h) == (3, 2) and px.size == 3 * 2 * 2  # GA
    ga = px.reshape(-1, 2)
    assert list(ga[:, 0]) == [10, 32, 10, 32, 5, 32]
    assert list(ga[:, 1]) == [255, 0, 255, 0, 255, 0]


def test_rgb_trns_key_decodes_to_rgba():
    red, blue = (255, 0, 0), (0, 0, 255)
    img = [list(red + blue), list(blue + red)]
    payload = build(
        2, 2, 8, 2, scanlines(img),
        extra=chunk(b"tRNS", struct.pack(">HHH", 255, 0, 0)),
    )
    px, w, h, *_ = decode_png(payload)
    rgba = px.reshape(-1, 4)
    assert [tuple(p) for p in rgba] == [
        (255, 0, 0, 0), (0, 0, 255, 255), (0, 0, 255, 255), (255, 0, 0, 0),
    ]


def test_grey16_decodes_to_uint16_with_up_filter():
    r0 = (0x0102, 0xFFEE)
    r1 = (0x0000, 0x1234)
    b0 = struct.pack(">HH", *r0)
    # row 1 carried as Up-filtered bytes: raw - prev (bytewise mod 256)
    b1raw = struct.pack(">HH", *r1)
    b1 = bytes((a - b) % 256 for a, b in zip(b1raw, b0))
    payload = build(2, 2, 16, 0, b"\x00" + b0 + b"\x02" + b1)
    px, w, h, *_ = decode_png(payload)
    assert px.dtype == np.uint16
    assert list(px) == [0x0102, 0xFFEE, 0x0000, 0x1234]


def test_grey_alpha_and_rgba_with_sub_filter():
    # color 4 (grey+alpha), bpp=2: Sub filter must step 2 bytes
    raw_row = [100, 200, 110, 190]  # two (g, a) pixels
    filt = raw_row[:2] + [
        (raw_row[2] - raw_row[0]) % 256, (raw_row[3] - raw_row[1]) % 256,
    ]
    px, w, h, *_ = decode_png(build(2, 1, 8, 4, b"\x01" + bytes(filt)))
    assert list(px) == raw_row

    # color 6 (RGBA), bpp=4
    p0, p1 = [1, 2, 3, 4], [10, 20, 30, 40]
    filt6 = p0 + [(b - a) % 256 for a, b in zip(p0, p1)]
    px6, _, _, *_ = decode_png(build(2, 1, 8, 6, b"\x01" + bytes(filt6)))
    assert list(px6) == p0 + p1


# The spec §8.2 grid in the canonical libpng form — derived here from
# the interlacing pattern TABLE (row/col start/inc vectors), NOT from
# the decoder's (x0, y0, dx, dy) tuples, so a transposed pass in the
# decoder cannot be masked by a self-consistent roundtrip (the r8
# review found exactly that: the first grid had passes 3 and 5 wrong
# and these tests reproduced the bug instead of catching it).
_ROW_START = (0, 0, 4, 0, 2, 0, 1)
_COL_START = (0, 4, 0, 2, 0, 1, 0)
_ROW_INC = (8, 8, 8, 4, 4, 2, 2)
_COL_INC = (8, 8, 4, 4, 2, 2, 1)
PASSES = tuple(
    (_COL_START[i], _ROW_START[i], _COL_INC[i], _ROW_INC[i])
    for i in range(7)
)


def adam7_raw(full: np.ndarray) -> bytes:
    """Serialize a (h, w) single-channel 8-bit raster into Adam7 pass
    scanlines (all filter 0) straight from the spec grid."""
    h, w = full.shape
    out = bytearray()
    for x0, y0, dx, dy in PASSES:
        sub = full[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            out += b"\x00" + bytes(int(v) for v in row)
    return bytes(out)


def test_adam7_grey_reassembles_full_raster():
    # distinct value per cell so any mis-scattered pixel is caught
    full = (np.arange(64, dtype=np.uint16) % 251).astype(np.uint8).reshape(8, 8)
    px, w, h, *_ = decode_png(build(8, 8, 8, 0, adam7_raw(full), interlace=1))
    assert (w, h) == (8, 8)
    assert np.array_equal(px.reshape(8, 8), full)


def test_adam7_partial_passes_non_multiple_size():
    # 5x3: several passes are empty or partial — the consume/scatter
    # arithmetic must line up exactly
    full = (np.arange(15, dtype=np.uint8) * 7 % 256).reshape(3, 5)
    px, w, h, *_ = decode_png(build(5, 3, 8, 0, adam7_raw(full), interlace=1))
    assert (w, h) == (5, 3)
    assert np.array_equal(px.reshape(3, 5), full)


def test_adam7_16bit_combined():
    full = (np.arange(15, dtype=np.uint16) * 1000 + 7).reshape(3, 5)
    h, w = full.shape
    out = bytearray()
    for x0, y0, dx, dy in PASSES:
        sub = full[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            out += b"\x00" + b"".join(
                struct.pack(">H", int(v)) for v in row
            )
    px, gw, gh, *_ = decode_png(build(5, 3, 16, 0, bytes(out), interlace=1))
    assert px.dtype == np.uint16
    assert np.array_equal(px.reshape(3, 5), full)


def pack_row(vals, depth) -> bytes:
    """Pack sub-byte samples MSB-first with byte-boundary row padding
    (spec §7.2) — independent of the encoder under test."""
    bits = "".join(format(v, f"0{depth}b") for v in vals)
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def test_subbyte_grey_all_depths_roundtrip():
    # r9: depths 1/2/4 decode; samples are raw (NOT rescaled to 255)
    for depth in (1, 2, 4):
        hi = (1 << depth) - 1
        vals = np.arange(30, dtype=np.int64) % (hi + 1)
        rows = vals.reshape(3, 10)
        raw = b"".join(b"\x00" + pack_row(list(r), depth) for r in rows)
        img = decode_png(build(10, 3, depth, 0, raw))
        assert (img.width, img.height, img.channels, img.depth) == (
            10, 3, 1, depth,
        )
        assert np.array_equal(img.samples.reshape(3, 10), rows)


def test_subbyte_filters_run_over_packed_bytes():
    # 2-bit grey, row 1 Up-filtered: the filter must apply to PACKED
    # bytes BEFORE unpacking (spec §9) — unpack-then-filter gives a
    # different answer for these values
    r0, r1 = [0, 1, 2, 3, 0], [3, 3, 1, 0, 2]
    b0, b1raw = pack_row(r0, 2), pack_row(r1, 2)
    b1 = bytes((a - b) % 256 for a, b in zip(b1raw, b0))
    img = decode_png(build(5, 2, 2, 0, b"\x00" + b0 + b"\x02" + b1))
    assert list(img.samples) == r0 + r1


def test_subbyte_grey_trns_key():
    # 4-bit grey with key 5: opaque value is (1<<4)-1 = 15, in the
    # SOURCE depth's range — not 255
    vals = [1, 5, 15, 5]
    img = decode_png(build(
        4, 1, 4, 0, b"\x00" + pack_row(vals, 4),
        extra=chunk(b"tRNS", struct.pack(">H", 5)),
    ))
    assert (img.channels, img.depth) == (2, 4)
    ga = img.samples.reshape(-1, 2)
    assert list(ga[:, 0]) == vals
    assert list(ga[:, 1]) == [15, 0, 15, 0]


def test_subbyte_adam7_each_pass_packs_its_own_rows():
    # 8x8 4-bit Adam7: pass rows pack (and pad) independently, so a
    # decoder that unpacks the whole stream at once mis-aligns
    full = (np.arange(64, dtype=np.int64) % 16).reshape(8, 8)
    out = bytearray()
    for x0, y0, dx, dy in PASSES:
        sub = full[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            out += b"\x00" + pack_row([int(v) for v in row], 4)
    img = decode_png(build(8, 8, 4, 0, bytes(out), interlace=1))
    assert np.array_equal(img.samples.reshape(8, 8), full)


def test_subbyte_paletted_decodes_through_palette():
    # 2-bit paletted 5x1: indices through a 4-color palette
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    vals = [0, 3, 1, 2, 3]
    img = decode_png(build(
        5, 1, 2, 3, b"\x00" + pack_row(vals, 2),
        extra=chunk(b"PLTE", pal),
    ))
    assert (img.channels, img.depth) == (3, 8)
    got = img.samples.reshape(-1, 3)
    for j, i in enumerate(vals):
        assert tuple(got[j]) == tuple(pal[3 * i : 3 * i + 3])


def test_invalid_depth_color_combos_and_guards():
    img = scanlines([[1, 2], [3, 4]])
    # spec §11.2.2: sub-byte is only valid for grey/paletted, and
    # paletted caps at 8 — out-of-matrix depths are malformed files
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(build(2, 2, 4, 2, img))
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(build(2, 2, 16, 3, img))
    # tRNS on an alpha-bearing color type is spec-invalid
    ga = build(
        2, 1, 8, 4, b"\x00" + bytes([9, 9, 8, 8]),
        extra=chunk(b"tRNS", struct.pack(">H", 9)),
    )
    with pytest.raises(ValueError, match="alpha-bearing"):
        decode_png(ga)
    # malformed key length
    with pytest.raises(ValueError, match="key length"):
        decode_png(build(
            2, 1, 8, 0, b"\x00" + bytes([9, 9]),
            extra=chunk(b"tRNS", b"\x01"),
        ))
    # 8-bit image with a key outside the 8-bit sample range
    with pytest.raises(ValueError, match="8-bit sample range"):
        decode_png(build(
            2, 1, 8, 0, b"\x00" + bytes([9, 9]),
            extra=chunk(b"tRNS", struct.pack(">H", 300)),
        ))
