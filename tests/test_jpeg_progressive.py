"""Progressive (SOF2) JPEG decode — r10 (VERDICT r9 item 2).

Anchor: the baseline decode path is certified (r9 driver rows +
hand-built streams), so every test here cross-checks
progressive-encode→decode against baseline-encode→decode of the SAME
raw quantized coefficients — a symmetric bug in the new progressive
encoder/decoder pair cannot survive pixel equality with the old path,
because the two scan formats share no entropy machinery beyond the
bit reader."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.jpeg import (
    _seg,
    decode_jpeg,
    encode_jpeg_baseline_blocks,
    encode_jpeg_gray_flat,
    encode_jpeg_gray_flat_progressive,
    encode_jpeg_progressive,
    parse_jpeg_dims,
)

# spectral-selection × successive-approximation scripts (every
# refinement chain steps Ah = previous Al down to 0, per spec G.1.1.1)
SCRIPTS = [
    # sequential-like: DC then the whole AC band, single precision
    ((0, 0, 0, 0), (1, 63, 0, 0)),
    # the registry twin's shape: DC approximated then refined
    ((0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 0)),
    # split bands, interleaved refinement order
    (
        (0, 0, 0, 2), (1, 8, 0, 1), (0, 0, 2, 1), (9, 63, 0, 2),
        (1, 8, 1, 0), (9, 63, 2, 1), (0, 0, 1, 0), (9, 63, 1, 0),
    ),
]


def _pixel_match(blocks, width_blocks, script):
    base = decode_jpeg(encode_jpeg_baseline_blocks(blocks, width_blocks))
    prog = decode_jpeg(
        encode_jpeg_progressive(blocks, width_blocks, scans=script)
    )
    assert (base.width, base.height) == (prog.width, prog.height)
    assert (base.samples == prog.samples).all()


def test_flat_progressive_equals_baseline_flat():
    raw = np.arange(256, dtype=np.uint8)
    b = decode_jpeg(encode_jpeg_gray_flat(raw))
    p = decode_jpeg(encode_jpeg_gray_flat_progressive(raw))
    assert (b.samples == p.samples).all()
    assert parse_jpeg_dims(encode_jpeg_gray_flat_progressive(raw)) == (
        32, 512, 1,
    )


def test_zrl_inside_refinement_pass():
    """A coefficient that becomes significant only in the refinement
    pass, preceded by > 16 zero-history positions: the G.1.2.3 ZRL
    branch (skip 16 zero-history coefs, correction bits en route)."""
    blk = np.zeros((1, 64), dtype=np.int64)
    blk[0, 0] = 5
    blk[0, 2] = 4      # significant in first pass at Al=1 (4>>1 = 2)
    blk[0, 25] = -1    # invisible at Al=1, newly significant at Al=0
    blk[0, 40] = 1
    script = ((0, 0, 0, 0), (1, 63, 0, 1), (1, 63, 1, 0))
    _pixel_match(blk, 1, script)


def test_eobrun_with_extra_bits_across_blocks():
    """> 2 consecutive all-EOB blocks force an EOBn code with appended
    run-length bits in both first and refinement passes."""
    n = 13
    blocks = np.zeros((n, 64), dtype=np.int64)
    blocks[:, 0] = np.arange(n) - 6
    blocks[0, 7] = 3   # one block with AC so the band scan isn't empty
    blocks[n - 1, 9] = -2
    for script in SCRIPTS:
        _pixel_match(blocks, 1, script)


@settings(max_examples=150, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 63),
            # bias toward small magnitudes: values within ±4 of zero
            # straddle the successive-approximation visibility
            # thresholds (v >> Al == 0/1), the regime that exposed the
            # deferred-ZRL encoder bug the first 120 examples missed
            st.one_of(
                st.integers(-4, 4).filter(lambda v: v != 0),
                st.integers(-300, 300).filter(lambda v: v != 0),
            ),
        ),
        min_size=0,
        max_size=24,
    ),
    n_blocks=st.integers(1, 6),
    script_i=st.integers(0, len(SCRIPTS) - 1),
)
def test_progressive_matches_baseline_on_arbitrary_blocks(
    data, n_blocks, script_i
):
    blocks = np.zeros((n_blocks, 64), dtype=np.int64)
    for i, (k, v) in enumerate(data):
        blocks[i % n_blocks, k] = v
    _pixel_match(blocks, 1, SCRIPTS[script_i])


def test_dims_pass_reads_progressive_headers():
    payload = encode_jpeg_gray_flat_progressive(
        np.arange(9, dtype=np.uint8)
    )
    truncated = payload[: payload.index(b"\xff\xda")]
    assert parse_jpeg_dims(truncated) == (32, 24, 1)


def test_non_baseline_sofs_still_refuse():
    for marker, name in ((0xC3, "SOF3"), (0xC7, "SOF7"), (0xCB, "SOF11")):
        payload = b"\xff\xd8" + _seg(
            marker, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        )
        with pytest.raises(NotImplementedError, match=name):
            decode_jpeg(payload)
        with pytest.raises(NotImplementedError, match=name):
            parse_jpeg_dims(payload)


def test_corrupt_ac_run_past_band_refuses_loudly():
    """A run/size whose zero-run jumps past Se must raise ValueError
    (not write into another scan's band or die on IndexError)."""
    from orionld_to_hive_spark.operators.jpeg import (
        _BitWriter,
        _ENC_QT,
        _PENC_AC_BITS,
        _PENC_AC_VALS,
        _PENC_DC_BITS,
        _PENC_DC_VALS,
        _penc_ac,
    )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + _ENC_QT)
    out += _seg(
        0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_PENC_DC_BITS) + bytes(_PENC_DC_VALS)
        + bytes([0x10]) + bytes(_PENC_AC_BITS) + bytes(_PENC_AC_VALS),
    )
    # AC scan over band [1, 5]: emit (run=10, size=1) -> k = 1 + 10
    # lands past Se=5
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 5, 0x00]))
    bw = _BitWriter()
    _penc_ac(bw, (10 << 4) | 1)
    bw.write(1, 1)  # the would-be coefficient's sign/value bit
    payload = bytes(out) + bw.flush() + b"\xff\xd9"
    with pytest.raises(ValueError, match="spectral band"):
        decode_jpeg(payload)


def test_color_progressive_equals_baseline_color():
    """Multi-component progressive: interleaved DC scans (first +
    refinement, per-component predictors) and per-component AC band
    scans must reproduce the baseline color construction exactly."""
    from orionld_to_hive_spark.operators.jpeg import (
        encode_jpeg_color_flat,
        encode_jpeg_color_flat_progressive,
    )

    for n in (0, 1, 7, 256):
        raw = (np.arange(n, dtype=np.int64) * 37 % 256).astype(np.uint8)
        b = decode_jpeg(encode_jpeg_color_flat(raw))
        p = decode_jpeg(encode_jpeg_color_flat_progressive(raw))
        assert p.channels == 3
        assert (b.samples == p.samples).all(), n


def _dc_cat_bits(bw, diff):
    cat = abs(diff).bit_length()
    bw.write(cat, 5)
    if cat:
        bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)


def test_progressive_420_subsampled_dc_only():
    """Hand-built 4:2:0 PROGRESSIVE stream (one MCU: 4 luma blocks +
    1 Cb + 1 Cr), DC-only scan script (missing AC bands must decode
    as zeros): exercises the interleaved DC MCU walk over a
    subsampled component grid and chroma upsample through the
    progressive assembly path. Expected pixels are the flat closed
    form (chroma replication makes it identical to 4:4:4)."""
    from orionld_to_hive_spark.operators.jpeg import (
        _BitWriter,
        _ENC_QT,
        _PENC_DC_BITS,
        _PENC_DC_VALS,
    )

    y_dc = [-100, -20, 40, 110]  # four flat luma blocks (row-major)
    cb, cr = 20, -10
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + _ENC_QT)
    out += _seg(
        0xC2,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_PENC_DC_BITS) + bytes(_PENC_DC_VALS),
    )
    out += _seg(
        0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00])
    )
    bw = _BitWriter()
    pred = 0
    for v in y_dc:  # interleaved MCU: the 4 Y blocks first...
        _dc_cat_bits(bw, v - pred)
        pred = v
    _dc_cat_bits(bw, cb)   # ...then Cb (own predictor from 0)
    _dc_cat_bits(bw, cr)   # ...then Cr
    payload = bytes(out) + bw.flush() + b"\xff\xd9"

    img = decode_jpeg(payload)
    assert (img.width, img.height, img.channels) == (16, 16, 3)
    rgb = img.samples.reshape(16, 16, 3)
    for q, dc in enumerate(y_dc):
        yv = dc + 128
        want = (max(0, yv - 14), yv, min(255, yv + 35))
        quad = rgb[(q // 2) * 8 : (q // 2) * 8 + 8,
                   (q % 2) * 8 : (q % 2) * 8 + 8]
        assert (quad == want).all(), (q, want, quad[0, 0])


def test_progressive_restart_intervals_reset_state():
    """DRI/RSTn inside PROGRESSIVE scans: the DC scan resets its
    predictors and the AC scan resets its EOB run at each marker.
    Hand-built grey stream, 4 blocks, restart_interval=2."""
    from orionld_to_hive_spark.operators.jpeg import (
        _BitWriter,
        _ENC_QT,
        _PENC_AC_BITS,
        _PENC_AC_VALS,
        _PENC_DC_BITS,
        _PENC_DC_VALS,
        _penc_ac,
    )

    dcs = [-60, -50, 70, 90]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + _ENC_QT)
    out += _seg(
        0xC2, struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_PENC_DC_BITS) + bytes(_PENC_DC_VALS)
        + bytes([0x10]) + bytes(_PENC_AC_BITS) + bytes(_PENC_AC_VALS),
    )
    out += _seg(0xDD, struct.pack(">H", 2))  # DRI = 2
    # DC scan: blocks 0,1 | RST0 | blocks 2,3 (predictor resets to 0)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    bw = _BitWriter()
    pred = 0
    for i, v in enumerate(dcs):
        if i == 2:
            out += bw.flush() + b"\xff\xd0"  # RST0, predictor reset
            bw = _BitWriter()
            pred = 0
        _dc_cat_bits(bw, v - pred)
        pred = v
    out += bw.flush()
    # AC scan (band 1-63): EOBRUN=2 | RST0 (the modulo-8 restart
    # counter starts over in EVERY scan, spec E.2.4; eobrun must also
    # reset) | EOBRUN=2 — an unreset eobrun would mis-skip blocks
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    bw = _BitWriter()
    _penc_ac(bw, 1 << 4)  # EOB2: run = 2 + 1 extra bit
    bw.write(0, 1)
    out += bw.flush() + b"\xff\xd0"  # RST0
    bw = _BitWriter()
    _penc_ac(bw, 1 << 4)
    bw.write(0, 1)
    payload = bytes(out) + bw.flush() + b"\xff\xd9"

    img = decode_jpeg(payload)
    grid = img.samples.reshape(8, 4, 8)
    for i, v in enumerate(dcs):
        assert (grid[:, i, :] == v + 128).all(), (i, v)
