"""Round-8 operator units: paletted tRNS alpha decode + alpha-aware
stats. (BPE units live in test_bpe.py; streaming as-of in
test_asof_stream.py; exact oracle value-matches run in
test_oracle_diff.py.)"""

from __future__ import annotations

import numpy as np
import pytest

from orionld_to_hive_spark.operators.multimodal import (
    PNG_TRNS,
    decode_png,
    encode_png_gray,
    encode_png_palette_alpha,
    multimodal_png_alpha_stats,
)


def test_grey_trns_key_decodes_through_real_encoder():
    """Late-r8 upgrade: grey tRNS keys now DECODE (GA output) — spliced
    into a real encoder payload so the key path composes with the
    cycling scanline filters, complementing the hand-built chunk
    streams in test_png_baseline.py."""
    import struct
    import zlib

    raw = np.arange(64, dtype=np.uint8)
    payload = bytearray(encode_png_gray(raw))
    # splice a grey tRNS chunk (2-byte sample, key=0x20) before IDAT
    body = b"\x00\x20"
    chunk = (
        struct.pack(">I", len(body))
        + b"tRNS"
        + body
        + struct.pack(">I", zlib.crc32(b"tRNS" + body) & 0xFFFFFFFF)
    )
    idat_at = bytes(payload).index(b"IDAT") - 4
    spliced = bytes(payload[:idat_at]) + chunk + bytes(payload[idat_at:])
    px, w, h, *_ = decode_png(spliced)
    ga = px.reshape(-1, 2)
    assert list(ga[:64, 0]) == list(raw)  # grey plane intact
    assert all(
        a == (0 if g == 0x20 else 255) for g, a in ga[:64]
    )  # key pixel transparent, everything else opaque
    # zero-padding (value 0) is opaque: 0 != key
    assert all(a == 255 for _, a in ga[64:])


def test_palette_alpha_roundtrip():
    """encode_png_palette_alpha → decode_png returns RGBA with the
    PNG_TRNS alpha riding each index; padding is opaque index 0."""
    raw = np.array([0, 1, 2, 3, 7], dtype=np.uint8)  # 7 % 4 = 3
    px, w, h, *_ = decode_png(encode_png_palette_alpha(raw, width=4))
    assert (w, h) == (4, 2) and px.size == 4 * 2 * 4
    rgba = px.reshape(-1, 4)
    # first five pixels follow byte % 4; the three pad pixels are idx 0
    want_alpha = [PNG_TRNS[b % 4] for b in raw] + [PNG_TRNS[0]] * 3
    assert list(rgba[:, 3]) == want_alpha
    assert tuple(rgba[3][:3]) == (7, 7, 7)  # index-3 colour intact


def test_alpha_stats_invariants(spark, sf_smoke):
    rows = multimodal_png_alpha_stats(spark, sf_smoke).collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r.n_opaque + r.n_partial + r.n_transparent == r.n_pixels
        assert r.n_pixels == r.width * r.height
        # premultiplied mean can never exceed the opaque-red bound
        assert 0.0 <= r.mean_premult <= 255.0 / 3
        assert r.premult_sum <= 255 * r.n_pixels
