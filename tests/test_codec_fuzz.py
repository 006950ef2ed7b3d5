"""Crawl-data hygiene gates for every real decoder: arbitrary or
mutated bytes must raise ValueError (or NotImplementedError for
honest capability refusals) — never a low-level exception type, a
crash, or StopIteration (which would silently terminate the
mapInPandas batch generator around the decode). The JPEG/PNG decode
boundaries were added after this fuzz found StopIteration /
IndexError / KeyError / struct.error leaks on mutated streams."""

from __future__ import annotations

import io
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_gray_flat,
    encode_jpeg_gray_flat_progressive,
    parse_jpeg_dims,
)
from orionld_to_hive_spark.operators.multimodal import (
    decode_png,
    decode_wav,
    encode_png_gray,
    encode_png_palette,
)

OK = (ValueError, NotImplementedError)


def _wav_base() -> bytes:
    bio = io.BytesIO()
    w = wave.open(bio, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes(np.arange(100, dtype="<i2").tobytes())
    w.close()
    return bio.getvalue()


_BASES = {
    "jpeg": encode_jpeg_gray_flat(np.arange(64, dtype=np.uint8)),
    "jpeg_prog": encode_jpeg_gray_flat_progressive(
        np.arange(64, dtype=np.uint8)
    ),
    "png": encode_png_gray(np.arange(256, dtype=np.uint8)),
    "png_pal": encode_png_palette(np.arange(256, dtype=np.uint8)),
    "wav": _wav_base(),
}

_DECODERS = (decode_jpeg, parse_jpeg_dims, decode_png, decode_wav)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decoders_random_bytes_never_crash(raw):
    for fn in _DECODERS:
        try:
            fn(raw)
        except OK:
            pass


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(sorted(_BASES)),
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_decoders_mutated_valid_payloads_never_crash(kind, pos, junk):
    base = _BASES[kind]
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    for fn in _DECODERS:
        try:
            fn(bytes(b))
        except OK:
            pass


def test_boundary_preserves_specific_errors():
    # the wrapper must not swallow the decoders' own messages
    import pytest

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" * 20)
    with pytest.raises(ValueError, match="signature|PNG"):
        decode_png(b"\x00" * 20)
    with pytest.raises(ValueError, match="RIFF|WAVE"):
        decode_wav(b"\x00" * 20)
