"""FLAC STREAMINFO walk units: bit-field extraction at the extremes,
block-walk semantics (last-flag, padding, vorbis comment, frames
never read), refusal classes, and fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.flac import (
    FlacMeta,
    encode_flac_meta,
    parse_flac_meta,
)

OK = (ValueError, NotImplementedError)


def test_roundtrip_and_block_walk():
    m = parse_flac_meta(
        encode_flac_meta(44100, 2, 16, 441000, padding=5, vorbis=True,
                         frames=b"\xff" * 50)
    )
    assert m.sample_rate == 44100 and m.channels == 2
    assert m.bits_per_sample == 16 and m.total_samples == 441000
    assert m.duration_ms == 10000
    assert m.n_meta_blocks == 3 and m.has_vorbis_comment
    # frames region starts exactly past the metadata blocks
    assert m.audio_offset == len(
        encode_flac_meta(44100, 2, 16, 441000, padding=5, vorbis=True)
    )


def test_bit_field_extremes():
    m = parse_flac_meta(
        encode_flac_meta((1 << 20) - 1, 8, 32, (1 << 36) - 1)
    )
    assert m.sample_rate == (1 << 20) - 1
    assert m.channels == 8 and m.bits_per_sample == 32
    assert m.total_samples == (1 << 36) - 1


def test_refusals():
    with pytest.raises(ValueError, match="magic"):
        parse_flac_meta(b"OggS" + bytes(40))
    with pytest.raises(ValueError, match="truncated"):
        parse_flac_meta(b"fLaC")
    with pytest.raises(ValueError, match="not STREAMINFO"):
        parse_flac_meta(b"fLaC\x81\x00\x00\x04" + bytes(4))
    with pytest.raises(ValueError, match="34"):
        parse_flac_meta(b"fLaC\x80\x00\x00\x10" + bytes(16))
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_flac_meta(encode_flac_meta(44100, 1, 16, 5)[:30])
    with pytest.raises(ValueError, match="127"):
        parse_flac_meta(b"fLaC\xff\x00\x00\x00")
    with pytest.raises(ValueError, match="zero"):
        parse_flac_meta(encode_flac_meta(0, 1, 16, 5))
    si = encode_flac_meta(44100, 1, 16, 5)
    body = si[8 : 8 + 34]
    dup = (b"fLaC" + b"\x00\x00\x00\x22" + body
           + b"\x80\x00\x00\x22" + body)
    with pytest.raises(ValueError, match="duplicate STREAMINFO"):
        parse_flac_meta(dup)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_flac_random_bytes_never_crash(raw):
    try:
        parse_flac_meta(raw)
    except OK:
        pass


@settings(max_examples=240, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_flac_mutated_valid_payloads_never_crash(pos, junk):
    base = encode_flac_meta(22050, 1, 16, 999, padding=3, vorbis=True,
                            frames=b"opaque")
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        parse_flac_meta(bytes(b))
    except OK:
        pass


def test_registry_query_closed_forms(spark, sf_smoke):
    from orionld_to_hive_spark.operators.flac import multimodal_flac_meta

    rows = multimodal_flac_meta(spark, sf_smoke).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        cfg = r["asset_id"] % 3
        rate = (44100, 22050, 8000)[cfg]
        assert r["sample_rate"] == rate
        assert r["channels"] == 1 + r["asset_id"] % 2
        assert r["duration_ms"] == r["total_samples"] * 1000 // rate
        assert r["has_vorbis_comment"] == (cfg == 0)
