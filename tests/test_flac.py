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


# --------------------------------------------------------------------------
# VORBIS_COMMENT extraction (r12) — VERDICT item 7


def _vc(fields, vendor="v 1.0"):
    from orionld_to_hive_spark.operators.flac import (
        encode_flac_meta,
        encode_vorbis_block,
    )

    return encode_flac_meta(
        44100, 2, 16, 1000,
        vorbis_body=encode_vorbis_block(vendor, fields),
    )


def test_vorbis_roundtrip_and_field_semantics():
    from orionld_to_hive_spark.operators.flac import (
        first_field,
        parse_flac_vorbis,
    )

    v = parse_flac_vorbis(
        _vc([("Artist", "Ensemble Müller"), ("TITLE", "a=b=c"),
             ("artist", "second"), ("GENRE", "")], vendor="libFLAC ünit")
    )
    assert v.vendor == "libFLAC ünit"
    assert v.n_comments == 4
    # case-insensitive keys, normalized upper
    assert v.fields[0][0] == "ARTIST"
    # repeatable fields: first occurrence wins
    assert first_field(v, "ARTIST") == "Ensemble Müller"
    # '=' inside the VALUE is legal (length-framed, first '=' splits)
    assert first_field(v, "title") == "a=b=c"
    # empty value is legal
    assert first_field(v, "genre") == ""
    assert first_field(v, "language") is None


def test_vorbis_refusals():
    import pytest

    from orionld_to_hive_spark.operators.flac import (
        encode_flac_meta,
        parse_flac_vorbis,
        parse_vorbis_comment,
    )

    # no block at all
    with pytest.raises(ValueError, match="no VORBIS_COMMENT"):
        parse_flac_vorbis(encode_flac_meta(44100, 2, 16, 10))
    # record without '='
    bad = (b"\x01\x00\x00\x00v" + b"\x01\x00\x00\x00"
           + b"\x05\x00\x00\x00noeq!")
    with pytest.raises(ValueError, match="without '='"):
        parse_vorbis_comment(bad)
    # field name outside 0x20-0x7D
    bad = (b"\x00\x00\x00\x00" + b"\x01\x00\x00\x00"
           + b"\x04\x00\x00\x00\x19a=b")
    with pytest.raises(ValueError, match="field name"):
        parse_vorbis_comment(bad)
    # vendor length overrun
    with pytest.raises(ValueError, match="vendor"):
        parse_vorbis_comment(b"\xff\x00\x00\x00vv")
    # trailing bytes after the last record
    with pytest.raises(ValueError, match="trailing"):
        parse_vorbis_comment(b"\x00\x00\x00\x00\x00\x00\x00\x00junk")
    # comment-count claims more records than exist (length field lies)
    with pytest.raises(ValueError, match="truncated|overruns"):
        parse_vorbis_comment(b"\x00\x00\x00\x00\x02\x00\x00\x00"
                             + b"\x03\x00\x00\x00a=b")


def test_vorbis_little_endian_lengths_are_read_le():
    from orionld_to_hive_spark.operators.flac import parse_vorbis_comment

    # vendor length 4 stored LE: 04 00 00 00 — a BE reader would read
    # 0x04000000 and overrun loudly; the LE reader must succeed
    v = parse_vorbis_comment(b"\x04\x00\x00\x00abcd\x00\x00\x00\x00")
    assert v.vendor == "abcd" and v.n_comments == 0


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_vorbis_mutated_payloads_never_crash(pos, junk):
    from orionld_to_hive_spark.operators.flac import (
        first_field,
        parse_flac_vorbis,
    )

    base = _vc([("ARTIST", "fuzz"), ("TITLE", "mutate the tags")])
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        v = parse_flac_vorbis(bytes(b))
        first_field(v, "artist")
    except (OK + (UnicodeDecodeError,)):
        pass
