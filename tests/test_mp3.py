"""MPEG-audio metadata-walk units: hand-built frame streams pin the
bitrate/rate tables, per-frame length arithmetic (alternating padding
misplaces every later sync word if a table is wrong), ID3v2 syncsafe
skip, ID3v1 trailer, Xing detection, and the malformed-stream
refusals; fuzz pins the crash-free contract like mp4/gif/jpeg."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.mp3 import (
    Mp3Meta,
    encode_mp3,
    encode_mp3_frame,
    parse_mp3_meta,
)

OK = (ValueError, NotImplementedError)


def test_single_frame_every_synth_config():
    # (vbits, lbits, bidx, ridx, mbits) → expected header fields
    cases = [
        ((3, 1, 9, 0, 0), ("1", 3, 128, 44100, "stereo", 1152)),
        ((2, 1, 8, 0, 3), ("2", 3, 64, 22050, "mono", 576)),
        ((3, 2, 12, 2, 1), ("1", 2, 256, 32000, "joint", 1152)),
        ((3, 3, 1, 0, 0), ("1", 1, 32, 44100, "stereo", 384)),
        ((0, 1, 8, 2, 3), ("2.5", 3, 64, 8000, "mono", 576)),
    ]
    for bits, (ver, layer, kbps, rate, mode, spf) in cases:
        m = parse_mp3_meta(encode_mp3_frame(*bits, padding=0))
        assert (m.mpeg_version, m.layer, m.bitrate_kbps, m.sample_rate,
                m.channel_mode) == (ver, layer, kbps, rate, mode)
        assert m.n_frames == 1
        assert m.duration_ms == spf * 1000 // rate


def test_padding_walk_is_load_bearing():
    # 6 frames with alternating padding: any off-by-one in the frame
    # length lands the walker mid-body where sync is absent
    stream = b"".join(
        encode_mp3_frame(3, 1, 9, 0, 0, padding=k % 2) for k in range(6)
    )
    m = parse_mp3_meta(stream)
    assert m.n_frames == 6
    assert m.duration_ms == 6 * 1152 * 1000 // 44100
    # corrupting one frame's padding bit desyncs the remainder
    b = bytearray(stream)
    b[2] ^= 0x02  # padding bit of frame 0
    with pytest.raises(ValueError, match="sync|frame"):
        parse_mp3_meta(bytes(b))


def test_id3v2_skip_and_id3v1_trailer():
    m = parse_mp3_meta(encode_mp3(4, b"hello tags"))
    assert isinstance(m, Mp3Meta)
    assert m.id3v2_bytes == 10 + 10
    assert m.has_id3v1
    m2 = parse_mp3_meta(encode_mp3(3, b"odd doc, no trailer"))
    assert not m2.has_id3v1


def test_id3v2_tag_with_sync_bytes_inside_is_skipped_not_parsed():
    # tag body full of 0xFF must not be mistaken for audio frames
    body = b"\xff" * 100
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, body.__len__() >> 7, len(body) & 0x7F])
    stream = tag + body + encode_mp3_frame(3, 1, 9, 0, 0, padding=0)
    m = parse_mp3_meta(stream)
    assert m.n_frames == 1 and m.id3v2_bytes == 10 + 100


def test_vbr_flag_on_bitrate_change():
    stream = encode_mp3_frame(3, 1, 9, 0, 0, padding=0) + encode_mp3_frame(
        3, 1, 11, 0, 0, padding=0
    )
    m = parse_mp3_meta(stream)
    assert m.vbr and m.n_frames == 2
    assert m.bitrate_kbps == 128  # first frame's


def test_xing_frame_count_detected():
    # MPEG1 stereo side info = 32 → Xing at byte 4+32 of the frame
    f = bytearray(encode_mp3_frame(3, 1, 9, 0, 0, padding=0))
    off = 4 + 32
    f[off : off + 4] = b"Xing"
    f[off + 4 : off + 8] = (1).to_bytes(4, "big")  # frames flag
    f[off + 8 : off + 12] = (4242).to_bytes(4, "big")
    m = parse_mp3_meta(bytes(f))
    assert m.xing_frames == 4242
    # mono MPEG2 offset = 4+9
    g = bytearray(encode_mp3_frame(2, 1, 8, 0, 3, padding=0))
    off = 4 + 9
    g[off : off + 4] = b"Info"
    g[off + 4 : off + 8] = (1).to_bytes(4, "big")
    g[off + 8 : off + 12] = (7).to_bytes(4, "big")
    assert parse_mp3_meta(bytes(g)).xing_frames == 7


def test_refusals():
    with pytest.raises(ValueError, match="sync|frame"):
        parse_mp3_meta(b"\x00" * 40)
    with pytest.raises(ValueError):
        parse_mp3_meta(b"")
    with pytest.raises(ValueError, match="free-format"):
        parse_mp3_meta(bytes([0xFF, 0xFB, 0x00, 0x00]) + bytes(100))
    with pytest.raises(ValueError, match="overruns"):
        parse_mp3_meta(encode_mp3_frame(3, 1, 9, 0, 0, padding=0)[:-10])
    with pytest.raises(ValueError, match="syncsafe"):
        parse_mp3_meta(b"ID3\x04\x00\x00\x80\x00\x00\x00")
    with pytest.raises(ValueError, match="ID3v2 size overruns"):
        parse_mp3_meta(b"ID3\x04\x00\x00\x00\x00\x07\x7f")
    # mid-stream sample-rate change is refused, not mis-summed
    s = encode_mp3_frame(3, 1, 9, 0, 0, padding=0) + encode_mp3_frame(
        3, 1, 9, 1, 0, padding=0
    )
    with pytest.raises(ValueError, match="mid-stream"):
        parse_mp3_meta(s)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_mp3_random_bytes_never_crash(raw):
    try:
        parse_mp3_meta(raw)
    except OK:
        pass


@settings(max_examples=240, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_mp3_mutated_valid_payloads_never_crash(pos, junk):
    base = encode_mp3(6, b"fuzz me gently but thoroughly")
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        parse_mp3_meta(bytes(b))
    except OK:
        pass


def test_registry_query_matches_closed_forms(spark, sf_smoke):
    from orionld_to_hive_spark.operators.mp3 import multimodal_mp3_meta

    rows = multimodal_mp3_meta(spark, sf_smoke).collect()
    assert len(rows) == 500
    for r in rows[:50]:
        cfg = r["asset_id"] % 3
        assert r["mpeg_version"] == ("2" if cfg == 1 else "1")
        assert r["layer"] == (2 if cfg == 2 else 3)
        assert r["has_id3v1"] == (r["asset_id"] % 2 == 0)
        spf = {0: 1152, 1: 576, 2: 1152}[cfg]
        rate = {0: 44100, 1: 22050, 2: 32000}[cfg]
        assert r["duration_ms"] == r["n_frames"] * spf * 1000 // rate


# --------------------------------------------------------------------------
# ID3v2 text-frame extraction (r12)


def test_id3_v23_vs_v24_frame_size_split():
    """v2.3 frame sizes are plain big-endian; v2.4 are syncsafe. A
    body >127 bytes encodes differently under the two — a parser that
    uses one rule for both misplaces every later frame."""
    from orionld_to_hive_spark.operators.mp3 import (
        encode_mp3_tagged,
        id3_first,
        parse_id3v2,
    )

    long_title = "x" * 200  # frame body 201 bytes: 0xC9 vs syncsafe 0x0149
    t3 = parse_id3v2(encode_mp3_tagged(2, long_title))
    t4 = parse_id3v2(encode_mp3_tagged(3, long_title))
    assert t3.version == 3 and t4.version == 4
    assert id3_first(t3, "TIT2") == long_title[:24]
    assert id3_first(t4, "TIT2") == long_title[:24]
    # artist (the frame AFTER the title) parses in both — proves the
    # size rule placed the next boundary right
    assert id3_first(t3, "TPE1") == "artist-2"
    assert id3_first(t4, "TPE1") == "artist-3"


def test_id3_encodings_roundtrip():
    from orionld_to_hive_spark.operators.mp3 import (
        _id3_frame,
        id3_first,
        parse_id3v2,
    )

    def tag(major, frames):
        body = b"".join(frames) + bytes(4)
        size = len(body)
        return (b"ID3" + bytes([major, 0, 0])
                + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                         (size >> 7) & 0x7F, size & 0x7F]) + body)

    # latin-1, utf-16 BOM in v2.3; utf-8 and utf-16be in v2.4
    t = parse_id3v2(tag(3, [_id3_frame(3, b"TIT2", 0, "caf\xe9"),
                            _id3_frame(3, b"TPE1", 1, "uni – code")]))
    assert id3_first(t, "TIT2") == "caf\xe9"
    assert id3_first(t, "TPE1") == "uni – code"
    t = parse_id3v2(tag(4, [_id3_frame(4, b"TIT2", 3, "utf8 é–"),
                            _id3_frame(4, b"TPE1", 2, "be –")]))
    assert id3_first(t, "TIT2") == "utf8 é–"
    assert id3_first(t, "TPE1") == "be –"
    # utf-8 is illegal in v2.3
    import pytest

    with pytest.raises(ValueError, match="illegal in ID3v2.3"):
        parse_id3v2(tag(3, [_id3_frame(4, b"TIT2", 3, "x")]))


def test_id3_refusals_and_padding():
    import pytest

    from orionld_to_hive_spark.operators.mp3 import (
        encode_mp3_tagged,
        parse_id3v2,
    )

    good = bytearray(encode_mp3_tagged(4, "hello world"))
    # unsynchronisation flag refused
    b = bytearray(good)
    b[5] |= 0x80
    with pytest.raises(ValueError, match="unsynchronisation"):
        parse_id3v2(bytes(b))
    # extended header refused
    b = bytearray(good)
    b[5] |= 0x40
    with pytest.raises(ValueError, match="extended header"):
        parse_id3v2(bytes(b))
    # unsupported major version
    b = bytearray(good)
    b[3] = 2
    with pytest.raises(ValueError, match="unsupported ID3v2"):
        parse_id3v2(bytes(b))
    # padding ends the frame area: n_frames stays 4 (TLAN present for
    # doc 4? doc_id=4 -> 4%5==4 so TLAN ABSENT, 3 frames)
    t = parse_id3v2(encode_mp3_tagged(4, "hello"))
    assert t.n_frames == 3
    t = parse_id3v2(encode_mp3_tagged(6, "hello"))
    assert t.n_frames == 4


def test_tagged_blob_still_walks_as_audio():
    """The tagged fixture is also a valid parse_mp3_meta stream — the
    triage walker skips the REAL frame tag by syncsafe size."""
    from orionld_to_hive_spark.operators.mp3 import (
        encode_mp3_tagged,
        parse_mp3_meta,
    )

    m = parse_mp3_meta(encode_mp3_tagged(5, "some document text"))
    assert m.n_frames == 1 + len("some document text") % 5


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_id3_mutated_payloads_never_crash(pos, junk):
    from orionld_to_hive_spark.operators.mp3 import (
        encode_mp3_tagged,
        id3_first,
        parse_id3v2,
    )

    base = encode_mp3_tagged(7, "fuzz the tag parser")
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        t = parse_id3v2(bytes(b))
        id3_first(t, "TIT2")
    except (ValueError, UnicodeDecodeError):
        pass
