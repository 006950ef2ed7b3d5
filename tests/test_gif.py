"""GIF decoder units — hand-built LZW code streams (independent of
lzw_encode) pin the decompressor's general paths: dictionary refs,
the KwKwK case, code-width growth, mid-stream CLEAR, implicit EOI.
Container tests pin interlace order, local color tables, disposal
compositing, transparency, GIF87a (no extensions), NETSCAPE loop
parse, extension skipping, and the malformed-stream refusals.
Hypothesis roundtrips close the loop against the real compressor."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.gif import (
    GIF_FRAME_PX,
    _deinterlace,
    decode_gif,
    encode_gif,
    encode_gif_gray_anim,
    lzw_decode,
    lzw_encode,
)

GRAY = bytes(np.repeat(np.arange(256, dtype=np.uint8), 3))


def _pack_lsb(codes: list[tuple[int, int]]) -> bytes:
    """Test-local LSB-first bit packer (independent of the module's
    emit helper): codes as (value, width) pairs."""
    acc = nbits = 0
    out = bytearray()
    for value, width in codes:
        acc |= value << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- LZW decode

# mcs=2: clear=4, eoi=5, first free code=6, initial width=3


def test_lzw_literals():
    data = _pack_lsb([(4, 3), (0, 3), (1, 3), (2, 3), (5, 3)])
    assert lzw_decode(data, 2, 3).tolist() == [0, 1, 2]


def test_lzw_dictionary_reference():
    # after codes 1,1 the decoder holds table[6] = b"\x01\x01"
    data = _pack_lsb([(4, 3), (1, 3), (1, 3), (6, 3), (5, 3)])
    assert lzw_decode(data, 2, 4).tolist() == [1, 1, 1, 1]


def test_lzw_kwkwk():
    # code 6 arrives while next_code == 6: entry = prev + prev[0]
    data = _pack_lsb([(4, 3), (1, 3), (6, 3), (5, 3)])
    assert lzw_decode(data, 2, 3).tolist() == [1, 1, 1]


def test_lzw_width_growth():
    # literals 0,1,2 grow next_code 6→7→8, so the decoder must read
    # the fourth code at 4 bits
    data = _pack_lsb([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)])
    assert lzw_decode(data, 2, 4).tolist() == [0, 1, 2, 3]


def test_lzw_midstream_clear_resets_width_and_table():
    # width grew to 4; CLEAR (read at 4 bits) drops back to 3-bit
    # codes and empties the table
    data = _pack_lsb(
        [(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (4, 4), (2, 3), (5, 3)]
    )
    assert lzw_decode(data, 2, 5).tolist() == [0, 1, 2, 3, 2]


def test_lzw_implicit_eoi_at_full_image():
    data = _pack_lsb([(4, 3), (0, 3), (1, 3)])
    assert lzw_decode(data, 2, 2).tolist() == [0, 1]


def test_lzw_first_code_must_be_literal():
    data = _pack_lsb([(4, 3), (6, 3), (5, 3)])
    with pytest.raises(ValueError, match="not a literal"):
        lzw_decode(data, 2, 4)


def test_lzw_code_beyond_table():
    data = _pack_lsb([(4, 3), (1, 3), (7, 3), (5, 3)])
    with pytest.raises(ValueError, match="beyond table"):
        lzw_decode(data, 2, 4)


def test_lzw_truncated_stream():
    data = _pack_lsb([(4, 3), (1, 3)])
    with pytest.raises(ValueError, match="unexpected end|short"):
        lzw_decode(data, 2, 100)


def test_lzw_overflow_guard():
    # 3 pixels decoded into a 2-pixel image rectangle
    data = _pack_lsb([(4, 3), (1, 3), (6, 3), (5, 3)])
    with pytest.raises(ValueError, match="overflows"):
        lzw_decode(data, 2, 2)


def test_lzw_bad_min_code_size():
    with pytest.raises(ValueError, match="minimum code size"):
        lzw_decode(b"", 1, 0)
    with pytest.raises(ValueError, match="minimum code size"):
        lzw_encode(np.zeros(1, np.uint8), 9)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip_bytes(raw):
    idx = np.frombuffer(raw, dtype=np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(idx, 8), 8, idx.size), idx)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=0, max_size=2000))
def test_lzw_roundtrip_small_alphabet(vals):
    # small alphabet + long runs: deep table growth, width 3→12, clears
    idx = np.array(vals, dtype=np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(idx, 2), 2, idx.size), idx)


def test_lzw_table_overflow_emits_clear_and_stays_in_sync():
    # >4096 distinct phrases force the compressor's CLEAR-on-overflow
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, size=80_000).astype(np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(idx, 8), 8, idx.size), idx)


# ---------------------------------------------------------------- container


def test_deinterlace_order():
    # storage order for h=8 is rows 0,4,2,6,1,3,5,7
    rows = np.array([[0], [4], [2], [6], [1], [3], [5], [7]], dtype=np.uint8)
    assert _deinterlace(rows).reshape(-1).tolist() == list(range(8))


def test_interlaced_decode_equals_sequential():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=700).astype(np.uint8)
    seq = decode_gif(encode_gif_gray_anim(data, interlace=False))
    lac = decode_gif(encode_gif_gray_anim(data, interlace=True))
    assert len(seq.frames) == len(lac.frames) == 3
    for a, b in zip(seq.frames, lac.frames):
        assert np.array_equal(a, b)


def test_gray_anim_frames_are_text_slices():
    data = np.arange(300, dtype=np.uint8) % 256
    img = decode_gif(encode_gif_gray_anim(data))
    padded = np.zeros(2 * GIF_FRAME_PX, np.uint8)
    padded[:300] = data
    for k, fr in enumerate(img.frames):
        assert np.array_equal(
            fr[:, :, 0], padded[k * GIF_FRAME_PX : (k + 1) * GIF_FRAME_PX].reshape(16, 16)
        )
        assert np.array_equal(fr[:, :, 0], fr[:, :, 1])  # identity gray
        assert img.delays[k] == k + 1
    assert img.loop_count == 0


def test_subrect_composite_and_disposals():
    base = np.full((8, 8), 5, np.uint8)
    patch = np.full((2, 3), 9, np.uint8)
    patch[0, 1] = 7
    g = encode_gif(
        [base, patch, patch],
        palette=GRAY,
        offsets=[(0, 0), (2, 3), (1, 1)],
        disposals=[1, 2, 1],
        screen=(8, 8),
        transparent=7,
        delays=[10, 20, 30],
    )
    img = decode_gif(g)
    f0, f1, f2 = (fr[:, :, 0] for fr in img.frames)
    assert (f0 == 5).all()
    exp1 = f0.copy()
    exp1[3:5, 2:5] = 9
    exp1[3, 3] = 5  # transparent pixel leaves the canvas untouched
    assert np.array_equal(f1, exp1)
    exp2 = f0.copy()
    exp2[3:5, 2:5] = 0  # disposal 2: rect restored to background (idx 0)
    exp2[1:3, 1:4] = 9
    exp2[1, 2] = 5
    assert np.array_equal(f2, exp2)
    assert img.delays == [10, 20, 30]


def test_disposal_restore_previous():
    base = np.full((8, 8), 5, np.uint8)
    patch = np.full((2, 3), 9, np.uint8)
    dot = np.full((1, 1), 1, np.uint8)
    g = encode_gif(
        [base, patch, dot],
        palette=GRAY,
        offsets=[(0, 0), (2, 3), (0, 0)],
        disposals=[1, 3, 1],
        screen=(8, 8),
    )
    f2 = decode_gif(g).frames[2][:, :, 0]
    exp = base.copy()
    exp[0, 0] = 1  # frame 1's patch was disposed back to frame 0's state
    assert np.array_equal(f2, exp)


def test_local_color_table_overrides_global():
    fr = np.array([[0, 1]], dtype=np.uint8)
    # hand-assemble: GCT gray, image carries a 2-entry LCT (red, blue)
    lct = bytes([255, 0, 0, 0, 0, 255])
    body = lzw_encode(fr.reshape(-1), 2)
    payload = (
        b"GIF89a" + bytes([2, 0, 1, 0, 0x87, 0, 0]) + GRAY
        + bytes([0x2C, 0, 0, 0, 0, 2, 0, 1, 0, 0x80])  # LCT flag, size 0
        + lct
        + bytes([2, len(body)]) + body + bytes([0, 0x3B])
    )
    img = decode_gif(payload)
    assert img.frames[0][0, 0].tolist() == [255, 0, 0]
    assert img.frames[0][0, 1].tolist() == [0, 0, 255]


def test_gif87a_minimal_no_extensions():
    fr = np.array([[3, 200]], dtype=np.uint8)
    body = lzw_encode(fr.reshape(-1), 8)
    payload = (
        b"GIF87a" + bytes([2, 0, 1, 0, 0x87, 0, 0]) + GRAY
        + bytes([0x2C, 0, 0, 0, 0, 2, 0, 1, 0, 0])
        + bytes([8, len(body)]) + body + bytes([0, 0x3B])
    )
    img = decode_gif(payload)
    assert img.frames[0][:, :, 0].tolist() == [[3, 200]]
    assert img.delays == [0] and img.loop_count is None


def test_comment_and_plaintext_extensions_skipped():
    fr = np.array([[1]], dtype=np.uint8)
    body = lzw_encode(fr.reshape(-1), 8)
    comment = bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    plain = bytes([0x21, 0x01, 12]) + bytes(12) + bytes([3]) + b"abc" + bytes([0])
    payload = (
        b"GIF89a" + bytes([1, 0, 1, 0, 0x87, 0, 0]) + GRAY
        + comment + plain
        + bytes([0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0])
        + bytes([8, len(body)]) + body + bytes([0, 0x3B])
    )
    assert decode_gif(payload).frames[0][0, 0, 0] == 1


def test_netscape_loop_count_parsed():
    fr = np.zeros((1, 1), np.uint8)
    img = decode_gif(encode_gif([fr], palette=GRAY, loop_count=7))
    assert img.loop_count == 7


def test_refusals():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(b"GIF89a" + bytes([1, 0, 1, 0, 0x87, 0, 0]) + GRAY + bytes([0x3B]))
    # image without any color table
    body = lzw_encode(np.zeros(1, np.uint8), 8)
    payload = (
        b"GIF89a" + bytes([1, 0, 1, 0, 0x00, 0, 0])
        + bytes([0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0])
        + bytes([8, len(body)]) + body + bytes([0, 0x3B])
    )
    with pytest.raises(ValueError, match="neither local nor global"):
        decode_gif(payload)
    # rectangle exceeding the logical screen
    g = bytearray(encode_gif([np.zeros((2, 2), np.uint8)], palette=GRAY, screen=(2, 2)))
    bad = encode_gif(
        [np.zeros((2, 2), np.uint8)], palette=GRAY, screen=(1, 1), offsets=[(0, 0)]
    )
    with pytest.raises(ValueError, match="exceeds logical screen"):
        decode_gif(bad)
    with pytest.raises(ValueError, match="truncated|unexpected end"):
        decode_gif(bytes(g[:-10]))


@settings(max_examples=15, deadline=None)
@given(st.binary(min_size=0, max_size=1200), st.booleans())
def test_gif_gray_anim_roundtrip(raw, interlace):
    data = np.frombuffer(raw, dtype=np.uint8)
    img = decode_gif(encode_gif_gray_anim(data, interlace=interlace))
    nf = max((data.size + GIF_FRAME_PX - 1) // GIF_FRAME_PX, 1)
    assert len(img.frames) == nf
    padded = np.zeros(nf * GIF_FRAME_PX, np.uint8)
    padded[: data.size] = data
    for k, fr in enumerate(img.frames):
        assert np.array_equal(
            fr[:, :, 0],
            padded[k * GIF_FRAME_PX : (k + 1) * GIF_FRAME_PX].reshape(16, 16),
        )


def test_parse_gif_meta_agrees_with_decode():
    from orionld_to_hive_spark.operators.gif import parse_gif_meta

    rng = np.random.default_rng(5)
    for n in (0, 100, 256, 700):
        for inter in (False, True):
            p = encode_gif_gray_anim(
                rng.integers(0, 256, size=n).astype(np.uint8), interlace=inter
            )
            img = decode_gif(p)
            assert parse_gif_meta(p) == (img.width, img.height, len(img.frames))


def test_parse_gif_meta_skips_without_decoding():
    from orionld_to_hive_spark.operators.gif import parse_gif_meta

    # corrupt the LZW payload bytes: the metadata walk must still
    # count frames (it skips data blocks by length, never decodes)
    p = bytearray(encode_gif_gray_anim(np.arange(600, dtype=np.uint8) % 256))
    # clobber bytes inside the first data sub-block (after header+GCT
    # + NETSCAPE + GCE + descriptor + mcs + subblock len)
    off = 13 + 768 + 19 + 8 + 10 + 2
    p[off : off + 4] = b"\xde\xad\xbe\xef"
    assert parse_gif_meta(bytes(p))[2] == 3
    with pytest.raises(ValueError):
        decode_gif(bytes(p))  # the full decode DOES notice


# ------------------------------------------------------------------ fuzzing
# A decoder pointed at web-crawl data sees arbitrary bytes. The
# contract: every malformed input raises ValueError — never a crash,
# hang, over-allocation, or foreign exception type.


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_random_bytes_never_crashes(raw):
    from orionld_to_hive_spark.operators.gif import parse_gif_meta

    for fn in (decode_gif, parse_gif_meta):
        try:
            fn(raw)
        except ValueError:
            pass


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.binary(min_size=1, max_size=8),
    st.randoms(use_true_random=False),
)
def test_decode_mutated_valid_gif_never_crashes(pos, junk, rnd):
    from orionld_to_hive_spark.operators.gif import parse_gif_meta

    base = encode_gif_gray_anim(
        np.arange(400, dtype=np.uint8) % 256, interlace=bool(rnd.random() < 0.5)
    )
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    for fn in (decode_gif, parse_gif_meta):
        try:
            fn(bytes(b))
        except ValueError:
            pass  # refusing is fine; crashing/hanging is not
