"""Ogg walk units: CRC vectors + bit-flip detection, cross-page packet
reassembly, both codec id headers, the single-stream profile refusals,
and fuzz."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.ogg import (
    _page,
    encode_ogg,
    ogg_crc,
    parse_ogg_meta,
    parse_ogg_pages,
)

OK = (ValueError, NotImplementedError)


def test_crc_is_the_ogg_polynomial():
    # Independent pin: unreflected CRC-32/MPEG-2-style table with
    # init 0 / xorout 0 gives 0x89a1897f for "123456789" under the
    # 0x04c11db7 polynomial (the CRC-32/POSIX a.k.a. cksum kernel
    # without the length postfix and final complement).
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"123456789") == 0x89A1897F


def test_crc_catches_single_bit_flip():
    raw = bytearray(encode_ogg(4, b"audio payload text"))
    meta = parse_ogg_meta(bytes(raw))
    assert meta.codec == "vorbis"
    raw[-3] ^= 0x01  # flip a payload bit on the EOS page
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_ogg_meta(bytes(raw))


def test_roundtrip_closed_forms():
    text = b"x" * 123
    m = parse_ogg_meta(encode_ogg(6, text))  # even → vorbis, 6%3=0 → 44100
    assert m.codec == "vorbis" and m.sample_rate == 44100 and m.channels == 1
    assert m.n_pages == 3 and m.n_packets == 3 + 6 % 4
    assert m.duration_ms == (100 * 123 + 6) * 1000 // 44100
    m = parse_ogg_meta(encode_ogg(7, text))  # odd → opus @48k, 2ch
    assert m.codec == "opus" and m.sample_rate == 48000 and m.channels == 2
    assert m.duration_ms == (100 * 123 + 7) * 1000 // 48000


def test_cross_page_packet_reassembly():
    # A 600-byte packet spans two pages: page 1 carries 255+255 laces
    # (open tail), page 2 continues with flag 0x01 and closes it.
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
        + struct.pack("<I", 8000) + struct.pack("<iii", 0, 0, 0)
        + bytes([0xB8, 0x01])
    )
    big = bytes(range(256)) * 3  # 768 bytes
    serial = 7
    p0 = _page(0x02, 0, serial, 0, [ident])
    # hand-build page 1 with an OPEN tail (laces 255,255,255 → 765 bytes)
    hdr = bytearray(b"OggS") + bytes([0, 0]) + struct.pack("<q", 0)
    hdr += struct.pack("<I", serial) + struct.pack("<I", 1)
    hdr += b"\x00\x00\x00\x00" + bytes([3, 255, 255, 255])
    page1 = bytes(hdr) + big[:765]
    page1 = page1[:22] + struct.pack("<I", ogg_crc(page1)) + page1[26:]
    # page 2: continued flag, the 3 remaining bytes close the packet
    hdr = bytearray(b"OggS") + bytes([0, 0x05]) + struct.pack("<q", 16000)
    hdr += struct.pack("<I", serial) + struct.pack("<I", 2)
    hdr += b"\x00\x00\x00\x00" + bytes([1, 3])
    page2 = bytes(hdr) + big[765:]
    page2 = page2[:22] + struct.pack("<I", ogg_crc(page2)) + page2[26:]
    m = parse_ogg_meta(p0 + page1 + page2)
    assert m.n_packets == 2 and m.n_pages == 3
    assert m.duration_ms == 16000 * 1000 // 8000


def test_refusals():
    base = encode_ogg(3, b"some text here")

    with pytest.raises(ValueError, match="magic"):
        parse_ogg_pages(b"RIFF" + bytes(30))

    b = bytearray(base)  # version byte
    b[4] = 1
    with pytest.raises(ValueError, match="version"):
        parse_ogg_pages(bytes(b))

    # sequence gap: renumber the middle page (and re-CRC it)
    pages = []
    pos = 0
    while pos < len(base):
        nseg = base[pos + 26]
        end = pos + 27 + nseg + sum(base[pos + 27 : pos + 27 + nseg])
        pages.append(bytearray(base[pos:end]))
        pos = end
    pages[1][18:22] = struct.pack("<I", 9)
    pages[1][22:26] = b"\x00\x00\x00\x00"
    crc = ogg_crc(bytes(pages[1]))
    pages[1][22:26] = struct.pack("<I", crc)
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg_pages(b"".join(bytes(p) for p in pages))

    # multiplexed: change the serial of the middle page
    pages[1][18:22] = struct.pack("<I", 1)
    pages[1][14:18] = struct.pack("<I", 0xDEAD)
    pages[1][22:26] = b"\x00\x00\x00\x00"
    pages[1][22:26] = struct.pack("<I", ogg_crc(bytes(pages[1])))
    with pytest.raises(NotImplementedError, match="multiplexed"):
        parse_ogg_pages(b"".join(bytes(p) for p in pages))

    # truncation mid-page
    with pytest.raises(ValueError, match="truncated|overruns"):
        parse_ogg_pages(base[:40])

    # unknown codec packet
    raw = encode_ogg(3, b"t").replace(b"OpusHead", b"TheoraXX", 1)
    # CRC now wrong → refuses there first; rebuild instead
    with pytest.raises(ValueError):
        parse_ogg_meta(raw)


def test_unknown_codec_refused_cleanly():
    serial = 11
    p0 = _page(0x02, 0, serial, 0, [b"XSpeex  header"])
    p1 = _page(0x04, 100, serial, 1, [b"\x00\x01"])
    with pytest.raises(NotImplementedError, match="unknown codec"):
        parse_ogg_meta(p0 + p1)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_ogg_random_bytes_never_crash(raw):
    try:
        parse_ogg_meta(raw)
    except OK:
        pass


_BASE = encode_ogg(5, b"fuzz ogg base " * 6)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_ogg_mutated_base_never_crashes(pos, xor):
    b = bytearray(_BASE)
    b[pos % len(b)] ^= xor
    try:
        parse_ogg_meta(bytes(b))
    except OK:
        pass
