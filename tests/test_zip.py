"""ZIP walk units: pinning against stdlib `zipfile` as an independent
implementation, EOCD location with hostile comments, name encodings,
the full refusal matrix, and fuzz."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.zip import (
    encode_zip_sample,
    parse_zip_entries,
    parse_zip_meta,
)

OK = (ValueError, NotImplementedError)


def test_roundtrip_closed_forms():
    text = b"hello zip world " * 20
    m = parse_zip_meta(encode_zip_sample(42, text))
    assert m.n_entries == 3  # even id: txt + cls + json
    assert m.n_stored == 2 and m.n_deflated == 1
    assert m.total_bytes == len(text) + 1 + len('{"id": 42}')
    assert m.txt_bytes == len(text)
    assert m.crc_checked == 3
    m = parse_zip_meta(encode_zip_sample(7, text))
    assert m.n_entries == 2 and m.n_stored == 1 and m.crc_checked == 2


def test_pins_against_stdlib_infolist():
    # An archive we didn't write with our fixture helper: mixed
    # methods, several members, non-trivial contents. The walk must
    # agree with zipfile's own view, field for field.
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        zf.writestr(zipfile.ZipInfo("a/b.txt"), b"x" * 1000)
        info = zipfile.ZipInfo("c.bin")
        info.compress_type = zipfile.ZIP_DEFLATED
        zf.writestr(info, bytes(range(256)) * 4)
        zf.writestr(zipfile.ZipInfo("empty"), b"")
    raw = bio.getvalue()
    ours = {e.name: e for e in parse_zip_entries(raw)}
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        theirs = zf.infolist()
        assert {i.filename for i in theirs} == set(ours)
        for i in theirs:
            e = ours[i.filename]
            assert e.usize == i.file_size
            assert e.csize == i.compress_size
            assert e.crc32 == i.CRC
            assert e.method == i.compress_type
            assert e.offset == i.header_offset
    assert parse_zip_meta(raw).crc_checked == 3


def test_utf8_name_flag_bit11():
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        zf.writestr(zipfile.ZipInfo("naïve—文.txt"), b"data")
    (e,) = parse_zip_entries(bio.getvalue())
    assert e.name == "naïve—文.txt"


def test_eocd_found_despite_decoy_sig_in_comment():
    base = encode_zip_sample(1, b"body")
    # Append a comment that CONTAINS the EOCD signature: the scan
    # must keep the record whose comment length ends the file.
    eocd = base.rindex(b"PK\x05\x06")
    comment = b"decoy PK\x05\x06 bytes!"
    patched = bytearray(base)
    struct.pack_into("<H", patched, eocd + 20, len(comment))
    m = parse_zip_meta(bytes(patched) + comment)
    assert m.n_entries == 2


def test_refusals():
    base = bytearray(encode_zip_sample(2, b"some text payload"))
    eocd = bytes(base).rindex(b"PK\x05\x06")
    cd_off = struct.unpack_from("<I", base, eocd + 16)[0]

    with pytest.raises(ValueError, match="no EOCD"):
        parse_zip_entries(b"PK\x03\x04" + bytes(40))
    with pytest.raises(ValueError, match="too short"):
        parse_zip_entries(b"PK")

    b = bytearray(base)  # encrypted flag on the first CD entry
    struct.pack_into("<H", b, cd_off + 8, 0x0001)
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_zip_entries(bytes(b))

    b = bytearray(base)  # data-descriptor flag
    struct.pack_into("<H", b, cd_off + 8, 0x0008)
    with pytest.raises(ValueError, match="data descriptor"):
        parse_zip_entries(bytes(b))

    b = bytearray(base)  # unsupported method (bzip2 = 12)
    struct.pack_into("<H", b, cd_off + 10, 12)
    with pytest.raises(NotImplementedError, match="method 12"):
        parse_zip_entries(bytes(b))

    b = bytearray(base)  # ZIP64 sentinel entry count
    struct.pack_into("<H", b, eocd + 8, 0xFFFF)
    struct.pack_into("<H", b, eocd + 10, 0xFFFF)
    with pytest.raises(NotImplementedError, match="ZIP64"):
        parse_zip_entries(bytes(b))

    b = bytearray(base)  # multi-disk
    struct.pack_into("<H", b, eocd + 4, 1)
    struct.pack_into("<H", b, eocd + 6, 1)
    with pytest.raises(NotImplementedError, match="multi-disk"):
        parse_zip_entries(bytes(b))

    b = bytearray(base)  # CD offset lies → does not abut EOCD
    struct.pack_into("<I", b, eocd + 16, cd_off - 1)
    with pytest.raises(ValueError, match="abut"):
        parse_zip_entries(bytes(b))

    b = bytearray(base)  # corrupt the local header sig
    b[0] ^= 0xFF
    with pytest.raises(ValueError, match="local file header signature"):
        parse_zip_entries(bytes(b))

    b = bytearray(base)  # local/central name mismatch
    b[30] ^= 0x01  # first LFH name byte (offset 30 in the first member)
    with pytest.raises(ValueError, match="name mismatch"):
        parse_zip_entries(bytes(b))


def test_crc_verification_catches_payload_corruption():
    raw = bytearray(encode_zip_sample(3, b"A" * 500))
    # Flip a byte inside the first member's deflate payload; the
    # manifest walk still passes, the CRC pass must refuse.
    e = parse_zip_entries(bytes(raw))[0]
    raw[e.offset + 30 + len(e.name) + e.csize // 2] ^= 0x40
    parse_zip_entries(bytes(raw))
    with pytest.raises(ValueError, match="corrupt|CRC-32|size mismatch"):
        parse_zip_meta(bytes(raw))


def test_stored_crc_mismatch_refused():
    raw = bytearray(encode_zip_sample(5, b"text"))
    # The .cls member is STORED; its 1-byte payload is the char '5'.
    idx = bytes(raw).index(b".cls") + 4  # LFH name end → payload
    raw[idx] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32 mismatch"):
        parse_zip_meta(bytes(raw))


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_zip_random_bytes_never_crash(raw):
    try:
        parse_zip_meta(raw)
    except OK:
        pass


_BASE = encode_zip_sample(6, b"fuzz base text " * 8)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=len(_BASE) - 1),
    st.integers(min_value=1, max_value=255),
)
def test_zip_mutated_base_never_crashes(pos, xor):
    b = bytearray(_BASE)
    b[pos] ^= xor
    try:
        parse_zip_meta(bytes(b))
    except OK:
        pass
