"""PDF triage units: closed-form roundtrips, incremental-update
shadowing, indirect /Length, page-tree verification, the refusal
matrix (xref streams, encryption, /Prev cycles, malformed entries),
and fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.pdf import (
    encode_pdf,
    parse_pdf_meta,
)

OK = (ValueError, NotImplementedError)


def test_roundtrip_closed_forms():
    text = b"Hello PDF content stream " * 10
    # id 5: n_pages=2, odd (direct length), not %3
    m = parse_pdf_meta(encode_pdf(5, text))
    assert m.version == "1.5"
    assert m.n_pages == 2
    assert m.n_objects == 2 + 2 * 2  # catalog+pages+2 pages+2 streams
    assert m.content_bytes == len(text) + 5
    assert m.n_revisions == 1


def test_indirect_length_and_incremental_update():
    text = b"x" * 321
    # id 6: even (indirect /Length), %3==0 (two revisions), n_pages=3
    m = parse_pdf_meta(encode_pdf(6, text))
    assert m.version == "1.6"
    assert m.n_pages == 3
    assert m.n_objects == 2 + 2 * 3 + 1  # + the indirect length int
    assert m.content_bytes == len(text) + 10
    assert m.n_revisions == 2


def test_single_page_empty_text():
    m = parse_pdf_meta(encode_pdf(12, b""))
    assert m.n_pages == 1 and m.content_bytes == 0 and m.n_revisions == 2


def test_newer_revision_shadows_older():
    # The update replaces object 1; the parser must read the NEW
    # catalog (which still resolves) — and the object count must not
    # double-count the shadowed one.
    raw = encode_pdf(3, b"t")  # %3==0 → 2 revisions, n_pages=4
    m = parse_pdf_meta(raw)
    assert m.n_revisions == 2 and m.n_objects == 2 + 2 * 4
    # Corrupt the OLD catalog body: parse must still succeed because
    # only the revision-2 offset is consulted for object 1.
    old_cat = raw.index(b"/Type /Catalog")
    b = bytearray(raw)
    b[old_cat : old_cat + 5] = b"/Typo"
    assert parse_pdf_meta(bytes(b)).n_pages == 4


def test_refusals():
    base = encode_pdf(1, b"some text")  # 1 revision, 2 pages

    with pytest.raises(ValueError, match="%PDF header"):
        parse_pdf_meta(b"not a pdf")
    with pytest.raises(ValueError, match="no startxref"):
        parse_pdf_meta(b"%PDF-1.4\n%%EOF\n")

    b = bytearray(base)  # startxref → a NON-XRef object: since r13
    # xref streams parse, the failure is now "not /Type /XRef"
    sx = bytes(b).rindex(b"startxref")
    end = bytes(b).index(b"\n", sx + 10)
    new = str(bytes(b).index(b"1 0 obj")).rjust(end - sx - 10)
    b[sx + 10 : end] = new.encode()
    with pytest.raises(ValueError, match="not /Type /XRef"):
        parse_pdf_meta(bytes(b))

    raw = base.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R", 1)
    # trailer grew → startxref still points at 'xref' (it precedes the
    # trailer), so the refusal is /Encrypt
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_pdf_meta(raw)

    raw = base.replace(b"/Count 2", b"/Count 3", 1)
    with pytest.raises(ValueError, match="Count"):
        parse_pdf_meta(raw)

    raw = base.replace(b"65535 f ", b"65535 x ", 1)
    with pytest.raises(ValueError, match="malformed 20-byte"):
        parse_pdf_meta(raw)

    # /Prev pointing at the same table → cycle
    sx = base.rindex(b"startxref")
    xref_off = int(base[sx + 10 : base.index(b"\n", sx + 10)])
    raw = base.replace(
        b"/Root 1 0 R >>", f"/Root 1 0 R /Prev {xref_off} >>".encode(), 1
    )
    with pytest.raises(ValueError, match="cycle"):
        parse_pdf_meta(raw)

    # stream /Length lies → endstream not framed
    raw = base.replace(b"<< /Length 9 >>", b"<< /Length 4 >>", 1)
    with pytest.raises(ValueError, match="frame endstream"):
        parse_pdf_meta(raw)

    # name escapes refused
    raw = base.replace(b"/Type /Catalog", b"/Type /Ca#61og", 1)  # same length
    with pytest.raises(NotImplementedError, match="escapes"):
        parse_pdf_meta(raw)


def test_xref_offset_must_point_at_the_object():
    base = encode_pdf(7, b"abc")
    # Shift object 3's xref offset by one: the `num gen obj` check fires.
    m = base.index(b"xref\n")
    # entry for object 3 is the 4th 20-byte record after the header line
    hdr_end = base.index(b"\n", base.index(b"\n", m) + 1) + 1
    rec = hdr_end + 3 * 20
    old = int(base[rec : rec + 10])
    raw = base[:rec] + f"{old + 1:010d}".encode() + base[rec + 10 :]
    with pytest.raises(ValueError, match="points at"):
        parse_pdf_meta(raw)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_pdf_random_bytes_never_crash(raw):
    try:
        parse_pdf_meta(raw)
    except OK:
        pass


_BASE = encode_pdf(9, b"fuzz pdf body " * 4)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_pdf_mutated_base_never_crashes(pos, xor):
    b = bytearray(_BASE)
    b[pos % len(b)] ^= xor
    try:
        parse_pdf_meta(bytes(b))
    except OK:
        pass
