"""WARC framing units: hand-built record streams pin the version
line, mandatory headers, Content-Length byte framing, the CRLF CRLF
terminator, per-record gzip members (Common Crawl profile), and the
malformed-stream refusals; fuzz pins the crash-free contract like
mp4/mp3/gif/jpeg."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.warc import (
    _gzip_member,
    encode_warc,
    encode_warc_record,
    parse_warc,
    parse_warc_meta,
)

OK = (ValueError, NotImplementedError)


def test_plain_multi_record_walk():
    stream = (
        encode_warc_record("warcinfo", "<urn:uuid:i>", b"software: test")
        + encode_warc_record(
            "response", "<urn:uuid:r1>", b"hello", target_uri="http://a/1"
        )
        + encode_warc_record(
            "response", "<urn:uuid:r2>", b"world!!", target_uri="http://a/2"
        )
    )
    recs = parse_warc(stream)
    assert [r.rec_type for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1].payload == b"hello" and recs[2].content_length == 7
    m = parse_warc_meta(stream)
    assert (m.n_records, m.n_response, m.response_bytes) == (3, 2, 12)
    assert m.first_uri == "http://a/1" and not m.gzipped


def test_payload_with_crlf_crlf_inside_is_framed_by_length():
    # record splitting MUST be by Content-Length, not by scanning for
    # the terminator: a payload containing CRLF CRLF (every HTTP
    # response does) must not end the record early
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>WARC/1.0</html>"
    stream = encode_warc_record("response", "<u>", body, "http://x") + (
        encode_warc_record("metadata", "<m>", b"ok")
    )
    recs = parse_warc(stream)
    assert recs[0].payload == body
    assert recs[1].rec_type == "metadata"


def test_gzip_member_profile_roundtrip():
    m = parse_warc_meta(encode_warc(4, b"gzipped doc"))
    assert m.gzipped and m.n_records == 2 and m.response_bytes == 11
    # plain profile for odd ids
    m2 = parse_warc_meta(encode_warc(5, b"plain doc"))
    assert not m2.gzipped and m2.n_records == 2


def test_warc_1_1_accepted_other_versions_refused():
    ok = encode_warc_record("response", "<u>", b"x", "u", version=b"WARC/1.1")
    assert parse_warc(ok)[0].rec_type == "response"
    bad = encode_warc_record("response", "<u>", b"x", "u", version=b"WARC/0.18")
    with pytest.raises(ValueError, match="unsupported WARC version"):
        parse_warc(bad)


def test_refusals():
    with pytest.raises(ValueError, match="too short"):
        parse_warc(b"")
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\nbody\r\n\r\n")
    # missing mandatory header
    s = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="mandatory"):
        parse_warc(s)
    # non-numeric length
    s = (
        b"WARC/1.0\r\nWARC-Type: x\r\nWARC-Record-ID: <u>\r\n"
        b"WARC-Date: d\r\nContent-Length: ten\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError, match="non-numeric"):
        parse_warc(s)
    # length overrun
    base = encode_warc_record("response", "<u>", b"abcdef", "u")
    with pytest.raises(ValueError, match="overruns|terminator"):
        parse_warc(base[:-6])
    # missing terminator
    broken = base.replace(b"abcdef\r\n\r\n", b"abcdefXXXX")
    with pytest.raises(ValueError, match="terminator"):
        parse_warc(broken)
    # one gzip member holding two records breaks the storage profile
    two = encode_warc_record("response", "<a>", b"x", "u") + encode_warc_record(
        "metadata", "<b>", b"y"
    )
    with pytest.raises(ValueError, match="more than one record"):
        parse_warc(_gzip_member(two))
    # truncated gzip member
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(encode_warc(0, b"payload")[:-5])
    # trailing garbage after members
    with pytest.raises(ValueError, match="trailing bytes"):
        parse_warc(encode_warc(0, b"p") + b"JUNK")


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_warc_random_bytes_never_crash(raw):
    try:
        parse_warc(raw)
    except OK:
        pass


@settings(max_examples=240, deadline=None)
@given(
    st.sampled_from([0, 1]),  # gzip and plain base
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_warc_mutated_valid_payloads_never_crash(base_id, pos, junk):
    base = encode_warc(base_id, b"fuzz the crawl container")
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        parse_warc(bytes(b))
    except OK:
        pass
    except zlib.error:
        pytest.fail("zlib.error leaked through the decode boundary")


def test_registry_query_closed_forms(spark, sf_smoke):
    from orionld_to_hive_spark.operators.warc import multimodal_warc_meta

    rows = multimodal_warc_meta(spark, sf_smoke).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        assert r["n_records"] == 2 and r["n_response"] == 1
        assert r["total_bytes"] == r["response_bytes"] + 14
        assert r["first_uri"] == f"http://example.com/doc/{r['asset_id']}"
        assert r["gzipped"] == (r["asset_id"] % 2 == 0)


# ------------------------------------------------- HTTP extraction


def test_http_split_and_body_framing():
    from orionld_to_hive_spark.operators.warc import parse_http_response

    body = "héllo wörld".encode("utf-8")
    msg = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n"
        + f"Content-Length: {len(body)}".encode() + b"\r\n\r\n" + body
    )
    h = parse_http_response(msg)
    assert h.status == 200
    assert h.content_type == "text/plain; charset=utf-8"
    assert h.body == body


def test_http_refusals():
    import pytest

    from orionld_to_hive_spark.operators.warc import parse_http_response

    with pytest.raises(ValueError, match="not terminated"):
        parse_http_response(b"HTTP/1.1 200 OK\r\nX: 1")
    with pytest.raises(ValueError, match="status line"):
        parse_http_response(b"ICY 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="non-numeric"):
        parse_http_response(b"HTTP/1.1 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_http_response(b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort")
    # chunked now DECODES (r13); only non-chunked codings refuse
    h = parse_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n0\r\n\r\n"
    )
    assert h.chunked and h.body == b"" and h.n_chunks == 0
    with pytest.raises(ValueError, match="not supported"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\nx"
        )
    with pytest.raises(ValueError, match="both Transfer-Encoding"):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Length: 5\r\n\r\n0\r\n\r\n"
        )


def test_extraction_roundtrips_text_bit_for_bit(spark, sf_smoke):
    import pyarrow.parquet as pq

    from orionld_to_hive_spark.operators.warc import warc_text_extraction

    rows = {r["asset_id"]: r for r in warc_text_extraction(spark, sf_smoke).collect()}
    t = pq.read_table(f"{sf_smoke}/documents.parquet")
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        r = rows[doc_id]
        assert r["body_text"] == text, doc_id
        assert r["http_status"] == 200
        assert r["body_chars"] == len(text)


# --------------------------------------------------------------------------
# charset-aware decode (r12): declared → utf-8 → latin-1 — VERDICT item 3


def test_charset_of_parsing():
    from orionld_to_hive_spark.operators.warc import charset_of

    assert charset_of("text/plain; charset=utf-8") == "utf-8"
    assert charset_of('text/html; charset="windows-1252"') == "windows-1252"
    assert charset_of("text/html; CHARSET=ISO-8859-1") == "ISO-8859-1"
    assert charset_of("text/html;charset='shift_jis'") == "shift_jis"
    assert charset_of("text/html; boundary=x; charset=utf-8") == "utf-8"
    assert charset_of("text/html") is None
    assert charset_of("text/html; charset=") is None
    assert charset_of(None) is None


def test_decode_chain_declared_utf8_latin1():
    from orionld_to_hive_spark.operators.warc import decode_http_body

    # declared fires, including a non-utf-8 byte
    t, d, f = decode_http_body(b"caf\xe9", "text/plain; charset=ISO-8859-1")
    assert (t, d, f) == ("café", "ISO-8859-1", "declared")
    # cp1252 euro at 0x80 — proves the right codec ran (latin-1 would
    # give U+0080, utf-8 would fail)
    t, d, f = decode_http_body(b"\x80", 'x; charset="windows-1252"')
    assert (t, f) == ("€", "declared")
    # shift-jis (the zoo beyond latin scripts)
    t, d, f = decode_http_body("日本語".encode("shift_jis"),
                               "text/html; charset=shift_jis")
    assert (t, f) == ("日本語", "declared")
    # no declared charset, valid utf-8 → utf-8 fallback
    t, d, f = decode_http_body("naïve".encode("utf-8"), "text/html")
    assert (t, d, f) == ("naïve", None, "utf-8")
    # no declared, invalid utf-8 → latin-1 terminal fallback
    t, d, f = decode_http_body(b"a\xe9b", "text/html")
    assert (t, f) == ("aéb", "latin-1")
    # unknown declared codec falls through, not raises
    t, d, f = decode_http_body(b"ok", "text/html; charset=x-unknown")
    assert (t, d, f) == ("ok", "x-unknown", "utf-8")
    # declared codec that FAILS on the bytes falls through too
    t, d, f = decode_http_body(b"\xff\xfe\xff", "text/html; charset=utf-8")
    assert f == "latin-1" and d == "utf-8"
    # non-text codec names must not raise (bytes.decode refuses them)
    t, d, f = decode_http_body(b"ok", "text/html; charset=base64")
    assert f == "utf-8"


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64), st.text(max_size=24))
def test_decode_chain_never_raises(body, charset):
    from orionld_to_hive_spark.operators.warc import decode_http_body

    text, declared, fired = decode_http_body(
        body, f"text/html; charset={charset}" if charset else "text/html"
    )
    assert isinstance(text, str)
    assert fired in ("declared", "utf-8", "latin-1")
    # the terminal fallback means SOME decode always succeeds
    if fired == "latin-1":
        assert len(text) == len(body)


def test_charset_fixture_branches():
    from orionld_to_hive_spark.operators.warc import (
        decode_http_body,
        encode_warc_http_charset,
        parse_http_response,
        parse_warc,
    )

    src = "héllo = wörld ~ plain"
    ascii_part = "".join(ch for ch in src if " " <= ch <= "~")
    want = {
        0: (src, "declared"),
        1: (ascii_part + "€", "declared"),
        2: (src, "utf-8"),
        3: (ascii_part + "é", "declared"),
        4: (ascii_part + "é", "latin-1"),
        5: (src, "utf-8"),
    }
    for doc_id in range(6):
        recs = parse_warc(encode_warc_http_charset(doc_id, src))
        resp = next(r for r in recs if r.rec_type == "response")
        h = parse_http_response(resp.payload)
        text, declared, fired = decode_http_body(h.body, h.content_type)
        assert (text, fired) == want[doc_id], doc_id


def test_content_encoding_fixture_branches():
    from orionld_to_hive_spark.operators.warc import (
        decode_http_body_ce,
        encode_warc_http_ce,
        parse_http_response,
        parse_warc,
    )

    src = "héllo = wörld ~ plain"
    ascii_part = "".join(ch for ch in src if " " <= ch <= "~")
    want = {
        0: (src, "identity", "declared"),
        1: (src, "gzip", "utf-8"),
        2: (src, "deflate", "declared"),
        3: (src, "deflate", "utf-8"),
        4: (ascii_part + "€", "gzip", "declared"),
    }
    for doc_id in range(5):
        recs = parse_warc(encode_warc_http_ce(doc_id, src))
        resp = next(r for r in recs if r.rec_type == "response")
        h = parse_http_response(resp.payload)
        text, declared, fired, codec = decode_http_body_ce(
            h.body, h.content_type, h.content_encoding
        )
        assert (text, codec, fired) == want[doc_id], doc_id


def test_inflate_http_body_refusals_and_tolerance():
    import zlib

    import pytest

    from orionld_to_hive_spark.operators.warc import inflate_http_body

    with pytest.raises(NotImplementedError, match="br"):
        inflate_http_body(b"x", "br")
    with pytest.raises(NotImplementedError, match="chains"):
        inflate_http_body(b"x", "gzip, br")
    with pytest.raises(ValueError, match="gzip"):
        inflate_http_body(b"not gzip at all", "gzip")
    with pytest.raises(ValueError, match="deflate"):
        inflate_http_body(b"\x00" * 3, "deflate")
    # RFC-correct zlib wrapper AND the bare-stream server bug both decode
    co = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
    bare = co.compress(b"abc") + co.flush()
    assert inflate_http_body(bare, "deflate") == (b"abc", "deflate")
    assert inflate_http_body(zlib.compress(b"abc"), "deflate") == (b"abc", "deflate")
    assert inflate_http_body(b"abc", None) == (b"abc", "identity")
    assert inflate_http_body(b"abc", "identity") == (b"abc", "identity")


def test_dechunk_strict_framing():
    import pytest

    from orionld_to_hive_spark.operators.warc import _dechunk

    # happy path with extensions and a trailer
    body = (b"7;x=1\r\nabcdefg\r\n" b"3\r\nhij\r\n" b"0\r\n"
            b"X-Sum: 1\r\n" b"\r\n")
    assert _dechunk(body) == (b"abcdefghij", 2)
    with pytest.raises(ValueError, match="bad chunk size"):
        _dechunk(b"zz\r\nx\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="truncated chunk"):
        _dechunk(b"9\r\nshort")
    with pytest.raises(ValueError, match="not followed by CRLF"):
        _dechunk(b"3\r\nabcXX0\r\n\r\n")
    with pytest.raises(ValueError, match="after the chunked terminator"):
        _dechunk(b"0\r\n\r\nEXTRA")
    with pytest.raises(ValueError, match="trailer not terminated"):
        _dechunk(b"0\r\nX-Sum: 1")
    with pytest.raises(ValueError, match="malformed trailer"):
        _dechunk(b"0\r\nnocolon\r\n\r\n")


def test_chunked_fixture_branches():
    from orionld_to_hive_spark.operators.warc import (
        encode_warc_http_chunked,
        parse_http_response,
        parse_warc,
    )

    src = "chunk me please, I am twenty-nine"  # 33 bytes utf-8
    data = src.encode()
    for doc_id in range(6):
        recs = parse_warc(encode_warc_http_chunked(doc_id, data))
        resp = next(r for r in recs if r.rec_type == "response")
        h = parse_http_response(resp.payload)
        assert h.body == data, doc_id
        if doc_id % 3 == 0:
            assert not h.chunked and h.n_chunks == 0
        else:
            assert h.chunked
            assert h.n_chunks == (len(data) + 6) // 7, doc_id


def test_cdx_offsets_and_length_constants():
    """Pins the WARC_CDX_SQL closed forms against the writer: L0 =
    139+digits, L1 = 163+2*digits+digits(tlen)+tlen, L2 = 138+digits,
    and the walker's offsets are the running sums."""
    import hashlib

    from orionld_to_hive_spark.operators.warc import (
        encode_warc_cdx,
        parse_warc_offsets,
    )

    for d in (0, 7, 42, 999, 12345):
        text = b"cdx payload " * (d % 9 + 1)
        recs = parse_warc_offsets(encode_warc_cdx(d, text))
        assert [r.rec_type for r, _, _ in recs] == [
            "warcinfo", "response", "metadata"]
        dg, tl = len(str(d)), len(text)
        td = len(str(tl))
        (r0, o0, l0), (r1, o1, l1), (r2, o2, l2) = recs
        assert (o0, l0) == (0, 139 + dg), d
        assert (o1, l1) == (139 + dg, 163 + 2 * dg + td + tl), d
        assert (o2, l2) == (o1 + l1, 138 + dg), d
        assert r1.payload == text
        assert hashlib.sha256(r1.payload).hexdigest() == hashlib.sha256(
            text).hexdigest()


def test_cdx_refuses_gzip_profile():
    import pytest

    from orionld_to_hive_spark.operators.warc import (
        encode_warc,
        parse_warc_offsets,
    )

    with pytest.raises(ValueError, match="plain profile"):
        parse_warc_offsets(encode_warc(0, b"x"))  # even id → gzip members
