"""MIME/EML walk units: agreement with stdlib email.parser as an
independent implementation (tree + decoded payloads), QP round-trip
properties, framing edge cases, the refusal matrix, and fuzz."""

from __future__ import annotations

import email
import email.policy

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.mime import (
    _leaves,
    decode_qp,
    encode_eml,
    encode_qp,
    parse_eml,
)

OK = (ValueError, NotImplementedError)


def _stdlib_leaves(raw: bytes):
    msg = email.message_from_bytes(raw, policy=email.policy.default)
    return [p for p in msg.walk() if not p.is_multipart()]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 6, 7, 42, 99])
def test_agreement_with_stdlib(doc_id):
    text = ("héllo wörld %d — " % doc_id * 9).encode("utf-8")
    raw = encode_eml(doc_id, text)
    ours = _leaves(parse_eml(raw))
    theirs = _stdlib_leaves(raw)
    assert [p.content_type for p in ours] == [
        p.get_content_type() for p in theirs
    ]
    for o, t in zip(ours, theirs):
        assert o.body == t.get_payload(decode=True), o.content_type


def test_closed_forms_and_bit_exact_body():
    text = "line1\nline2 with € and =signs=\n".encode("utf-8")
    for doc_id in (4, 5, 6):  # QP, base64, QP+nested
        msg = parse_eml(encode_eml(doc_id, text))
        leaves = _leaves(msg)
        body = next(p for p in leaves if p.content_type == "text/plain")
        assert body.body == text  # bit-for-bit
        assert msg.headers["subject"] == f"doc {doc_id}"
        assert len(leaves) == (3 if doc_id % 3 == 0 else 2)
        att = next(p for p in leaves if p.content_type == "application/octet-stream")
        assert att.body == bytes([doc_id % 256]) * (doc_id % 7 + 1)


def test_empty_text_both_encodings():
    for doc_id in (2, 7):
        body = next(
            p for p in _leaves(parse_eml(encode_eml(doc_id, b"")))
            if p.content_type == "text/plain"
        )
        assert body.body == b""


def test_header_unfolding():
    raw = encode_eml(1, b"x").replace(
        b"Subject: doc 1\r\n", b"Subject: doc\r\n\t1\r\n"
    )
    assert parse_eml(raw).headers["subject"] == "doc 1"


def test_delimiter_never_forged_by_body_text():
    # Text that CONTAINS the outer delimiter line: the CTEs encode
    # CRLF, so the wire never exposes it.
    evil = b"\r\n--bnd-8\r\nContent-Type: oops\r\n"
    msg = parse_eml(encode_eml(8, evil))
    body = next(p for p in _leaves(msg) if p.content_type == "text/plain")
    assert body.body == evil


def test_refusals():
    base = encode_eml(10, b"hello mime")

    with pytest.raises(ValueError, match="MIME-Version"):
        parse_eml(base.replace(b"MIME-Version: 1.0\r\n", b""))
    with pytest.raises(ValueError, match="blank line"):
        parse_eml(b"Subject: x\r\nNo-Blank: y")
    with pytest.raises(ValueError, match="boundary parameter"):
        parse_eml(base.replace(b'; boundary="bnd-10"', b""))
    with pytest.raises(ValueError, match="unterminated"):
        parse_eml(base[: base.rindex(b"--bnd-10--")])
    with pytest.raises(ValueError, match="duplicate header"):
        parse_eml(b"Subject: a\r\nSubject: b\r\nMIME-Version: 1.0\r\n\r\nx")
    with pytest.raises(ValueError, match="without ':'"):
        parse_eml(base.replace(b"From: crawler@example.com", b"From crawler"))
    with pytest.raises(NotImplementedError, match="x-uuencode"):
        parse_eml(base.replace(b"Encoding: quoted-printable", b"Encoding: x-uuencode"))
    with pytest.raises(ValueError, match="quoted-printable escape"):
        parse_eml(base.replace(b"hello", b"hel=ZZo"))
    # corrupt a base64 byte in the attachment with a non-alphabet char
    att = base.rindex(b"base64\r\n\r\n") + 10
    with pytest.raises(ValueError, match="base64"):
        parse_eml(base[:att] + b"*" + base[att + 1 :])


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_qp_roundtrip_exact(data):
    enc = encode_qp(data)
    assert decode_qp(enc) == data
    # wire constraint: every encoded line fits in 76 chars
    assert all(len(line) <= 76 for line in enc.split(b"\r\n"))
    # stdlib agrees with our decoder on our encoder's output
    import quopri

    assert quopri.decodestring(enc) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400), st.integers(min_value=0, max_value=100))
def test_eml_roundtrip_arbitrary_bytes(data, doc_id):
    body = next(
        p for p in _leaves(parse_eml(encode_eml(doc_id, data)))
        if p.content_type == "text/plain"
    )
    assert body.body == data


_BASE = encode_eml(12, b"fuzz mime base " * 4)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_mime_mutated_base_never_crashes(pos, xor):
    b = bytearray(_BASE)
    b[pos % len(b)] ^= xor
    try:
        parse_eml(bytes(b))
    except OK:
        pass


def test_trace_headers_may_repeat_structural_may_not():
    """ADVICE r12: real RFC 5322 mail repeats trace headers (Received,
    Return-Path); only duplicates of the structural headers the walker
    consumes refuse. First occurrence wins for repeatable ones."""
    import pytest

    from orionld_to_hive_spark.operators.mime import _parse_headers

    h = _parse_headers(
        b"Received: from a\r\n"
        b"Received: from b\r\n"
        b"X-Trace: 1\r\n"
        b"X-Trace: 2\r\n"
        b"Content-Type: text/plain\r\n"
    )
    assert h["received"] == "from a"
    assert h["x-trace"] == "1"
    with pytest.raises(ValueError, match="duplicate"):
        _parse_headers(b"Content-Type: a/b\r\nContent-Type: c/d\r\n")
    with pytest.raises(ValueError, match="duplicate"):
        _parse_headers(b"Subject: x\r\nSubject: y\r\n")
