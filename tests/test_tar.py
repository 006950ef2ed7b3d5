"""ustar walk + WebDataset manifest units: the hand-rolled walker
must agree with stdlib tarfile member-for-member (an independent
implementation of the same spec), checksums/typeflags/truncation
refuse loudly, and fuzz pins the crash-free contract."""

from __future__ import annotations

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.tar import (
    encode_webdataset,
    member_bytes,
    parse_tar,
    parse_webdataset_meta,
)

OK = (ValueError, NotImplementedError)


def _shard(members: list[tuple[str, bytes]]) -> bytes:
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return bio.getvalue()


def test_walker_agrees_with_stdlib_tarfile():
    blob = _shard(
        [
            ("a.txt", b"alpha"),
            ("a.cls", b"3"),
            ("b.txt", b"x" * 513),  # crosses a block boundary
            ("b.cls", b""),  # zero-length member
            ("b.seg.json", b"{}"),  # dotted extension
        ]
    )
    got = parse_tar(blob)
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(m.name, m.size) for m in got] == [
        (i.name, i.size) for i in tf.getmembers()
    ]
    for m in got:
        assert member_bytes(blob, m) == tf.extractfile(m.name).read()


def test_webdataset_grouping_and_completeness():
    m = parse_webdataset_meta(
        _shard(
            [
                ("a.txt", b"alpha"),
                ("a.cls", b"3"),
                ("b.txt", b"beta"),
                ("b.cls", b"4"),
                ("b.seg.json", b"{}"),
            ]
        )
    )
    assert (m.n_members, m.n_samples) == (5, 2)
    assert m.txt_bytes == 9 and m.complete
    # a sample missing .cls flips completeness
    m2 = parse_webdataset_meta(_shard([("a.txt", b"x"), ("b.txt", b"y"),
                                       ("b.cls", b"1")]))
    assert not m2.complete and m2.n_samples == 2


def test_refusals():
    base = _shard([("a.txt", b"payload")])
    # corrupt a header byte → checksum mismatch
    b = bytearray(base)
    b[40] ^= 0x5A
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(b))
    # cut into member data → overrun
    with pytest.raises(ValueError, match="overruns|zero blocks"):
        parse_tar(base[:600])
    # no members
    with pytest.raises(ValueError, match="no members"):
        parse_tar(b"\0" * 1024)
    # directories/links refused in the WebDataset profile
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo("d")
        info.type = tarfile.DIRTYPE
        tf.addfile(info)
    with pytest.raises(ValueError, match="non-regular"):
        parse_tar(bio.getvalue())
    # extension-less member breaks the sample convention
    with pytest.raises(ValueError, match="no extension"):
        parse_webdataset_meta(_shard([("noext", b"x")]))
    # single zero block is not a valid end
    one_member = base[: 512 + 512]  # header + one data block, no end
    with pytest.raises(ValueError, match="zero blocks|overruns"):
        parse_tar(one_member)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=1600))
def test_tar_random_bytes_never_crash(raw):
    try:
        parse_tar(raw)
    except OK:
        pass


@settings(max_examples=240, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_tar_mutated_valid_payloads_never_crash(pos, junk):
    base = encode_webdataset(2, b"fuzz the shard walker")
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        parse_webdataset_meta(bytes(b))
    except OK:
        pass


def test_registry_query_closed_forms(spark, sf_smoke):
    from orionld_to_hive_spark.operators.tar import webdataset_manifest

    rows = webdataset_manifest(spark, sf_smoke).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        assert r["n_samples"] == 1 and r["complete"]
        assert r["n_members"] == 2 + (r["asset_id"] % 2 == 0)
        extra = (
            8 + len(str(r["asset_id"])) if r["asset_id"] % 2 == 0 else 0
        )
        assert r["total_bytes"] == r["txt_bytes"] + 1 + extra


# --------------------------------------------------------------------------
# tolerant mode (r12): PAX x/g + GNU L — VERDICT r11 item 2


def _shard_fmt(members: list[tuple[str, bytes]], fmt, **kw) -> bytes:
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=fmt, **kw) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return bio.getvalue()


LONG = "key_" + "x" * 120  # >100 chars: forces PAX path / GNU L


def test_tolerant_pax_long_names_match_stdlib():
    from orionld_to_hive_spark.operators.tar import parse_tar_tolerant

    blob = _shard_fmt(
        [(f"{LONG}.txt", b"alpha"), (f"{LONG}.cls", b"3"), ("short.txt", b"s")],
        tarfile.PAX_FORMAT,
    )
    members, n_ext, kinds = parse_tar_tolerant(blob)
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(m.name, m.size) for m in members] == [
        (i.name, i.size) for i in tf.getmembers()
    ]
    # one x header per long-named member, none for the short one
    assert n_ext == 2 and kinds == {"pax"}
    for m in members:
        assert member_bytes(blob, m) == tf.extractfile(m.name).read()
    # strict mode refuses the same shard loudly
    with pytest.raises(ValueError, match="non-regular"):
        parse_tar(blob)


def test_tolerant_gnu_long_names_match_stdlib():
    from orionld_to_hive_spark.operators.tar import parse_tar_tolerant

    blob = _shard_fmt(
        [(f"{LONG}.txt", b"x" * 513), (f"{LONG}.cls", b"")],
        tarfile.GNU_FORMAT,
    )
    members, n_ext, kinds = parse_tar_tolerant(blob)
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(m.name, m.size) for m in members] == [
        (i.name, i.size) for i in tf.getmembers()
    ]
    assert n_ext == 2 and kinds == {"gnu"}
    for m in members:
        assert member_bytes(blob, m) == tf.extractfile(m.name).read()
    with pytest.raises(ValueError, match="non-regular"):
        parse_tar(blob)


def test_tolerant_pax_global_header():
    from orionld_to_hive_spark.operators.tar import parse_tar_tolerant

    blob = _shard_fmt(
        [("a.txt", b"alpha"), ("a.cls", b"1")],
        tarfile.PAX_FORMAT,
        pax_headers={"comment": "global metadata"},
    )
    members, n_ext, kinds = parse_tar_tolerant(blob)
    assert [m.name for m in members] == ["a.txt", "a.cls"]
    assert n_ext == 1 and kinds == {"pax"}  # the one g header


def test_tolerant_still_checksum_verifies_extension_headers():
    from orionld_to_hive_spark.operators.tar import parse_tar_tolerant

    blob = _shard_fmt([(f"{LONG}.txt", b"alpha")], tarfile.GNU_FORMAT)
    b = bytearray(blob)
    b[40] ^= 0x5A  # corrupt the L header itself (first header block)
    with pytest.raises(ValueError, match="checksum"):
        parse_tar_tolerant(bytes(b))


def test_tolerant_refuses_dirs_and_dangling_extensions():
    from orionld_to_hive_spark.operators.tar import parse_tar_tolerant

    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.PAX_FORMAT) as tf:
        info = tarfile.TarInfo("d")
        info.type = tarfile.DIRTYPE
        tf.addfile(info)
    with pytest.raises(ValueError, match="non-regular"):
        parse_tar_tolerant(bio.getvalue())
    # an x header with no member after it: build PAX shard, drop the
    # member header + end blocks after the extension header
    blob = _shard_fmt([(f"{LONG}.txt", b"")], tarfile.PAX_FORMAT)
    # layout: [x hdr][x body ...][member hdr][end][end]; keep x hdr +
    # its body then append clean end blocks
    from orionld_to_hive_spark.operators.tar import parse_tar as _pt  # noqa
    xsize = int(blob[124:136].split(b"\0")[0] or b"0", 8)
    xlen = 512 + (xsize + 511) // 512 * 512
    with pytest.raises(ValueError, match="without a following member|no members"):
        parse_tar_tolerant(blob[:xlen] + b"\0" * 1024)


def test_longkey_encoder_closed_forms():
    from orionld_to_hive_spark.operators.tar import (
        encode_webdataset_longkey,
        parse_webdataset_meta_tolerant,
    )

    for doc_id, text in [(0, b"even and mod3"), (1, b"odd"), (3, b"odd mod3"),
                         (4, b"even"), (6, b""), (7, b"x" * 600)]:
        m = parse_webdataset_meta_tolerant(
            encode_webdataset_longkey(doc_id, text)
        )
        want_members = 2 + (doc_id % 3 == 0)
        assert m.n_members == want_members
        assert m.n_samples == 1 and m.complete
        assert m.txt_bytes == len(text)
        assert m.n_ext == want_members
        assert m.ext_kind == ("pax" if doc_id % 2 == 0 else "gnu")
        extra = 8 + len(str(doc_id)) if doc_id % 3 == 0 else 0
        assert m.total_bytes == len(text) + 1 + extra


@settings(max_examples=240, deadline=None)
@given(
    st.integers(min_value=0, max_value=1 << 30),
    st.binary(min_size=1, max_size=6),
)
def test_tolerant_mutated_payloads_never_crash(pos, junk):
    from orionld_to_hive_spark.operators.tar import (
        encode_webdataset_longkey,
        parse_webdataset_meta_tolerant,
    )

    base = encode_webdataset_longkey(3, b"fuzz the tolerant walker")
    b = bytearray(base)
    pos %= len(b)
    b[pos : pos + len(junk)] = junk
    try:
        parse_webdataset_meta_tolerant(bytes(b))
    except OK:
        pass
