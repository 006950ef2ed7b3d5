"""Parquet footer walk units: agreement with pyarrow's ParquetFile as
an independent implementation on every warehouse table AND on
multi-row-group files it writes, frame/consistency refusals, and fuzz."""

from __future__ import annotations

import glob
import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orionld_to_hive_spark.operators.parquet_meta import parse_parquet_footer

OK = (ValueError, NotImplementedError)


def test_agreement_with_pyarrow_on_the_warehouse():
    paths = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
    assert len(paths) == 10
    for p in paths:
        with open(p, "rb") as fh:
            raw = fh.read()
        m = parse_parquet_footer(raw)
        md = pq.ParquetFile(p).metadata
        assert m.num_rows == md.num_rows, p
        assert m.n_row_groups == md.num_row_groups, p
        assert m.n_leaves == md.num_columns, p
        assert m.created_by == md.created_by, p
        assert m.rg_rows == [
            md.row_group(i).num_rows for i in range(md.num_row_groups)
        ], p


def _write(table: pa.Table, **kw) -> bytes:
    bio = io.BytesIO()
    pq.write_table(table, bio, **kw)
    return bio.getvalue()


def test_multi_row_group_and_nested_schema():
    table = pa.table(
        {
            "a": list(range(1000)),
            "b": [f"s{i}" for i in range(1000)],
            "c": [[i, i + 1] for i in range(1000)],  # nested list column
        }
    )
    raw = _write(table, row_group_size=128)
    m = parse_parquet_footer(raw)
    md = pq.ParquetFile(io.BytesIO(raw)).metadata
    assert m.n_row_groups == md.num_row_groups >= 7
    assert m.rg_rows == [md.row_group(i).num_rows for i in range(md.num_row_groups)]
    assert m.num_rows == 1000
    assert m.n_leaves == md.num_columns  # the list column counts leaves, not groups


def test_refusals():
    good = _write(pa.table({"x": [1, 2, 3]}))

    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(good[:-4] + b"NOPE")
    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(b"PAR1PAR")

    b = bytearray(good)  # absurd footer length
    b[-8:-4] = (len(good) * 2).to_bytes(4, "little")
    with pytest.raises(ValueError, match="footer length"):
        parse_parquet_footer(bytes(b))

    # corrupt the num_rows varint inside the footer: either the thrift
    # walk breaks or the rg-consistency check fires — never a crash
    footer_len = int.from_bytes(good[-8:-4], "little")
    start = len(good) - 8 - footer_len
    for off in range(start, start + footer_len, 7):
        b = bytearray(good)
        b[off] ^= 0x5A
        try:
            parse_parquet_footer(bytes(b))
        except OK:
            pass


_BASE = _write(pa.table({"x": list(range(50)), "y": ["a"] * 50}))


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_parquet_random_bytes_never_crash(raw):
    try:
        parse_parquet_footer(raw)
    except OK:
        pass


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_parquet_mutated_base_never_crashes(pos, xor):
    b = bytearray(_BASE)
    b[pos % len(b)] ^= xor
    try:
        parse_parquet_footer(bytes(b))
    except OK:
        pass
