"""Parquet footer audit — hand-rolled Thrift compact-protocol walk.

Beyond-reference capability: at 100 TB the lakehouse ITSELF is a
corpus of containers — millions of parquet files whose health
(row counts, row-group shapes, writer provenance) a pipeline audits
constantly, and fast: the footer is a few KB at the file tail, so the
audit reads ~0.01% of the bytes it certifies. This operator walks the
REAL wire format — the PAR1 magic frame and the Thrift
compact-protocol FileMetaData struct — rather than asking a parquet
library, which is the point: it cross-checks what the engines believe.

Hand-rolled from the public specs (Apache Thrift compact protocol +
parquet.thrift):

  - file frame: leading "PAR1", trailing `<u32le footer_len>PAR1`;
    the FileMetaData struct occupies the footer_len bytes before the
    trailer.
  - compact struct: field header byte `(id_delta << 4) | type`
    (delta 0 → long form with a zigzag-varint id), STOP = 0x00;
    bools encode their VALUE in the type nibble (1 true / 2 false);
    i16/i32/i64 are zigzag varints; binary is varint length + bytes;
    list header `(size << 4) | elem_type` with size 15 escaping to a
    varint; maps are varint size + a key/value type byte + pairs.
  - FileMetaData: 1 version(i32), 2 schema(list<SchemaElement>),
    3 num_rows(i64), 4 row_groups(list<RowGroup>), 6 created_by
    (string); RowGroup: 3 num_rows(i64). Unknown fields are decoded
    generically (never skipped blind — a malformed header refuses).

The walker verifies INTERNAL consistency — Σ row-group num_rows must
equal the file-level num_rows — and the differential oracle verifies
EXTERNAL truth: the footer's row count must equal what DuckDB counts
by actually scanning every row of the same table. The units pin the
full parse (row groups, created_by, schema leaves) against pyarrow's
ParquetFile as an independent implementation.
"""
from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TABLES = (
    "customer documents embeddings events lineitem "
    "nation orders part region supplier"
).split()


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.b):
            raise ValueError("parquet: truncated thrift data")
        v = self.b[self.pos]
        self.pos += 1
        return v

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            c = self.byte()
            out |= (c & 0x7F) << shift
            if not c & 0x80:
                return out
            shift += 7
            if shift > 63:
                raise ValueError("parquet: varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        n = self.varint()
        if self.pos + n > len(self.b):
            raise ValueError("parquet: binary field overruns the footer")
        out = self.b[self.pos : self.pos + n]
        self.pos += n
        return out

    def value(self, ttype: int):
        if ttype in (1, 2):  # bool as a LIST/MAP element: one byte
            return self.byte() in (1,)
        if ttype == 3:  # i8: one signed byte, not a varint
            v = self.byte()
            return v - 256 if v >= 128 else v
        if ttype in (4, 5, 6):  # i16/i32/i64
            return self.zigzag()
        if ttype == 7:  # double (fixed 8 bytes, little-endian)
            if self.pos + 8 > len(self.b):
                raise ValueError("parquet: truncated double")
            self.pos += 8
            return None
        if ttype == 8:  # binary/string
            return self.binary()
        if ttype in (9, 10):  # list/set
            head = self.byte()
            size = head >> 4
            elem = head & 0x0F
            if size == 15:
                size = self.varint()
            return [self.value(elem) for _ in range(size)]
        if ttype == 11:  # map
            size = self.varint()
            if size == 0:
                return {}
            kv = self.byte()
            ktype, vtype = kv >> 4, kv & 0x0F
            return {self.value(ktype): self.value(vtype) for _ in range(size)}
        if ttype == 12:  # struct
            return self.struct()
        raise ValueError(f"parquet: unknown thrift compact type {ttype}")

    def struct(self) -> dict[int, object]:
        fields: dict[int, object] = {}
        last_id = 0
        while True:
            head = self.byte()
            if head == 0:
                return fields
            delta = head >> 4
            ttype = head & 0x0F
            fid = last_id + delta if delta else self.zigzag()
            last_id = fid
            if ttype == 1:
                fields[fid] = True
            elif ttype == 2:
                fields[fid] = False
            else:
                fields[fid] = self.value(ttype)


class ParquetMeta(NamedTuple):
    version: int
    num_rows: int
    n_row_groups: int
    rg_rows: list[int]
    n_leaves: int  # schema leaf columns
    created_by: str | None


def parse_parquet_footer(payload: bytes) -> ParquetMeta:
    if len(payload) < 12 or payload[:4] != b"PAR1" or payload[-4:] != b"PAR1":
        raise ValueError("parquet: missing PAR1 magic")
    footer_len = int.from_bytes(payload[-8:-4], "little")
    start = len(payload) - 8 - footer_len
    if footer_len <= 0 or start < 4:
        raise ValueError("parquet: footer length out of bounds")
    rd = _Reader(payload[start : len(payload) - 8])
    meta = rd.struct()
    if rd.pos != footer_len:
        raise ValueError("parquet: trailing bytes after FileMetaData")
    version = meta.get(1)
    schema = meta.get(2)
    num_rows = meta.get(3)
    row_groups = meta.get(4, [])
    created_by = meta.get(6)
    if not isinstance(version, int) or not isinstance(num_rows, int):
        raise ValueError("parquet: FileMetaData missing version/num_rows")
    if not isinstance(schema, list) or not schema:
        raise ValueError("parquet: FileMetaData missing schema")
    for el in schema:
        if not isinstance(el, dict):
            raise ValueError("parquet: schema element is not a struct")
    # SchemaElement field 5 = num_children; absent/0 ⇒ leaf column.
    # schema[0] is the root message element and never counts.
    leaves = sum(1 for el in schema[1:] if not el.get(5))
    rg_rows: list[int] = []
    for rg in row_groups:
        if not isinstance(rg, dict) or not isinstance(rg.get(3), int):
            raise ValueError("parquet: RowGroup missing num_rows")
        rg_rows.append(rg[3])
    if sum(rg_rows) != num_rows:
        raise ValueError(
            f"parquet: row-group rows {sum(rg_rows)} != file num_rows {num_rows}"
        )
    return ParquetMeta(
        version=version,
        num_rows=num_rows,
        n_row_groups=len(rg_rows),
        rg_rows=rg_rows,
        n_leaves=leaves,
        created_by=created_by.decode("utf-8") if isinstance(created_by, bytes) else None,
    )


# --------------------------------------------------------------------------
# Spark query

PQ_SCHEMA = T.StructType(
    [
        T.StructField("tbl", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("rg_consistent", T.BooleanType(), True),
    ]
)


def parquet_footer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the warehouse's OWN parquet files: binaryFile scan of the
    ten tables → hand-rolled footer walk → per-table row counts. The
    oracle COUNT(*)s every table by scanning it, so the thrift parse
    must agree with a full-data pass while reading only footers."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
        .select("path", "content")
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            tb, nr, rc = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(str(path))
                if not name.endswith(".parquet"):
                    continue
                m = parse_parquet_footer(bytes(content))
                tb.append(name[: -len(".parquet")])
                nr.append(m.num_rows)
                rc.append(sum(m.rg_rows) == m.num_rows)
            yield pd.DataFrame(
                {
                    "tbl": pd.Series(tb, dtype="object"),
                    "n_rows": pd.Series(nr, dtype="int64"),
                    "rg_consistent": pd.Series(rc, dtype="bool"),
                }
            )

    out = files.mapInPandas(run, PQ_SCHEMA)
    return out.where(F.col("tbl").isin(list(_TABLES)))


PQ_SQL = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,"
    f" TRUE AS rg_consistent FROM {t}"
    for t in _TABLES
) + "\nORDER BY tbl"


QUERIES = {"parquet_footer_audit": parquet_footer_audit}

ORACLES = {"parquet_footer_audit": PQ_SQL}
