"""TAR (POSIX ustar) walk + WebDataset manifest — header arithmetic, no extraction.

Beyond-reference capability (the reference ships no archive handling):
sharded multimodal training data ships as TAR archives of
`{key}.{ext}` members — the WebDataset convention used by the large
open image/text corpora — and the pipeline's shard-audit stage is
exactly this walk: iterate 512-byte headers, verify checksums, group
members into samples by key, and report completeness WITHOUT
extracting anything. Same triage economics as the jpeg/gif/mp4/mp3/
warc walkers: headers are 512 bytes per member; payload bytes are
skipped by size arithmetic.

Hand-rolled from the public POSIX.1-1988 ustar layout (the writer in
the fixtures is stdlib `tarfile`, which gives the units an
INDEPENDENT implementation to agree with):

  - 512-byte header: name[100] mode[8] uid[8] gid[8] size[12,octal]
    mtime[12] chksum[8] typeflag[1] linkname[100] magic[6] ...;
    header checksum = unsigned byte sum with the chksum field read
    as spaces, stored as octal.
  - member data in 512-byte blocks, zero-padded; archive ends with
    two zero blocks.
  - strict WebDataset profile: only regular files (typeflag '0' or
    NUL) are accepted — links/dirs/PAX extensions in a training
    shard mean an upstream bug and are refused loudly.

Oracle strategy (the mp4/mp3/warc construction): per document the
fixture is a 1-sample shard — `{doc_id:08d}.txt` (the utf-8 text) +
`{doc_id:08d}.cls` (one label byte) + a `.json` sidecar for even
doc_ids — so member/sample counts, byte totals, and completeness are
closed forms DuckDB computes from `documents` directly.
"""
from __future__ import annotations

import io
import tarfile
from typing import Iterator, NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from orionld_to_hive_spark.sources.warehouse import load_table

_BLOCK = 512


class TarMember(NamedTuple):
    name: str
    size: int
    offset: int  # payload start within the archive


class WdsMeta(NamedTuple):
    n_members: int
    n_samples: int
    total_bytes: int  # Σ member sizes
    txt_bytes: int  # Σ sizes of .txt members
    complete: bool  # every sample has both .txt and .cls


def _octal(field: bytes, what: str) -> int:
    s = field.split(b"\0", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as e:
        raise ValueError(f"non-octal {what} field {field!r}") from e


def parse_tar(payload: bytes) -> list[TarMember]:
    """Walk a ustar archive into its regular-file members by header
    arithmetic. Verifies every header checksum; payload bytes are
    never read (offset+size returned instead)."""
    members: list[TarMember] = []
    pos = 0
    n = len(payload)
    saw_end = False
    while pos + _BLOCK <= n:
        hdr = payload[pos : pos + _BLOCK]
        if hdr == b"\0" * _BLOCK:
            # end-of-archive: two zero blocks (tolerate trailing
            # zero padding after them, which tarfile writes)
            rest = payload[pos + _BLOCK :]
            if len(rest) < _BLOCK or rest[:_BLOCK] != b"\0" * _BLOCK:
                raise ValueError("single zero block is not a valid archive end")
            if rest[_BLOCK:].strip(b"\0"):
                raise ValueError("trailing bytes after end-of-archive blocks")
            saw_end = True
            break
        stored = _octal(hdr[148:156], "chksum")
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if calc != stored:
            raise ValueError(
                f"tar header checksum mismatch at offset {pos} "
                f"({calc} != {stored})"
            )
        magic = hdr[257:263]
        if magic not in (b"ustar\0", b"ustar "):
            raise ValueError(f"unsupported tar magic {magic!r}")
        typeflag = hdr[156:157]
        if typeflag not in (b"0", b"\0"):
            raise ValueError(
                f"non-regular member (typeflag {typeflag!r}) in a "
                "WebDataset shard"
            )
        name = hdr[:100].split(b"\0", 1)[0].decode("utf-8")
        if not name:
            raise ValueError("empty member name")
        size = _octal(hdr[124:136], "size")
        data_start = pos + _BLOCK
        padded = (size + _BLOCK - 1) // _BLOCK * _BLOCK
        if data_start + padded > n:
            raise ValueError(f"member {name!r} overruns archive")
        members.append(TarMember(name, size, data_start))
        pos = data_start + padded
    if not saw_end:
        raise ValueError("archive ends without the two zero blocks")
    if not members:
        raise ValueError("no members in archive")
    return members


def member_bytes(payload: bytes, m: TarMember) -> bytes:
    return payload[m.offset : m.offset + m.size]


def parse_webdataset_meta(payload: bytes) -> WdsMeta:
    """WebDataset shard audit: members grouped into samples by the
    basename before the FIRST dot (the convention: `key.ext`, where
    ext itself may be dotted, e.g. `seg.json`)."""
    members = parse_tar(payload)
    samples: dict[str, set[str]] = {}
    txt = 0
    for m in members:
        base, dot, ext = m.name.partition(".")
        if not dot:
            raise ValueError(f"member {m.name!r} has no extension")
        samples.setdefault(base, set()).add(ext)
        if ext == "txt":
            txt += m.size
    return WdsMeta(
        n_members=len(members),
        n_samples=len(samples),
        total_bytes=sum(m.size for m in members),
        txt_bytes=txt,
        complete=all({"txt", "cls"} <= exts for exts in samples.values()),
    )


# --------------------------------------------------------------------------
# encoder (synth fixture + tests) — stdlib tarfile, pinned metadata so
# archives are byte-deterministic


def _add(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tf.addfile(info, io.BytesIO(data))


def encode_webdataset(doc_id: int, text: bytes) -> bytes:
    """1-sample shard: {id}.txt (the text) + {id}.cls (one label
    byte) + {id}.json sidecar for even doc_ids."""
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        key = f"{doc_id:08d}"
        _add(tf, f"{key}.txt", text)
        _add(tf, f"{key}.cls", str(doc_id % 10).encode())
        if doc_id % 2 == 0:
            _add(tf, f"{key}.json", f'{{"id": {doc_id}}}'.encode())
    return bio.getvalue()


# --------------------------------------------------------------------------
# Spark query

WDS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_members", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("total_bytes", T.LongType(), True),
        T.StructField("txt_bytes", T.LongType(), True),
        T.StructField("complete", T.BooleanType(), True),
    ]
)


def webdataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → WebDataset shards (see encode_webdataset) → shard
    audit. Every field is a closed form of the document row; the
    walker's checksum verification and 512-block arithmetic are on
    the oracle path for every member."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nm, ns, tb, xb, cp = [], [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                m = parse_webdataset_meta(encode_webdataset(int(doc_id), data))
                ids.append(int(doc_id))
                nm.append(m.n_members)
                ns.append(m.n_samples)
                tb.append(m.total_bytes)
                xb.append(m.txt_bytes)
                cp.append(m.complete)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "n_members": pd.Series(nm, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "total_bytes": pd.Series(tb, dtype="int64"),
                    "txt_bytes": pd.Series(xb, dtype="int64"),
                    "complete": pd.Series(cp, dtype="bool"),
                }
            )

    return docs.mapInPandas(run, WDS_SCHEMA).orderBy("asset_id")


# per doc: .txt = octet_length(text); .cls = 1 byte; even ids add a
# json sidecar '{"id": N}' of length 8 + digits(N)
WDS_SQL = """
SELECT doc_id AS asset_id,
       CAST(2 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INTEGER)
         AS n_members,
       1 AS n_samples,
       CAST(octet_length(encode(text)) + 1
            + CASE WHEN doc_id % 2 = 0
                   THEN 8 + length(CAST(doc_id AS VARCHAR))
                   ELSE 0 END AS BIGINT) AS total_bytes,
       CAST(octet_length(encode(text)) AS BIGINT) AS txt_bytes,
       TRUE AS complete
FROM documents
ORDER BY asset_id
"""


QUERIES = {
    "webdataset_manifest": webdataset_manifest,
}

ORACLES = {
    "webdataset_manifest": WDS_SQL,
}
