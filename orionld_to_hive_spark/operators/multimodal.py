"""Multimodal (binary) column operators.

Beyond-reference capability: treat image/audio/video payloads as opaque
`binary` columns with typed metadata, processed by Arrow-batched Pandas
UDFs over `mapInPandas`. PCM RIFF/WAVE audio DECODES FOR REAL (stdlib
RIFF parse, see decode_wav + multimodal_wav_rms), and so does the
COMPLETE baseline PNG matrix (stdlib zlib inflate + full
scanline-filter reconstruction, all color types, depths 1-16, Adam7 —
see decode_png + the multimodal_png_* queries); other
image/video formats need codec libraries the container doesn't ship,
so those decode steps use clearly-marked deterministic fakes — while
everything Spark-side is real and tested: schema, binary encoding,
partition-friendly batch iteration, UDF signatures, metadata
extraction.

The testdata has no binary table, so payloads are synthesized
deterministically from `documents.text` (utf-8 bytes) — which also
makes the metadata op oracle-checkable in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orionld_to_hive_spark.sources.warehouse import (
    load_docs_spread,
    load_table,
)

# Schema for a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("byte_len", T.IntegerType(), True),
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the asset table: payload = utf-8 bytes of the text."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            F.octet_length("text").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a PCM RIFF/WAVE payload — pure stdlib parsing, no
    codec libraries (r6; removes the repo's only stub body for the one
    format a container without codecs can still decode honestly).

    Walks the RIFF chunk list (not fixed offsets — handles LIST/fact
    chunks and odd-size padding), reads `fmt ` (PCM format 1 only,
    8/16-bit), slices `data`, and returns (samples as float64 in
    [-1, 1), sample_rate). Multi-channel audio is averaged to mono in
    float64. 16-bit samples are int16/32768 and 8-bit are (u8-128)/128 —
    exact power-of-two divisions, so downstream integer-scaled window
    math stays bit-portable.
    """
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, rate, _, _, bits = fmt
    if not (
        (audio_format == 1 and bits in (8, 16))
        or (audio_format in (6, 7) and bits == 8)
    ):
        raise NotImplementedError(
            f"only integer PCM 8/16-bit and G.711 A-law/mu-law supported "
            f"(format={audio_format}, bits={bits}); compressed codecs are "
            f"absent in this container"
        )
    if audio_format == 7:  # G.711 mu-law (ITU-T, the classic expansion)
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = _ulaw_expand(raw).astype(np.float64) / 32768.0
    elif audio_format == 6:  # G.711 A-law
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = _alaw_expand(raw).astype(np.float64) / 32768.0
    elif bits == 16:
        raw = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    if n_channels > 1:
        usable = len(samples) // n_channels * n_channels
        samples = samples[:usable].reshape(-1, n_channels).mean(axis=1)
    return samples, rate


def _ulaw_expand(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law expansion (vectorized): bytes are stored
    complemented; magnitude = (mantissa << (exp+3)) + (132 << exp)
    - 132, sign from bit 7 after the complement. Extremes pin the
    table: 0x00 -> -32124, 0x7F -> -0, 0xFF -> 0 (the format's two
    zeros), max magnitude 32124."""
    u = (~codes.astype(np.int64)) & 0xFF
    e = (u >> 4) & 0x07
    m = u & 0x0F
    mag = (m << (e + 3)) + (132 << e) - 132
    return np.where(u & 0x80, -mag, mag)


def _alaw_expand(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law expansion (vectorized): bytes are stored
    XOR 0x55; segment 0: (m<<4)+8, segment 1: (m<<4)+0x108, segment
    s>=2: ((m<<4)+0x108) << (s-1); bit 7 SET means positive (the
    opposite of mu-law). Extremes: 0x2A -> -32256, 0xD5 -> +8."""
    a = codes.astype(np.int64) ^ 0x55
    m = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    mag = np.where(
        seg == 0, m + 8,
        np.where(seg == 1, m + 0x108, (m + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, mag, -mag)


def decode_asset(payload: bytes) -> object:
    """Decode a media payload. PCM RIFF/WAVE (decode_wav), baseline
    PNG (decode_png — stdlib zlib, returns PngImage), and baseline
    JPEG (operators/jpeg.py::decode_jpeg — pure numpy, returns
    JpegImage) decode for real. Video formats require codec libraries
    (pyav...) the container does not ship, so those remain explicitly
    unimplemented rather than faked."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from orionld_to_hive_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "compressed video decode requires codec libraries not present "
        "in this environment; extract_features uses a deterministic fake "
        "instead"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams (batch of rows) -> (batch of feature rows), the
    shape a real resize/frame-sample/embed step uses: partition-local,
    no shuffle, bounded memory per Arrow batch. The per-payload
    "feature" is a deterministic fake (byte stats) standing in for the
    stubbed decode (see decode_asset).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # Vectorized per batch: concatenate payloads into one uint8
            # buffer, take segment sums via cumsum differences (safe for
            # empty payloads, unlike reduceat), divide by lengths.
            lens = np.fromiter(
                (len(b) for b in payloads), dtype=np.int64, count=len(payloads)
            )
            ends = lens.cumsum()
            starts = ends - lens
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            csum = np.concatenate(
                ([0], buf.cumsum(dtype=np.int64))
            )
            sums = csum[ends] - csum[starts]
            mean_byte = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": lens.astype("int32"),
                    "mean_byte": mean_byte,
                    # fake "frame sampling": one frame per 256-byte window
                    "n_frames": ((lens + 255) // 256).astype("int32"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


# --------------------------------------------------------------------------
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("orig_len", T.IntegerType(), True),
        T.StructField("resized_len", T.IntegerType(), True),
    ]
)


def resize_assets(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Arrow-batched 'resize': cap each payload at `target_bytes`.

    Stands in for image resize / audio downsample (codecs absent — see
    decode_asset); the plumbing is the real thing: binary-in/binary-out
    mapInPandas, partition-local, bounded Arrow batches, output schema
    carrying both payload and provenance lengths.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            resized = payloads.map(lambda b: bytes(b[:target_bytes]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": resized,
                    "orig_len": payloads.map(len).astype("int32"),
                    "resized_len": resized.map(len).astype("int32"),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


# --------------------------------------------------------------------------
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads (pure JVM expressions)."""
    assets = assets_from_documents(spark, sf_dir)
    return assets.select(
        "asset_id",
        "mime",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.sha256").alias("payload_sha256"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id AS asset_id,
       'application/octet-stream' AS mime,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       sha256(text) AS payload_sha256
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (decode stubbed — see decode_asset).

    Exact DuckDB oracle (same pattern that graduated the phash op in
    r3): the fake decode is deterministic byte arithmetic, payloads are
    the ASCII document bytes, so mean_byte = SUM(code)/len reproduces in
    SQL — integer sum, one IEEE division, bit-identical both engines."""
    return extract_features(assets_from_documents(spark, sf_dir))


# Oracle is BYTE-exact (r5 ADVICE fix): bytes are read from the hex dump
# of the UTF-8 encoding, not via character indexing, so multi-byte text
# matches the Python path's raw-byte sums bit-for-bit.
MULTIMODAL_FEATURES_SQL = """
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
codes AS (
  SELECT doc_id,
         16 * (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
            + (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1) AS code
  FROM h, UNNEST(range(n)) AS t(i)
),
agg AS (
  SELECT doc_id, CAST(SUM(code) AS DOUBLE) / COUNT(*) AS mean_byte
  FROM codes GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       CAST(octet_length(encode(d.text)) AS INTEGER) AS byte_len,
       COALESCE(a.mean_byte, 0.0) AS mean_byte,
       CAST(CEIL(octet_length(encode(d.text)) / 256.0) AS INTEGER) AS n_frames
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline result with a JVM-side integrity check: resized
    payload must hash-prefix-match the original's truncation (asserted
    in tests); here we return the length accounting (oracle-checkable)."""
    resized = resize_assets(assets_from_documents(spark, sf_dir))
    return resized.select("asset_id", "orig_len", "resized_len")


MULTIMODAL_RESIZE_SQL = """
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS orig_len,
       CAST(LEAST(octet_length(encode(text)), 64) AS INTEGER) AS resized_len
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Frame sampling: the ONE-TO-MANY UDF shape a video pipeline needs
# (asset row → N frame rows). mapInPandas yields a fanned-out batch —
# partition-local, no shuffle, no UDTF registration needed, and the
# output row count is data-dependent (unlike the 1:1 feature/resize
# ops). The "frame" is a 256-byte window of the payload standing in
# for the stubbed codec (see decode_asset); hashes make every frame's
# content oracle-checkable. Payloads are ASCII here, so the DuckDB
# twin can slice the text directly.
FRAME_BYTES = 256

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_len", T.IntegerType(), True),
        T.StructField("frame_sha256", T.StringType(), True),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, hashes = [], [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                for k in range((len(b) + FRAME_BYTES - 1) // FRAME_BYTES):
                    frame = b[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    ids.append(asset_id)
                    idxs.append(k)
                    lens.append(len(frame))
                    hashes.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_sha256": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(assets_from_documents(spark, sf_dir))
    return frames


MULTIMODAL_FRAME_SQL = f"""
SELECT doc_id AS asset_id,
       CAST(i AS INTEGER) AS frame_index,
       CAST(octet_length(encode(substr(text, CAST(i AS INTEGER) * {FRAME_BYTES} + 1,
                                       {FRAME_BYTES}))) AS INTEGER) AS frame_len,
       sha256(substr(text, CAST(i AS INTEGER) * {FRAME_BYTES} + 1, {FRAME_BYTES}))
         AS frame_sha256
FROM documents,
     UNNEST(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0)
                          AS BIGINT))) AS t(i)
ORDER BY asset_id, frame_index
"""


# --------------------------------------------------------------------------
# Audio-style windowed energy (VAD shape): treat the payload as unsigned
# 8-bit PCM centered at 128, frame it into 256-byte windows with 128
# hop, and report per-asset RMS-energy stats plus the count of "active"
# windows above a threshold — the voice-activity-detection preprocessing
# a speech-data pipeline runs before transcription/filtering. Decode is
# the deterministic fake (see decode_asset); the Spark-side plumbing —
# mapInPandas, Arrow batches, fully vectorized window math (global
# squared-cumsum + reduceat over per-asset window runs, NO per-row
# Python) — is the real production shape.
#
# Cross-engine exactness (oracle-backed since r4): all window sums are
# INTEGER arithmetic ((byte-128)² sums stay < 2^53, so the float64
# prefix-sum is exact), rms = sqrt(int/int) is one correctly-rounded
# IEEE op in both engines, and every decimal rounding uses
# floor(x·10^k + 0.5)/10^k — plain multiply/add/floor, bit-identical
# everywhere — instead of library round() (numpy rounds half-even via
# scaling, DuckDB half-up: different code paths near boundaries).
# Per-asset mean_rms sums the 1e9-scaled INTEGER rms values, so the
# accumulation order can't drift between engines.
ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("mean_rms", T.DoubleType(), True),
        T.StructField("max_rms", T.DoubleType(), True),
        T.StructField("n_active", T.IntegerType(), True),
    ]
)

AUDIO_WIN = 256
AUDIO_HOP = 128
AUDIO_ACTIVE_RMS = 64.0


def audio_energy(df: DataFrame) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n = len(payloads)
            lens = np.fromiter(
                (len(b) for b in payloads), dtype=np.int64, count=n
            )
            offs = np.concatenate(([0], lens.cumsum()))
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            dev = buf.astype(np.float64) - 128.0
            csq = np.concatenate(([0.0], np.cumsum(dev * dev)))
            # windows per payload: hop over full windows; short non-empty
            # payloads get one truncated window
            nw = np.where(
                lens >= AUDIO_WIN,
                (lens - AUDIO_WIN) // AUDIO_HOP + 1,
                (lens > 0).astype(np.int64),
            )
            total_w = int(nw.sum())
            if total_w == 0:
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "n_windows": np.zeros(n, dtype="int32"),
                        "mean_rms": np.zeros(n),
                        "max_rms": np.zeros(n),
                        "n_active": np.zeros(n, dtype="int32"),
                    }
                )
                continue
            owner = np.repeat(np.arange(n), nw)
            wseq = np.arange(total_w) - np.repeat(
                np.concatenate(([0], nw.cumsum()))[:-1], nw
            )
            wstart = offs[owner] + wseq * AUDIO_HOP
            wlen = np.minimum(AUDIO_WIN, lens[owner])
            sumsq = csq[wstart + wlen] - csq[wstart]  # exact: integer < 2^53
            rms = np.sqrt(sumsq / np.maximum(wlen, 1))
            # 1e9-scaled integer rms — floor(x·1e9 + 0.5) is the portable
            # half-up rounding (see block comment); all downstream stats
            # run on these exact integers.
            r9 = np.floor(rms * 1e9 + 0.5).astype(np.int64)
            # per-asset aggregation over contiguous window runs
            bounds = np.concatenate(([0], nw.cumsum()))[:-1]
            nonempty = nw > 0
            idx = bounds[nonempty]
            sum_r9 = np.add.reduceat(r9, idx)
            max_r9 = np.maximum.reduceat(r9, idx)
            act = np.add.reduceat(
                (r9 > AUDIO_ACTIVE_RMS * 1e9).astype(np.int64), idx
            )
            mean_out = np.zeros(n)
            max_out = np.zeros(n)
            act_out = np.zeros(n, dtype=np.int64)
            mean_out[nonempty] = (sum_r9[:] / 1e9) / nw[nonempty]
            max_out[nonempty] = max_r9 / 1e9
            act_out[nonempty] = act
            round6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_windows": nw.astype("int32"),
                    "mean_rms": round6(mean_out),
                    "max_rms": round6(max_out),
                    "n_active": act_out.astype("int32"),
                }
            )

    return df.mapInPandas(batches, ENERGY_SCHEMA)


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_energy(assets_from_documents(spark, sf_dir))


# DuckDB twin of the window math above. Each byte at offset i belongs
# to at most two hop-128 windows (k = i//128 and k = i//128 − 1), so
# the byte→window assignment is an equi-join fan-out of ≤ 2 — no range
# join. Full windows always fit inside the payload (nw's definition
# guarantees (nw−1)·hop + win ≤ len for len ≥ win), so wlen is simply
# LEAST(win, len). All roundings are the portable FLOOR(x·10^k + 0.5)
# form matching the numpy path bit-for-bit.
# Byte-exact codes via the hex dump, as in MULTIMODAL_FEATURES_SQL.
# Template shared with the real-decode WAV twin below: `div` rescales
# the byte-deviation rms into the target sample domain (1 for raw
# bytes; 128 for 16-bit samples synthesized as (byte-128)*256/32768 —
# exact power-of-two scaling, so sqrt(x/2^14) == sqrt(x)/2^7
# bit-for-bit and the shared integer window math stays the oracle).
def _audio_sql(div: int, active_r9: int) -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         CASE WHEN octet_length(encode(text)) >= {AUDIO_WIN}
              THEN (octet_length(encode(text)) - {AUDIO_WIN}) // {AUDIO_HOP} + 1
              WHEN octet_length(encode(text)) > 0 THEN 1
              ELSE 0 END AS nw
  FROM documents
),
codes AS (
  SELECT doc_id, n, nw, CAST(i AS BIGINT) AS i,
         16 * (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
            + (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1) AS code
  FROM docs, UNNEST(range(n)) AS t(i)
),
owned AS (
  SELECT c.doc_id, c.nw, t.k, c.code,
         LEAST({AUDIO_WIN}, c.n) AS wlen
  FROM codes c, UNNEST([c.i // {AUDIO_HOP}, c.i // {AUDIO_HOP} - 1]) AS t(k)
  WHERE t.k >= 0 AND t.k < c.nw
    AND c.i < t.k * {AUDIO_HOP} + LEAST({AUDIO_WIN}, c.n)
),
win AS (
  SELECT doc_id, nw, k,
         CAST(FLOOR(sqrt(CAST(SUM((code - 128) * (code - 128)) AS DOUBLE)
                         / ANY_VALUE(wlen)) / {div} * 1e9 + 0.5)
              AS BIGINT) AS r9
  FROM owned GROUP BY doc_id, nw, k
),
agg AS (
  SELECT doc_id,
         FLOOR((CAST(SUM(r9) AS DOUBLE) / 1e9) / ANY_VALUE(nw) * 1e6 + 0.5)
           / 1e6 AS mean_rms,
         FLOOR(CAST(MAX(r9) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS max_rms,
         CAST(SUM(CASE WHEN r9 > {active_r9} THEN 1 ELSE 0 END)
              AS INTEGER) AS n_active
  FROM win GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       CAST(d.nw AS INTEGER) AS n_windows,
       COALESCE(a.mean_rms, 0.0) AS mean_rms,
       COALESCE(a.max_rms, 0.0) AS max_rms,
       COALESCE(a.n_active, 0) AS n_active
FROM docs d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY asset_id
"""


MULTIMODAL_AUDIO_SQL = _audio_sql(1, int(AUDIO_ACTIVE_RMS * 1e9))


# --------------------------------------------------------------------------
# Real-decode audio path (r6): synthesize a 16-bit PCM RIFF/WAVE payload
# per document (sample_j = (byte_j - 128)·256 — one sample per utf-8
# byte, 16 kHz mono, canonical 44-byte header via stdlib `wave`), then
# run the SAME windowed-RMS pipeline through decode_wav — an actual
# RIFF parse, not a fake. Because the synthesized samples are an exact
# power-of-two rescaling of the byte deviations, the DuckDB oracle is
# the shared _audio_sql template with div=128: sample-domain rms ==
# byte-domain rms / 128 bit-for-bit (sqrt(x/2^14) == sqrt(x)/2^7 —
# IEEE sqrt is correctly rounded and /2^k is exact).
#
# Scale shape: synth and decode+window are both partition-local
# mapInPandas (Arrow-batched, no shuffle); the decode loop is per
# payload — inherent to container formats, the window math inside each
# payload is vectorized numpy. At 100 TB the payloads arrive from
# storage instead of the synth step; everything downstream is unchanged.
WAV_RATE = 16000
WAV_ACTIVE_RMS = AUDIO_ACTIVE_RMS / 128.0  # same threshold, sample domain


def _wav_synth_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import io
    import wave

    for pdf in it:
        payloads = []
        for text in pdf["text"]:
            raw = np.frombuffer(
                (text or "").encode("utf-8"), dtype=np.uint8
            )
            pcm = ((raw.astype(np.int16) - 128) * 256).astype("<i2")
            bio = io.BytesIO()
            with wave.open(bio, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(WAV_RATE)
                w.writeframes(pcm.tobytes())
            payloads.append(bio.getvalue())
        yield pd.DataFrame(
            {
                "asset_id": pdf["doc_id"],
                "payload": payloads,
                "mime": "audio/wav",
            }
        )

def wav_assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    return docs.mapInPandas(_wav_synth_batches, _PNG_ASSET_SCHEMA)


def _wav_energy_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {
            "asset_id": pdf["asset_id"].to_numpy(),
            "n_windows": np.zeros(len(pdf), dtype="int32"),
            "mean_rms": np.zeros(len(pdf)),
            "max_rms": np.zeros(len(pdf)),
            "n_active": np.zeros(len(pdf), dtype="int32"),
        }
        for j, payload in enumerate(pdf["payload"]):
            samples, _rate = decode_wav(bytes(payload))
            n = len(samples)
            if n == 0:
                continue
            nw = (
                (n - AUDIO_WIN) // AUDIO_HOP + 1 if n >= AUDIO_WIN else 1
            )
            dev256 = samples * 32768.0  # exact int values as float64
            csq = np.concatenate(([0.0], np.cumsum(dev256 * dev256)))
            starts = np.arange(nw) * AUDIO_HOP
            wlen = min(AUDIO_WIN, n)
            sumsq = csq[starts + wlen] - csq[starts]
            rms = np.sqrt(sumsq / wlen) / 32768.0
            r9 = np.floor(rms * 1e9 + 0.5).astype(np.int64)
            out["n_windows"][j] = nw
            out["mean_rms"][j] = (
                np.floor((r9.sum() / 1e9) / nw * 1e6 + 0.5) / 1e6
            )
            out["max_rms"][j] = np.floor(r9.max() / 1e9 * 1e6 + 0.5) / 1e6
            out["n_active"][j] = int(
                (r9 > int(WAV_ACTIVE_RMS * 1e9)).sum()
            )
        yield pd.DataFrame(out)

def wav_audio_energy(df: DataFrame) -> DataFrame:
    """Windowed RMS over REAL-decoded PCM samples (decode_wav), same
    window/hop/stat shape as audio_energy. Sample² sums run on
    (sample·32768)² integers — exact in float64 — so the 1e9-scaled
    rms codes match the oracle's integer math bit-for-bit."""
    return df.mapInPandas(_wav_energy_batches, ENERGY_SCHEMA)


def multimodal_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused single-crossing path (r14 second pass, guide §4.1) — the
    # WAV twin of jpeg._fused_pixel_stats
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    return docs.mapInPandas(
        lambda it: _wav_energy_batches(_wav_synth_batches(it)),
        ENERGY_SCHEMA,
    )


MULTIMODAL_WAV_SQL = _audio_sql(128, int(WAV_ACTIVE_RMS * 1e9))


# --------------------------------------------------------------------------
# G.711 mu-law path (r10): one mu-law code per utf-8 byte, hand-built
# RIFF header (stdlib wave cannot write format 7), decoded by the REAL
# expander and run through the same windowed-RMS stats. The oracle
# replays the G.711 integer expansion from the hex dump — magnitudes
# are exact integers, window sums stay under 2^53, and the final
# sqrt/rounding is the shared portable form.
MULAW_ACTIVE_RMS9 = 300_000_000  # rms > 0.3 (sample domain, 1e9-scaled)


def _mulaw_synth_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import struct

    for pdf in it:
        payloads = []
        for text in pdf["text"]:
            data = (text or "").encode("utf-8")
            fmt = struct.pack(
                "<HHIIHH", 7, 1, WAV_RATE, WAV_RATE, 1, 8
            )
            body = (
                b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) & 1 else b"")
            )
            payloads.append(
                b"RIFF" + struct.pack("<I", len(body)) + body
            )
        yield pd.DataFrame(
            {
                "asset_id": pdf["doc_id"],
                "payload": payloads,
                "mime": "audio/basic",
            }
        )

def wav_mulaw_assets_from_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    return docs.mapInPandas(_mulaw_synth_batches, _PNG_ASSET_SCHEMA)


def mulaw_audio_energy(df: DataFrame) -> DataFrame:
    """Same windowed-RMS shape as wav_audio_energy, over REAL-decoded
    G.711 samples; magnitudes are exact integers. The prefix-sum of
    squared magnitudes is kept in int64 (max |mag| = 32124 ⇒ ~1.03e9
    per sample ⇒ exact up to ~8.9e9 samples per document), so the
    per-window sum — at most AUDIO_WIN·1.03e9 ≪ 2^53 — converts to
    float64 exactly and the SQL oracle's integer window sums are
    matched bit-for-bit with no whole-document float53 bound."""

    return df.mapInPandas(_mulaw_energy_batches, ENERGY_SCHEMA)


def _mulaw_energy_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {
            "asset_id": pdf["asset_id"].to_numpy(),
            "n_windows": np.zeros(len(pdf), dtype="int32"),
            "mean_rms": np.zeros(len(pdf)),
            "max_rms": np.zeros(len(pdf)),
            "n_active": np.zeros(len(pdf), dtype="int32"),
        }
        for j, payload in enumerate(pdf["payload"]):
            samples, _rate = decode_wav(bytes(payload))
            n = len(samples)
            if n == 0:
                continue
            nw = (
                (n - AUDIO_WIN) // AUDIO_HOP + 1 if n >= AUDIO_WIN else 1
            )
            mags = np.rint(samples * 32768.0).astype(np.int64)
            csq = np.concatenate(
                ([0], np.cumsum(mags * mags, dtype=np.int64))
            )
            starts = np.arange(nw) * AUDIO_HOP
            wlen = min(AUDIO_WIN, n)
            sumsq = (csq[starts + wlen] - csq[starts]).astype(np.float64)
            rms = np.sqrt(sumsq / wlen) / 32768.0
            r9 = np.floor(rms * 1e9 + 0.5).astype(np.int64)
            out["n_windows"][j] = nw
            out["mean_rms"][j] = (
                np.floor((r9.sum() / 1e9) / nw * 1e6 + 0.5) / 1e6
            )
            out["max_rms"][j] = np.floor(r9.max() / 1e9 * 1e6 + 0.5) / 1e6
            out["n_active"][j] = int((r9 > MULAW_ACTIVE_RMS9).sum())
        yield pd.DataFrame(out)


def multimodal_wav_mulaw_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused single-crossing path (r14 second pass, guide §4.1)
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    return docs.mapInPandas(
        lambda it: _mulaw_energy_batches(_mulaw_synth_batches(it)),
        ENERGY_SCHEMA,
    )


# the G.711 expansion in SQL: u = ~code = 255 - code; exp/mantissa
# bit fields; magnitude = (m << (e+3)) + (132 << e) - 132; bit 7 of u
# sets the sign. rms scales by 32768 in the shared portable rounding.
MULTIMODAL_MULAW_SQL = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         CASE WHEN octet_length(encode(text)) >= {AUDIO_WIN}
              THEN (octet_length(encode(text)) - {AUDIO_WIN}) // {AUDIO_HOP} + 1
              WHEN octet_length(encode(text)) > 0 THEN 1
              ELSE 0 END AS nw
  FROM documents
),
codes AS (
  SELECT doc_id, n, nw, CAST(i AS BIGINT) AS i,
         16 * (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
            + (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1) AS code
  FROM docs, UNNEST(range(n)) AS t(i)
),
samples AS (
  SELECT doc_id, n, nw, i,
         CASE WHEN ((255 - code) & 128) != 0 THEN -mag ELSE mag END AS s
  FROM (
    SELECT *,
           (((255 - code) & 15) << ((((255 - code) >> 4) & 7) + 3))
             + (132 << (((255 - code) >> 4) & 7)) - 132 AS mag
    FROM codes
  )
),
owned AS (
  SELECT c.doc_id, c.nw, t.k, c.s,
         LEAST({AUDIO_WIN}, c.n) AS wlen
  FROM samples c, UNNEST([c.i // {AUDIO_HOP}, c.i // {AUDIO_HOP} - 1]) AS t(k)
  WHERE t.k >= 0 AND t.k < c.nw
    AND c.i < t.k * {AUDIO_HOP} + LEAST({AUDIO_WIN}, c.n)
),
win AS (
  SELECT doc_id, nw, k,
         CAST(FLOOR(sqrt(CAST(SUM(s * s) AS DOUBLE)
                         / ANY_VALUE(wlen)) / 32768 * 1e9 + 0.5)
              AS BIGINT) AS r9
  FROM owned GROUP BY doc_id, nw, k
),
agg AS (
  SELECT doc_id,
         FLOOR((CAST(SUM(r9) AS DOUBLE) / 1e9) / ANY_VALUE(nw) * 1e6 + 0.5)
           / 1e6 AS mean_rms,
         FLOOR(CAST(MAX(r9) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS max_rms,
         CAST(SUM(CASE WHEN r9 > {MULAW_ACTIVE_RMS9} THEN 1 ELSE 0 END)
              AS INTEGER) AS n_active
  FROM win GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       CAST(d.nw AS INTEGER) AS n_windows,
       COALESCE(a.mean_rms, 0.0) AS mean_rms,
       COALESCE(a.max_rms, 0.0) AS max_rms,
       COALESCE(a.n_active, 0) AS n_active
FROM docs d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY asset_id
"""


# --------------------------------------------------------------------------
# Real-decode image path (r7, completed r8/r9): PNG is the one image
# format decodable with nothing but stdlib zlib — inflate +
# per-scanline filter reconstruction — so, like the WAV work in r6,
# the deterministic fake is replaced by an honest codec for exactly
# the format the container can support. As of r9 the decoder covers
# the COMPLETE baseline matrix (color types 0/2/3/4/6, every spec
# §11.2.2 depth including sub-byte 1/2/4, Adam7, both tRNS
# mechanisms); only JPEG stays out of reach without codec libraries.
#
# encode_png_gray synthesizes a REAL spec-compliant PNG per document
# (8-bit greyscale, non-interlaced, pixels = utf-8 bytes of the text
# padded to a 32-wide raster with zeros) and deliberately cycles the
# scanline filter type 0→4 by row, so the decoder must correctly
# reverse ALL FIVE filters (None/Sub/Up/Average/Paeth) or the pixel
# stats diverge from the oracle — the filter reconstruction itself is
# what the DuckDB diff certifies. decode_png is a full chunk-walk
# parser: signature, CRC-verified chunks, IHDR sanity, multi-IDAT
# concatenation, inflate, unfilter.
#
# Scale shape: synth and decode are partition-local mapInPandas (Arrow
# batches, zero shuffle); per-row unfiltering is bounded by image width.
# At 100 TB the payloads come from storage and the synth stage drops
# out; decode/stats are unchanged.
PNG_W = 32
PNG_DARK = 32  # pixels strictly below this count as "dark"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _encode_png(
    img: np.ndarray,
    width: int,
    color_type: int,
    extra_chunks=(),
    ihdr_width: int | None = None,
    depth: int = 8,
) -> bytes:
    """Shared PNG writer core: filter each scanline (filter type =
    row_index mod 5, exercising every filter), deflate, frame the
    chunks with CRCs. `img` is the flat byte plane — grey pixels or
    palette indices at 1 byte/px, or (sub-byte, r9) the PACKED
    scanline bytes, in which case `width` is the byte stride and
    `ihdr_width`/`depth` carry the pixel width and bit depth (filters
    legitimately run over packed bytes with bpp=1, spec §9);
    `extra_chunks` are (type, body) pairs emitted between IHDR and
    IDAT (e.g. PLTE)."""
    import struct
    import zlib

    h = len(img) // width
    rows = img.reshape(h, width).astype(np.int64)
    out = bytearray()
    prev = np.zeros(width, dtype=np.int64)
    for r_i in range(h):
        row = rows[r_i]
        left = np.concatenate(([0], row[:-1]))
        ul = np.concatenate(([0], prev[:-1]))
        ft = r_i % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            filt = row - _paeth(left, prev, ul)
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", ihdr_width or width, h, depth, color_type, 0, 0, 0
    )
    body = b"".join(chunk(t, d) for t, d in extra_chunks)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + body
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def _pad_raster(raw: np.ndarray, width: int) -> np.ndarray:
    n = len(raw)
    h = max(1, -(-n // width))
    img = np.zeros(h * width, dtype=np.uint8)
    img[:n] = raw
    return img


def encode_png_gray(raw: np.ndarray, width: int = PNG_W) -> bytes:
    """Minimal REAL PNG writer: 8-bit greyscale, non-interlaced, one
    zlib stream, filter type = row_index mod 5 (exercises every
    filter). `raw` is a uint8 pixel vector; it is zero-padded to a
    full `width`-wide raster (empty input becomes one black row)."""
    return _encode_png(_pad_raster(raw, width), width, color_type=0)


# 4-color palette for the paletted-PNG twin: three saturated channels
# plus one near-black entry, so every statistic (sum / max / dark) is a
# distinct CASE over the index — any palette-lookup or unfiltering bug
# shifts a stat. Index = byte % 4, so the oracle derives everything
# from the hex dump.
PNG_PALETTE = ((255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 7, 7))


def encode_png_palette(raw: np.ndarray, width: int = PNG_W) -> bytes:
    """Minimal REAL paletted PNG writer (color type 3): indices =
    byte % 4 into PNG_PALETTE, same shared filter/framing core as the
    grey writer."""
    idx = np.asarray(raw, dtype=np.uint8) % 4
    plte = bytes(c for rgb in PNG_PALETTE for c in rgb)
    return _encode_png(
        _pad_raster(idx, width), width, color_type=3,
        extra_chunks=((b"PLTE", plte),),
    )


# 16-grey ramp palette for the 4-bit family: entry i = (17i, 17i, 17i),
# so every stat is pure arithmetic over the index (channel sum 51·i,
# channel max 17·i, dark channels 3 if i < 2 else 0) and the oracle
# needs no 16-branch CASE. 17·15 = 255 — the ramp spans the full range.
PNG_PALETTE16 = tuple((17 * i, 17 * i, 17 * i) for i in range(16))


def encode_png_palette4(raw: np.ndarray, width: int = PNG_W) -> bytes:
    """REAL 4-bit paletted PNG writer (r9 — the sub-byte family):
    indices = byte % 16 into PNG_PALETTE16, two indices packed per
    scanline byte MSB-first (spec §7.2), filters cycling over the
    PACKED bytes (spec §9 — bpp=1 for sub-byte). `width` must be even
    so rows pack without pad bits."""
    assert width % 2 == 0, "4-bit writer requires an even pixel width"
    idx = _pad_raster(np.asarray(raw, dtype=np.uint8) % 16, width)
    pairs = idx.reshape(-1, 2)
    packed = (pairs[:, 0] << 4) | pairs[:, 1]
    plte = bytes(c for rgb in PNG_PALETTE16 for c in rgb)
    return _encode_png(
        packed, width // 2, color_type=3,
        extra_chunks=((b"PLTE", plte),),
        ihdr_width=width, depth=4,
    )


class PngImage(NamedTuple):
    """Explicit decode contract (r8 review: the bare (px, w, h) tuple
    forced callers to infer channel count and sample width from
    px.size and dtype). `samples` is the flat row-major
    channel-interleaved plane; `channels` counts OUTPUT channels
    (after palette / tRNS expansion); `depth` is the OUTPUT sample
    bit width — 16 for uint16 planes, 8 for uint8 planes, and the
    source depth (1/2/4) for sub-byte greyscale, whose raw sample
    values are NOT rescaled to 255."""

    samples: np.ndarray
    width: int
    height: int
    channels: int
    depth: int


def decode_png(payload: bytes) -> PngImage:
    """Decode boundary (crawl-data hygiene, same contract as
    decode_jpeg): malformed streams raise ValueError, never a
    low-level struct.error/zlib.error/IndexError/KeyError or
    StopIteration. Found by fuzzing mutated chunk streams."""
    import struct as _struct
    import zlib as _zlib

    try:
        return _decode_png_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (StopIteration, IndexError, KeyError,
            _struct.error, _zlib.error) as e:
        raise ValueError(
            f"malformed PNG stream ({type(e).__name__}: {e})"
        ) from e


def _decode_png_impl(payload: bytes) -> PngImage:
    """REAL decode of a baseline PNG — pure stdlib zlib, no codec
    libraries. Returns a PngImage (samples, width, height, channels,
    depth). Covers the COMPLETE baseline matrix (r8, sub-byte depths
    r9): color types 0/2/3/4/6 (grey, RGB, paletted, grey+alpha,
    RGBA); depths 1/2/4 (bit-unpacked MSB-first per spec §7.2, valid
    for grey and paletted only), 8, and 16 (uint16 samples); Adam7
    interlacing (seven independently-filtered sub-images scattered
    back on the spec §8.2 grid, sub-byte passes bit-unpacked per
    pass since each pass row packs its own bytes); paletted tRNS
    per-index alpha (→ RGBA); and grey/RGB tRNS transparent-color
    keys (→ GA/RGBA, key compared in the source depth's range).
    Walks chunks with CRC verification, concatenates IDATs, inflates,
    reverses the per-scanline filter (all five types, bpp-aware —
    sub-byte rows filter with bpp=1 on the PACKED bytes, per spec
    §9)."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, end = len(_PNG_SIG), len(payload)
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 12 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + size : pos + 12 + size]
        )
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"tRNS":
            trns = body
        elif typ == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, color, comp, filt_method, interlace = ihdr
    if color not in _PNG_CHANNELS or comp != 0 or filt_method != 0:
        raise ValueError(f"invalid color/compression ({color}/{comp})")
    if depth not in _PNG_DEPTHS[color]:
        # the allowed (color, depth) matrix of spec §11.2.2 — with
        # sub-byte depths landed (r9) every valid combination decodes,
        # so an out-of-matrix depth is a malformed file, not a refusal
        raise ValueError(
            f"depth {depth} invalid for color type {color}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if width == 0 or height == 0:
        raise ValueError("zero PNG dimensions")  # spec requires nonzero
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))

    if depth < 8:
        # sub-byte bit packing (spec §7.2): samples pack MSB-first into
        # scanline bytes, rows pad to a byte boundary, and filters run
        # over the PACKED bytes with bpp=1 (§9) — so unfilter first,
        # unpack bits second. Only grey (color 0) and paletted (3)
        # reach here, both single-channel in the coded domain.
        if interlace == 0:
            stride = (width * depth + 7) // 8
            if len(raw) != height * (stride + 1):
                raise ValueError("inflated size does not match dimensions")
            sam = _png_unpack_bits(
                _png_unfilter(raw, height, stride, 1), width, depth
            )
        else:  # Adam7 — each pass packs its own rows independently
            sam = np.zeros((height, width), dtype=np.int64)
            pos2 = 0
            for x0, y0, dx, dy in _ADAM7_PASSES:
                pw = (width - x0 + dx - 1) // dx
                ph = (height - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                stride = (pw * depth + 7) // 8
                need = ph * (stride + 1)
                sam[y0::dy, x0::dx] = _png_unpack_bits(
                    _png_unfilter(raw[pos2 : pos2 + need], ph, stride, 1),
                    pw,
                    depth,
                )
                pos2 += need
            if pos2 != len(raw):
                raise ValueError(
                    "inflated size does not match Adam7 passes"
                )
        flat = sam.reshape(-1)
        if color == 3:
            return _png_apply_palette(
                flat, plte, trns, width, height
            )
        out = flat.astype(np.uint8)  # raw sample values, NOT rescaled
        if trns is not None:  # grey transparent-color key, sub-byte
            return PngImage(
                _png_apply_trns_key(out, 1, trns, depth),
                width, height, 2, depth,
            )
        return PngImage(out, width, height, 1, depth)

    bpp = channels * (depth // 8)

    if interlace == 0:
        expect = height * (width * bpp + 1)
        if len(raw) != expect:
            raise ValueError("inflated size does not match dimensions")
        px = _png_unfilter(raw, height, width * bpp, bpp)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        px = np.zeros((height, width * bpp), dtype=np.int64)
        pos2 = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            need = ph * (pw * bpp + 1)
            sub = _png_unfilter(
                raw[pos2 : pos2 + need], ph, pw * bpp, bpp
            )
            pos2 += need
            cols = (x0 + np.arange(pw) * dx)[:, None] * bpp + np.arange(
                bpp
            )
            px[y0::dy, cols.reshape(-1)] = sub.reshape(ph, pw * bpp)
        if pos2 != len(raw):
            raise ValueError("inflated size does not match Adam7 passes")

    if depth == 16:
        # big-endian sample pairs -> uint16 plane
        b = px.reshape(-1).astype(np.uint16)
        samples = (b[0::2] << 8) | b[1::2]
        if trns is not None:  # grey/RGB transparent-color key, 16-bit
            return PngImage(
                _png_apply_trns_key(samples, channels, trns, 16),
                width, height, channels + 1, 16,
            )
        return PngImage(samples, width, height, channels, 16)

    if color == 3:
        return _png_apply_palette(
            px.reshape(-1), plte, trns, width, height
        )
    out = px.reshape(-1).astype(np.uint8)
    if trns is not None:  # grey/RGB transparent-color key, 8-bit
        return PngImage(
            _png_apply_trns_key(out, channels, trns, 8),
            width, height, channels + 1, 8,
        )
    return PngImage(out, width, height, channels, 8)


def _png_apply_palette(
    idx: np.ndarray, plte, trns, width: int, height: int
) -> PngImage:
    """Expand palette indices to RGB (or RGBA with a tRNS per-index
    alpha chunk, PNG spec §11.3.2: one byte per entry, entries past
    the chunk default to fully opaque). Output is always 8-bit."""
    if plte is None or len(plte) % 3 != 0 or not plte:
        raise ValueError("paletted PNG missing/invalid PLTE chunk")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if idx.max(initial=0) >= len(pal):
        raise ValueError("palette index out of range")
    if trns is not None:
        if len(trns) > len(pal):
            raise ValueError("tRNS longer than palette")
        alpha = np.full(len(pal), 255, dtype=np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        rgba = np.concatenate([pal, alpha[:, None]], axis=1)
        return PngImage(
            rgba[idx.astype(np.intp)].reshape(-1), width, height, 4, 8
        )
    return PngImage(
        pal[idx.astype(np.intp)].reshape(-1), width, height, 3, 8
    )


# channels per color type: grey, RGB, palette indices, grey+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# allowed bit depths per color type (PNG spec §11.2.2)
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _png_unpack_bits(
    rows: np.ndarray, width: int, depth: int
) -> np.ndarray:
    """Unpack sub-byte samples from unfiltered scanline bytes: `rows`
    is (h, stride) byte values; samples pack MSB-first, `depth` bits
    each, rows padded to a byte boundary (pad bits discarded by the
    `width * depth` slice). Returns (h, width) int64 sample values."""
    bits = np.unpackbits(rows.astype(np.uint8), axis=1)
    bits = bits[:, : width * depth].reshape(rows.shape[0], width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
    return bits @ weights

# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step).
# r8 review fix: passes 3 and 5 were transposed ((0,4,8,4)/(0,2,2,2)),
# which double-covered 3 of every 64 pixels and mis-consumed real
# libpng-grid streams; the partition property below pins the spec grid.
_ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

# load-time pin (same discipline as the LSH/BPE asserts): the seven
# passes must partition the 8×8 tile — every pixel covered EXACTLY once
_seen = set()
for _x0, _y0, _dx, _dy in _ADAM7_PASSES:
    for _y in range(_y0, 8, _dy):
        for _x in range(_x0, 8, _dx):
            assert (_x, _y) not in _seen, f"Adam7 double-cover at {(_x, _y)}"
            _seen.add((_x, _y))
assert len(_seen) == 64, "Adam7 grid does not cover the tile"
del _seen, _x0, _y0, _dx, _dy, _x, _y


def _png_unfilter(
    raw: bytes, height: int, stride: int, bpp: int
) -> np.ndarray:
    """Reverse the per-scanline filters over one (sub-)image: `raw` is
    height scanlines of 1 filter byte + `stride` data bytes; `bpp` is
    the byte distance to the left neighbor (channels × bytes/sample).
    Returns (height, stride) int64 byte values."""
    px = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r_i in range(height):
        line = raw[r_i * (stride + 1) : (r_i + 1) * (stride + 1)]
        ft = line[0]
        filt = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int64)
        if ft == 0:
            row = filt
        elif ft == 2:  # Up
            row = (filt + prev) % 256
        elif ft == 1:  # Sub — sequential left dependency
            row = filt.copy()
            for j in range(bpp, stride):
                row[j] = (row[j] + row[j - bpp]) % 256
        elif ft == 3:  # Average
            row = filt.copy()
            for j in range(stride):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + (left + prev[j]) // 2) % 256
        elif ft == 4:  # Paeth
            row = filt.copy()
            for j in range(stride):
                left = row[j - bpp] if j >= bpp else 0
                ul = prev[j - bpp] if j >= bpp else 0
                row[j] = (
                    row[j] + _paeth(
                        np.int64(left), prev[j], np.int64(ul)
                    )
                ) % 256
        else:
            raise ValueError(f"bad filter type {ft}")
        px[r_i] = row
        prev = row
    return px


def _png_apply_trns_key(
    samples: np.ndarray, channels: int, trns: bytes, depth: int
) -> np.ndarray:
    """Grey/RGB transparent-color key (PNG spec §11.3.2): pixels whose
    sample(s) equal the key become alpha 0, all others fully opaque;
    output appends an alpha channel (grey→GA, RGB→RGBA), in the
    sample dtype. Color types that already carry alpha (4/6) must not
    have a tRNS chunk."""
    if channels not in (1, 3):
        raise ValueError("tRNS key invalid for alpha-bearing color type")
    n_samples = channels  # key is one 2-byte field per channel
    if len(trns) != 2 * n_samples:
        raise ValueError("bad tRNS key length")
    key16 = np.frombuffer(trns, dtype=">u2")
    if depth < 16 and key16.max(initial=0) > (1 << depth) - 1:
        raise ValueError(f"tRNS key exceeds {depth}-bit sample range")
    key = key16.astype(samples.dtype)
    pix = samples.reshape(-1, channels)
    opaque = (1 << depth) - 1
    alpha = np.where(
        (pix == key[None, :]).all(axis=1), 0, opaque
    ).astype(samples.dtype)
    return np.concatenate([pix, alpha[:, None]], axis=1).reshape(-1)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("max_pixel", T.IntegerType(), True),
        T.StructField("n_dark", T.IntegerType(), True),
    ]
)


_PNG_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)


def _png_synth_batches(encoder):
    """Batch generator factory: (doc_id, text) pdfs → PNG asset pdfs.
    Module-level so the fused query paths compose it in-process with
    the stats generator (guide §4.1 — same single-crossing rationale
    as the JPEG twin jpeg._fused_pixel_stats: the payload bytes never
    cross the Python boundary)."""

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                encoder(
                    np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "image/png",
                }
            )

    return synth


def png_assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    return docs.mapInPandas(_png_synth_batches(encode_png_gray), _PNG_ASSET_SCHEMA)


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """Per-asset pixel statistics over REAL-decoded PNGs. mean_pixel
    uses the portable floor(x·1e6 + 0.5)/1e6 rounding; pixel sums are
    exact integers in float64, so the DuckDB byte-domain oracle matches
    bit-for-bit — but only if every scanline filter was reversed
    correctly."""

    return df.mapInPandas(_png_stats_batches, PNG_STATS_SCHEMA)


def _png_stats_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        n = len(pdf)
        out = {
            "asset_id": pdf["asset_id"].to_numpy(),
            "width": np.zeros(n, dtype="int32"),
            "height": np.zeros(n, dtype="int32"),
            "n_pixels": np.zeros(n, dtype="int32"),
            "mean_pixel": np.zeros(n),
            "max_pixel": np.zeros(n, dtype="int32"),
            "n_dark": np.zeros(n, dtype="int32"),
        }
        for j, payload in enumerate(pdf["payload"]):
            img = decode_png(bytes(payload))
            px, w, h = img.samples, img.width, img.height
            total = int(px.sum(dtype=np.int64))
            out["width"][j] = w
            out["height"][j] = h
            out["n_pixels"][j] = px.size
            out["mean_pixel"][j] = (
                np.floor(total / px.size * 1e6 + 0.5) / 1e6
            )
            out["max_pixel"][j] = int(px.max())
            out["n_dark"][j] = int((px < PNG_DARK).sum())
        yield pd.DataFrame(out)


def _fused_png_stats(spark: SparkSession, sf_dir: str, encoder) -> DataFrame:
    """Encode + decode inside ONE Python task — the PNG twin of
    jpeg._fused_pixel_stats (r14 second pass, guide §4.1): identical
    batch generators composed in-process, payloads never cross the
    boundary; staged ≡ fused pinned in tests/test_opt_r14.py."""
    synth = _png_synth_batches(encoder)
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    return docs.mapInPandas(
        lambda it: _png_stats_batches(synth(it)), PNG_STATS_SCHEMA
    )


def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fused_png_stats(spark, sf_dir, encode_png_gray)


def palette_png_assets_from_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Paletted twin of png_assets_from_documents: each document's
    utf-8 bytes become color-type-3 indices (byte % 4 into
    PNG_PALETTE)."""
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    return docs.mapInPandas(
        _png_synth_batches(encode_png_palette), _PNG_ASSET_SCHEMA
    )


def multimodal_png_palette_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pixel stats over REAL-decoded PALETTED PNGs — the color-type-3
    end-to-end proof: the oracle derives every stat from the hex dump
    through the byte%4 palette map, so a wrong PLTE lookup or a filter
    slip over the index stream breaks the hash."""
    return _fused_png_stats(spark, sf_dir, encode_png_palette)


def multimodal_png_palette4_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pixel stats over REAL-decoded 4-BIT paletted PNGs (r9 — the
    sub-byte end-to-end proof): each document byte becomes one 4-bit
    index (byte % 16) into the 16-grey ramp PNG_PALETTE16, two indices
    packed per scanline byte, filters cycling over the packed bytes.
    The oracle derives every stat arithmetically from the hex codes
    (channel sum 51·idx, max 17·idx, dark = idx < 2), so a bit-unpack
    slip — wrong nibble order, pad bits leaking into samples, a filter
    applied after unpacking instead of before — breaks the hash."""
    return _fused_png_stats(spark, sf_dir, encode_png_palette4)


# Byte-domain twin: the decoded raster is the utf-8 bytes zero-padded
# to a 32-wide raster (empty text ⇒ one black row), so every stat is a
# pure aggregate over the hex-dump codes plus the pad arithmetic —
# no window/join needed. Agreement certifies the zlib inflate + filter
# reconstruction, since any unfiltering error perturbs pixel values.
MULTIMODAL_PNG_SQL = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
dims AS (
  SELECT doc_id, hx, n,
         CASE WHEN n = 0 THEN 1 ELSE (n + {PNG_W} - 1) // {PNG_W} END AS h
  FROM docs
),
codes AS (
  SELECT doc_id,
         16 * (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
            + (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1) AS code
  FROM dims, UNNEST(range(n)) AS t(i)
),
agg AS (
  SELECT doc_id,
         CAST(SUM(code) AS BIGINT) AS s,
         MAX(code) AS mx,
         CAST(SUM(CASE WHEN code < {PNG_DARK} THEN 1 ELSE 0 END) AS BIGINT)
           AS dark
  FROM codes GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       {PNG_W} AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(d.h * {PNG_W} AS INTEGER) AS n_pixels,
       FLOOR(CAST(COALESCE(a.s, 0) AS DOUBLE) / (d.h * {PNG_W}) * 1e6 + 0.5)
         / 1e6 AS mean_pixel,
       CAST(COALESCE(a.mx, 0) AS INTEGER) AS max_pixel,
       CAST(COALESCE(a.dark, 0) + (d.h * {PNG_W} - d.n) AS INTEGER) AS n_dark
FROM dims d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY asset_id
"""

# Paletted byte-domain twin: index = code % 4 into PNG_PALETTE
# ((255,0,0),(0,255,0),(0,0,255),(7,7,7)) — per index the channel SUM
# is 255/255/255/21, the channel MAX 255/255/255/7, and the dark
# (<32) channel count 2/2/2/3; zero-padding contributes index-0
# pixels. Stats are pure CASE aggregates over the hex codes.
MULTIMODAL_PNG_PALETTE_SQL = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
dims AS (
  SELECT doc_id, hx, n,
         CASE WHEN n = 0 THEN 1 ELSE (n + {PNG_W} - 1) // {PNG_W} END AS h
  FROM docs
),
codes AS (
  SELECT doc_id,
         (16 * (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
             + (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1)) % 4
           AS idx
  FROM dims, UNNEST(range(n)) AS t(i)
),
agg AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN idx = 3 THEN 21 ELSE 255 END) AS BIGINT) AS s,
         MAX(CASE WHEN idx = 3 THEN 7 ELSE 255 END) AS mx,
         CAST(SUM(CASE WHEN idx = 3 THEN 3 ELSE 2 END) AS BIGINT) AS dark
  FROM codes GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       {PNG_W} AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(d.h * {PNG_W} * 3 AS INTEGER) AS n_pixels,
       FLOOR((CAST(COALESCE(a.s, 0) AS DOUBLE)
              + 255.0 * (d.h * {PNG_W} - d.n))
             / (d.h * {PNG_W} * 3) * 1e6 + 0.5) / 1e6 AS mean_pixel,
       CAST(CASE WHEN d.h * {PNG_W} > d.n THEN 255
                 ELSE COALESCE(a.mx, 7) END AS INTEGER) AS max_pixel,
       CAST(COALESCE(a.dark, 0) + 2 * (d.h * {PNG_W} - d.n) AS INTEGER)
         AS n_dark
FROM dims d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY asset_id
"""


# 4-bit paletted byte-domain twin: idx = code % 16 into the 16-grey
# ramp (entry i = (17i, 17i, 17i)) — per pixel the channel SUM is
# 51·idx, the channel MAX 17·idx, and the dark (<32) channel count is
# 3 when idx < 2 (grey 0 or 17) else 0; zero-padding contributes
# index-0 (black) pixels. Pure arithmetic over the hex codes — no
# palette CASE needed, which is exactly why the ramp palette was
# chosen.
MULTIMODAL_PNG_PALETTE4_SQL = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
dims AS (
  SELECT doc_id, hx, n,
         CASE WHEN n = 0 THEN 1 ELSE (n + {PNG_W} - 1) // {PNG_W} END AS h
  FROM docs
),
codes AS (
  SELECT doc_id,
         (16 * (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
             + (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1)) % 16
           AS idx
  FROM dims, UNNEST(range(n)) AS t(i)
),
agg AS (
  SELECT doc_id,
         CAST(SUM(51 * idx) AS BIGINT) AS s,
         MAX(17 * idx) AS mx,
         CAST(SUM(CASE WHEN idx < 2 THEN 3 ELSE 0 END) AS BIGINT) AS dark
  FROM codes GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       {PNG_W} AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(d.h * {PNG_W} * 3 AS INTEGER) AS n_pixels,
       FLOOR(CAST(COALESCE(a.s, 0) AS DOUBLE)
             / (d.h * {PNG_W} * 3) * 1e6 + 0.5) / 1e6 AS mean_pixel,
       CAST(COALESCE(a.mx, 0) AS INTEGER) AS max_pixel,
       CAST(COALESCE(a.dark, 0) + 3 * (d.h * {PNG_W} - d.n) AS INTEGER)
         AS n_dark
FROM dims d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY asset_id
"""


# Per-index alpha for the tRNS family: index 0 opaque, 1 and 2 partial
# (128 and 64 — both chosen so 255·a is divisible by 255 and the
# premultiplied channel value is integer-exact), 3 fully transparent.
# Zero-padding lands on index 0 (opaque red).
PNG_TRNS = (255, 128, 64, 0)


def encode_png_palette_alpha(raw: np.ndarray, width: int = PNG_W) -> bytes:
    """Paletted PNG with a tRNS per-index alpha chunk (color type 3 +
    transparency — the transparent-logo shape): indices = byte % 4
    into PNG_PALETTE with PNG_TRNS alphas, same shared filter/framing
    core. The chunk carries all four alpha entries (a short chunk
    would default index 3 to opaque, per spec); the short-chunk
    default-to-opaque path is pinned by a dedicated unit instead."""
    idx = np.asarray(raw, dtype=np.uint8) % 4
    plte = bytes(c for rgb in PNG_PALETTE for c in rgb)
    return _encode_png(
        _pad_raster(idx, width), width, color_type=3,
        extra_chunks=(
            (b"PLTE", plte),
            (b"tRNS", bytes(PNG_TRNS)),
        ),
    )


PNG_ALPHA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.IntegerType(), True),
        T.StructField("n_opaque", T.IntegerType(), True),
        T.StructField("n_partial", T.IntegerType(), True),
        T.StructField("n_transparent", T.IntegerType(), True),
        T.StructField("premult_sum", T.LongType(), True),
        T.StructField("mean_premult", T.DoubleType(), True),
    ]
)


def multimodal_png_alpha_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Alpha-AWARE pixel stats over REAL-decoded paletted+tRNS PNGs —
    the r8 completion of the refused-feature list: transparency
    coverage counts and the alpha-premultiplied channel sum (per pixel,
    sum over RGB of c·a // 255 — integer floor division, portable).
    Stats that treated transparent pixels as opaque would inflate
    mean_premult by the index-3 greys; the oracle derives everything
    from the hex dump through the byte%4 index and the PNG_TRNS alpha
    map, so a decoder that drops, defaults, or mis-maps alpha breaks
    the hash. Same Arrow-batched partition-local shape as the other
    decode ops."""
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")

    def synth_and_stats(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = {
                "asset_id": pdf["doc_id"].to_numpy(),
                "width": np.zeros(n, dtype="int32"),
                "height": np.zeros(n, dtype="int32"),
                "n_pixels": np.zeros(n, dtype="int32"),
                "n_opaque": np.zeros(n, dtype="int32"),
                "n_partial": np.zeros(n, dtype="int32"),
                "n_transparent": np.zeros(n, dtype="int32"),
                "premult_sum": np.zeros(n, dtype="int64"),
                "mean_premult": np.zeros(n),
            }
            for j, t in enumerate(pdf["text"]):
                payload = encode_png_palette_alpha(
                    np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                )
                img = decode_png(payload)
                assert img.channels == 4  # RGBA came back
                w, h = img.width, img.height
                rgba = img.samples.reshape(-1, 4).astype(np.int64)
                a = rgba[:, 3]
                premult = (rgba[:, :3] * a[:, None] // 255).sum()
                out["width"][j] = w
                out["height"][j] = h
                out["n_pixels"][j] = w * h
                out["n_opaque"][j] = int((a == 255).sum())
                out["n_partial"][j] = int(((a > 0) & (a < 255)).sum())
                out["n_transparent"][j] = int((a == 0).sum())
                out["premult_sum"][j] = int(premult)
                out["mean_premult"][j] = (
                    np.floor(premult / (3 * w * h) * 1e6 + 0.5) / 1e6
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        synth_and_stats, PNG_ALPHA_STATS_SCHEMA
    )


# Alpha byte-domain twin: per index the (alpha, premultiplied-channel
# sum) pairs are 0→(255,255), 1→(128,128), 2→(64,64), 3→(0,0);
# zero-padding contributes opaque index-0 pixels.
MULTIMODAL_PNG_ALPHA_SQL = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
dims AS (
  SELECT doc_id, hx, n,
         CASE WHEN n = 0 THEN 1 ELSE (n + {PNG_W} - 1) // {PNG_W} END AS h
  FROM docs
),
codes AS (
  SELECT doc_id,
         (16 * (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
             + (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1)) % 4
           AS idx
  FROM dims, UNNEST(range(n)) AS t(i)
),
agg AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN idx = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS opaque,
         CAST(SUM(CASE WHEN idx IN (1, 2) THEN 1 ELSE 0 END) AS BIGINT)
           AS partial,
         CAST(SUM(CASE WHEN idx = 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS transp,
         CAST(SUM(CASE idx WHEN 0 THEN 255 WHEN 1 THEN 128
                           WHEN 2 THEN 64 ELSE 0 END) AS BIGINT) AS pm
  FROM codes GROUP BY doc_id
)
SELECT d.doc_id AS asset_id,
       {PNG_W} AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(d.h * {PNG_W} AS INTEGER) AS n_pixels,
       CAST(COALESCE(a.opaque, 0) + (d.h * {PNG_W} - d.n) AS INTEGER)
         AS n_opaque,
       CAST(COALESCE(a.partial, 0) AS INTEGER) AS n_partial,
       CAST(COALESCE(a.transp, 0) AS INTEGER) AS n_transparent,
       CAST(COALESCE(a.pm, 0) + 255 * (d.h * {PNG_W} - d.n) AS BIGINT)
         AS premult_sum,
       FLOOR((CAST(COALESCE(a.pm, 0) AS DOUBLE)
              + 255.0 * (d.h * {PNG_W} - d.n))
             / (d.h * {PNG_W} * 3) * 1e6 + 0.5) / 1e6 AS mean_premult
FROM dims d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY asset_id
"""


# --------------------------------------------------------------------------
# Perceptual-hash near-dup pairs — the image-dedup shape (pHash/aHash):
# average-hash the first 60 "pixels" of the fake-decoded payload (byte
# > per-asset mean ⇒ bit set), then find pairs within Hamming distance
# 3 via the banded pigeonhole join `dedup_simhash` uses (4 chunks × 15
# bits: any pair within distance 3 agrees on ≥ 1 chunk, so candidate
# generation is complete and the quadratic all-pairs compare never
# runs). Unlike simhash (engine-seeded xxhash ⇒ rows-only), this
# signature is pure portable arithmetic over byte values, so the DuckDB
# oracle checks the PAIRS exactly — its brute-force all-pairs
# formulation doubles as completeness proof for the banded plan.
# 60 bits (not 64) keeps 1<<pos inside positive BIGINT on both engines.
PHASH_BITS = 60
PHASH_CHUNKS = 4
PHASH_HAMMING_MAX = 3


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs_spread(spark, sf_dir, "doc_id", "text")
    codes = (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), F.lit(PHASH_BITS - 1))).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.ascii(F.col("text").substr(F.col("pos") + 1, F.lit(1))).alias(
                "code"
            ),
            (
                F.length(F.col("text").substr(F.col("pos") + 1, F.lit(1))) > 0
            ).alias("present"),
        )
        .filter(F.col("present"))
    )
    stats = codes.groupBy("doc_id").agg(
        (F.sum("code") / F.count(F.lit(1))).alias("mean")
    )
    sigs = (
        codes.join(stats, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("code") > F.col("mean"),
                    # shiftleft's bit-count param is int-only in the
                    # Python API; expr() accepts the column form
                    F.expr("shiftleft(CAST(1 AS BIGINT), pos)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("sig")
        )
    )
    chunk_bits = PHASH_BITS // PHASH_CHUNKS
    mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sig"), c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(PHASH_CHUNKS)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "sig", "ck.chunk", "ck.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("asset_a"),
            F.col("b.doc_id").alias("asset_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.select(
            "asset_a",
            "asset_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


MULTIMODAL_PHASH_SQL = f"""
WITH codes AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         ascii(substr(text, CAST(i + 1 AS INTEGER), 1)) AS code
  FROM documents, UNNEST(range({PHASH_BITS})) AS t(i)
  WHERE substr(text, CAST(i + 1 AS INTEGER), 1) <> ''
),
stats AS (
  SELECT doc_id, CAST(SUM(code) AS DOUBLE) / COUNT(*) AS mean
  FROM codes GROUP BY doc_id
),
sigs AS (
  SELECT c.doc_id,
         CAST(SUM(CASE WHEN c.code > s.mean
                       THEN (CAST(1 AS BIGINT) << c.pos) ELSE 0 END)
              AS BIGINT) AS sig
  FROM codes c JOIN stats s USING (doc_id)
  GROUP BY c.doc_id
)
SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {PHASH_HAMMING_MAX}
ORDER BY asset_a, asset_b
"""


QUERIES = {
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_features": multimodal_features,
    "multimodal_resize": multimodal_resize,
    "multimodal_audio_energy": multimodal_audio_energy,
    "multimodal_wav_rms": multimodal_wav_rms,
    "multimodal_wav_mulaw_rms": multimodal_wav_mulaw_rms,
    "multimodal_png_stats": multimodal_png_stats,
    "multimodal_png_palette_stats": multimodal_png_palette_stats,
    "multimodal_png_palette4_stats": multimodal_png_palette4_stats,
    "multimodal_png_alpha_stats": multimodal_png_alpha_stats,
    "multimodal_phash_neardup": multimodal_phash_neardup,
}

ORACLES = {
    "multimodal_frame_sample": MULTIMODAL_FRAME_SQL,
    "multimodal_binary_meta": MULTIMODAL_META_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "multimodal_audio_energy": MULTIMODAL_AUDIO_SQL,
    "multimodal_wav_rms": MULTIMODAL_WAV_SQL,
    "multimodal_wav_mulaw_rms": MULTIMODAL_MULAW_SQL,
    "multimodal_png_stats": MULTIMODAL_PNG_SQL,
    "multimodal_png_palette_stats": MULTIMODAL_PNG_PALETTE_SQL,
    "multimodal_png_palette4_stats": MULTIMODAL_PNG_PALETTE4_SQL,
    "multimodal_png_alpha_stats": MULTIMODAL_PNG_ALPHA_SQL,
    "multimodal_phash_neardup": MULTIMODAL_PHASH_SQL,
}
