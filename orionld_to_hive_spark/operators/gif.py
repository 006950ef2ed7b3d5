"""Real animated-GIF decode (GIF87a/GIF89a) over binary asset columns.

Beyond-reference capability (the reference — see
`/root/reference/README.md` — ships no media handling at all): this
module completes the repo's image codec suite (PNG: `multimodal.py`,
baseline+progressive JPEG: `jpeg.py`) with the one container format
that makes FRAME SAMPLING real — an animated GIF is a sequence of
composited frames, so the "asset row → N frame rows" shape that
`multimodal.sample_frames` stands in for with byte windows becomes an
actual video-style decode here.

Everything is hand-rolled from the GIF89a specification (CompuServe,
1990-07-31) in pure numpy/stdlib — no codec libraries:

- variable-code-width LSB-first LZW decompression (clear/EOI codes,
  code-width growth at 2^w up to 12 bits, the KwKwK self-reference
  case, table-full handling until the next CLEAR),
- logical screen descriptor + global/local color tables,
- graphic control extensions (delay, transparency, disposal methods
  0/1 "keep", 2 "restore to background", 3 "restore to previous"),
- four-pass interlace reordering,
- application (NETSCAPE2.0 loop count) / comment / plain-text
  extension skipping via sub-block walks,
- full-canvas compositing of sub-rectangle frames.

A real LZW COMPRESSOR (dict-based, emits CLEAR on table overflow)
backs the synth fixture and roundtrip property tests; the decoder is
additionally pinned by hand-built code streams (units) that are
independent of the compressor, mirroring the JPEG test strategy.

Scale shape: synth and decode are both partition-local Arrow-batched
`mapInPandas` stages with the same explicit core-spreading
repartition as the JPEG path (the codec is CPU-bound Python; on a
real cluster the exchange is noise next to the decode work). The
frame fan-out happens inside the UDF batch — no shuffle, no UDTF.

Oracle strategy (same closed-form trick as JPEG/PNG/WAV): the synth
fixture paints each 16x16 frame with the document's utf-8 bytes
through an IDENTITY grayscale palette, so every composited frame's
red channel equals a 256-byte slice of the text and the per-frame
stats are exact integer/byte arithmetic DuckDB can replay from
`documents.text` without any GIF knowledge.
"""
from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orionld_to_hive_spark.operators.multimodal import PNG_DARK
from orionld_to_hive_spark.sources.warehouse import load_table

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096

# interlace passes: (first row, row step) per GIF89a appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifImage(NamedTuple):
    """Decoded GIF: composited full-canvas RGB frames in presentation
    order. `frames[k]` is an (height, width, 3) uint8 array; delays
    are centiseconds from each frame's GCE (0 when absent);
    loop_count is the NETSCAPE2.0 iteration count (None when the
    extension is absent — a plain single-pass GIF)."""

    width: int
    height: int
    frames: list
    delays: list
    loop_count: object


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, per-image minimum code size)


def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> np.ndarray:
    """Decompress a GIF LZW stream into palette indices.

    `max_pixels` bounds the output (w*h of the image descriptor) so a
    corrupt stream cannot balloon memory; decoding stops once the
    image is full (encoders may legally omit the explicit EOI)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(max_pixels, dtype=np.uint8)
    n_out = 0

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                if n_out == max_pixels:
                    out_full = out
                    return out_full
                raise ValueError("unexpected end of LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError(f"first LZW code {code} is not a literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            if next_code < _TABLE_LIMIT:
                table.append(prev + entry[:1])
                next_code += 1
        elif code == next_code and next_code < _TABLE_LIMIT:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
            next_code += 1
        else:
            raise ValueError(f"LZW code {code} beyond table (next={next_code})")
        # width grows when the NEXT code to assign no longer fits
        if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        prev = entry

        if n_out + len(entry) > max_pixels:
            raise ValueError("LZW stream overflows the image rectangle")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if n_out == max_pixels:
            break
    if n_out != max_pixels:
        raise ValueError(f"LZW stream short: {n_out} of {max_pixels} pixels")
    return out


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF-LZW compression (dict-based), the synth fixture's
    encoder. Emits an initial CLEAR, grows code width in lockstep
    with the decoder's table, and emits CLEAR + resets when the table
    reaches 4096 entries. Roundtrip-pinned against lzw_decode AND the
    decoder is separately pinned by hand-built streams (tests)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1

    emit(clear, width)
    data = indices.astype(np.uint8).tobytes()
    if data:
        w = data[:1]
        for j in range(1, len(data)):
            k = data[j : j + 1]
            if w + k in table:
                w = w + k
                continue
            emit(table[w], width)
            if next_code < _TABLE_LIMIT:
                table[w + k] = next_code
                next_code += 1
                # the decoder's table lags the encoder's by one entry
                # (it reconstructs entry e_k only upon receiving code
                # c_{k+1}), so the encoder bumps its OUTPUT width one
                # entry later than the decoder's 2^w rule — emit at
                # the width the decoder will read with
                if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                    width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                width = min_code_size + 1
                next_code = eoi + 1
            w = k
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container parse


def _u16(b: bytes, p: int) -> int:
    return b[p] | (b[p + 1] << 8)


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at pos; return (data,
    position after the 0x00 terminator)."""
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("unexpected end inside sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(payload):
            raise ValueError("truncated sub-block")
        parts.append(payload[pos : pos + n])
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder interlaced rows (pass order 8/8, 8/8+4, 4/4+2, 2/2+1)
    into natural top-to-bottom order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(payload: bytes) -> GifImage:
    """Decode an animated GIF into composited full-canvas RGB frames.

    Compositing model: the canvas starts as the background color
    (GCT[background index], or black without a GCT); each image is
    drawn into its (left, top, w, h) rectangle skipping transparent
    pixels; after presentation, disposal 2 restores the rectangle to
    the background color and disposal 3 restores the pre-draw canvas.
    Honest refusal: none needed — GIF has a single mandatory coding
    path (no progressive/arithmetic variants), so every well-formed
    87a/89a stream decodes."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw, sh = _u16(payload, 6), _u16(payload, 8)
    packed, bg_index = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    bg = gct[bg_index] if gct is not None and bg_index < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    loop_count = None
    # pending graphic control state (applies to the next image only)
    delay_cs = 0
    disposal = 0
    transparent: int | None = None

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                data, pos = _sub_blocks(payload, pos)
                if len(data) < 4:
                    raise ValueError("short graphic control extension")
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                delay_cs = data[1] | (data[2] << 8)
                transparent = data[3] if flags & 0x01 else None
            elif label == 0xFF:  # application
                data, pos = _sub_blocks(payload, pos)
                if data[:11] == b"NETSCAPE2.0" and len(data) >= 14 and data[11] == 1:
                    loop_count = data[12] | (data[13] << 8)
            else:  # comment (0xFE), plain text (0x01), unknown: skip
                _, pos = _sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x} at {pos - 1}")

        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        left, top = _u16(payload, pos), _u16(payload, pos + 2)
        w, h = _u16(payload, pos + 4), _u16(payload, pos + 6)
        iflags = payload[pos + 8]
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError("image rectangle exceeds logical screen")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if pal.size != 3 * n:
                raise ValueError("truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image has neither local nor global color table")

        if pos >= len(payload):
            raise ValueError("truncated image data")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = lzw_decode(data, mcs, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")

        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + h, left : left + w]
        if transparent is None:
            rect[:] = pal[idx]
        else:
            opaque = idx != transparent
            rect[opaque] = pal[idx[opaque]]
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3:
            canvas = saved
        delay_cs, disposal, transparent = 0, 0, None

    if not frames:
        raise ValueError("GIF contains no image data")
    return GifImage(sw, sh, frames, delays, loop_count)


def parse_gif_meta(payload: bytes) -> tuple:
    """Metadata-only pass: (screen_w, screen_h, n_frames) WITHOUT
    touching entropy data — image data sub-blocks are SKIPPED via
    their length bytes (no LZW decode), so the cost is a few bytes per
    block. The cheap first phase of selective decode: at 100 TB you
    walk block headers to decide which assets are worth the full
    decode (the GIF twin of parse_jpeg_dims)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw, sh = _u16(payload, 6), _u16(payload, 8)
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1  # label
            _, pos = _skip_sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x} at {pos - 1}")
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        iflags = payload[pos + 8]
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # LZW minimum code size
        _, pos = _skip_sub_blocks(payload, pos)
        n_frames += 1
    return sw, sh, n_frames


def _skip_sub_blocks(payload: bytes, pos: int) -> tuple:
    """Like _sub_blocks but never materializes the data."""
    while True:
        if pos >= len(payload):
            raise ValueError("unexpected end inside sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return None, pos
        pos += n


# --------------------------------------------------------------------------
# encoder (synth fixture + roundtrip tests)

GIF_W = 16
GIF_H = 16
GIF_FRAME_PX = GIF_W * GIF_H  # 256 bytes of text per frame

_GRAY_GCT = np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()


def _chunk_sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list,
    palette: bytes = _GRAY_GCT,
    delays: list | None = None,
    interlace: bool = False,
    loop_count: int | None = 0,
    disposals: list | None = None,
    offsets: list | None = None,
    screen: tuple | None = None,
    transparent: int | None = None,
) -> bytes:
    """Encode index-array frames as an animated GIF89a with a global
    palette. Frames may be sub-rectangles when `offsets`/`screen` are
    given. Used by the synth fixture (full-canvas grayscale frames)
    and by the compositing/interlace unit tests."""
    n_colors = len(palette) // 3
    if n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    size_bits = max(n_colors.bit_length() - 1, 1) - 1
    mcs = max(n_colors.bit_length() - 1, 2)

    if screen is None:
        screen = (frames[0].shape[1], frames[0].shape[0])
    sw, sh = screen
    out = bytearray(b"GIF89a")
    out += bytes((sw & 0xFF, sw >> 8, sh & 0xFF, sh >> 8))
    out += bytes((0x80 | size_bits, 0, 0))  # GCT flag + size, bg=0, aspect
    out += palette
    if loop_count is not None:
        out += bytes((0x21, 0xFF, 0x0B)) + b"NETSCAPE2.0"
        out += bytes((3, 1, loop_count & 0xFF, loop_count >> 8, 0))
    for k, fr in enumerate(frames):
        h, w = fr.shape
        left, top = (offsets[k] if offsets else (0, 0))
        delay = delays[k] if delays else 0
        disposal = disposals[k] if disposals else 1
        gce_flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes((0x21, 0xF9, 4, gce_flags, delay & 0xFF, delay >> 8,
                      transparent or 0, 0))
        out += bytes((0x2C, left & 0xFF, left >> 8, top & 0xFF, top >> 8,
                      w & 0xFF, w >> 8, h & 0xFF, h >> 8,
                      0x40 if interlace else 0))
        rows = fr
        if interlace:
            order = [y for start, step in _INTERLACE_PASSES
                     for y in range(start, h, step)]
            rows = fr[np.array(order)]
        out.append(mcs)
        out += _chunk_sub_blocks(lzw_encode(rows.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


def encode_gif_gray_anim(data: np.ndarray, interlace: bool = False) -> bytes:
    """The synth fixture: pack `data` (uint8 text bytes) into 16x16
    identity-grayscale frames (zero-padded tail, at least one frame),
    delay of frame k = k+1 centiseconds, disposal 1, loop forever.
    Full-canvas replacement frames keep the closed-form oracle exact:
    composited frame k's red channel == text bytes [256k, 256k+256)."""
    nf = max((len(data) + GIF_FRAME_PX - 1) // GIF_FRAME_PX, 1)
    padded = np.zeros(nf * GIF_FRAME_PX, dtype=np.uint8)
    padded[: len(data)] = data
    frames = [padded[k * GIF_FRAME_PX : (k + 1) * GIF_FRAME_PX].reshape(GIF_H, GIF_W)
              for k in range(nf)]
    return encode_gif(frames, delays=[k + 1 for k in range(nf)],
                      interlace=interlace, loop_count=0)


# --------------------------------------------------------------------------
# Spark queries

_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("n_dark", T.IntegerType(), True),
        T.StructField("delay_cs", T.IntegerType(), True),
    ]
)

GIF_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("screen_w", T.IntegerType(), True),
        T.StructField("screen_h", T.IntegerType(), True),
        T.StructField("total_delay_cs", T.IntegerType(), True),
        T.StructField("loop_count", T.IntegerType(), True),
    ]
)


def _gif_synth_batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Batch generator: (doc_id, text) pdfs → GIF asset pdfs. Even
    doc_ids encode INTERLACED so the driver path exercises the
    four-pass reorder; the decoded frames (and therefore the oracle)
    are identical either way. Module-level so the fused query paths
    compose it in-process (guide §4.1 — see the JPEG twin
    _fused_pixel_stats for the rationale; the payload bytes never
    cross the Python boundary in the fused shape)."""
    for pdf in it:
        payloads = [
            encode_gif_gray_anim(
                np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8),
                interlace=(int(d) % 2 == 0),
            )
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})


def _gif_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def gif_assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → animated-GIF assets, as a standalone frame (test /
    composition surface; the registry queries use the fused
    single-crossing paths)."""
    return _gif_docs(spark, sf_dir).mapInPandas(
        _gif_synth_batches, _ASSET_SCHEMA
    )


def _gif_frame_batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    for pdf in it:
        ids, idxs, ws, hs, means, darks, delays = [], [], [], [], [], [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            img = decode_gif(bytes(payload))
            for k, fr in enumerate(img.frames):
                px = fr[:, :, 0]  # identity gray palette: R == index
                ids.append(asset_id)
                idxs.append(k)
                ws.append(fr.shape[1])
                hs.append(fr.shape[0])
                means.append(
                    np.floor(int(px.sum(dtype=np.int64)) / px.size * 1e6 + 0.5)
                    / 1e6
                )
                darks.append(int((px < PNG_DARK).sum()))
                delays.append(img.delays[k])
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "frame_index": pd.Series(idxs, dtype="int32"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "mean_pixel": pd.Series(means, dtype="float64"),
                "n_dark": pd.Series(darks, dtype="int32"),
                "delay_cs": pd.Series(delays, dtype="int32"),
            }
        )

def gif_frame_stats(df: DataFrame) -> DataFrame:
    """asset → one row per composited frame (the real version of the
    byte-window frame sampler): grayscale mean (floor-rounded to 1e-6,
    matching the SQL twin bit-for-bit), dark-pixel count, GCE delay."""
    return df.mapInPandas(_gif_frame_batches, GIF_FRAME_SCHEMA)


def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused single-crossing path (r14 second pass): synth + decode
    # composed in-process — see _gif_synth_batches
    return _gif_docs(spark, sf_dir).mapInPandas(
        lambda it: _gif_frame_batches(_gif_synth_batches(it)),
        GIF_FRAME_SCHEMA,
    )


def _gif_summary_batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    for pdf in it:
        n = len(pdf)
        out = {
            "asset_id": pdf["asset_id"].to_numpy(),
            "n_frames": np.zeros(n, dtype="int32"),
            "screen_w": np.zeros(n, dtype="int32"),
            "screen_h": np.zeros(n, dtype="int32"),
            "total_delay_cs": np.zeros(n, dtype="int32"),
            "loop_count": np.zeros(n, dtype="int32"),
        }
        for j, payload in enumerate(pdf["payload"]):
            img = decode_gif(bytes(payload))
            out["n_frames"][j] = len(img.frames)
            out["screen_w"][j] = img.width
            out["screen_h"][j] = img.height
            out["total_delay_cs"][j] = sum(img.delays)
            out["loop_count"][j] = -1 if img.loop_count is None else img.loop_count
        yield pd.DataFrame(out)

def gif_anim_summary(df: DataFrame) -> DataFrame:
    return df.mapInPandas(_gif_summary_batches, GIF_SUMMARY_SCHEMA)


def multimodal_gif_anim_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused single-crossing path (r14 second pass)
    return _gif_docs(spark, sf_dir).mapInPandas(
        lambda it: _gif_summary_batches(_gif_synth_batches(it)),
        GIF_SUMMARY_SCHEMA,
    )


# Closed-form oracles: frame k of doc d is text bytes [256k, 256k+256)
# zero-padded, so mean = sum(slice)/256 and dark = count(<PNG_DARK) +
# pad (padding zeros are dark). Delay of frame k is k+1 cs by
# construction; an empty document still yields one all-zero frame.
MULTIMODAL_GIF_FRAMES_SQL = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         GREATEST(CAST(CEIL(octet_length(encode(text)) / {GIF_FRAME_PX}.0)
                       AS BIGINT), 1) AS nf
  FROM documents
),
frames AS (
  SELECT doc_id, n, nf, CAST(k AS BIGINT) AS k
  FROM docs, UNNEST(range(nf)) AS t(k)
),
codes AS (
  SELECT doc_id, CAST(i AS BIGINT) // {GIF_FRAME_PX} AS k,
         16 * (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 1 AS INTEGER), 1)) - 1)
            + (strpos('0123456789ABCDEF',
                      substr(hx, CAST(2*i + 2 AS INTEGER), 1)) - 1) AS code
  FROM docs, UNNEST(range(n)) AS t(i)
),
fstats AS (
  SELECT doc_id, k, SUM(code) AS scode,
         SUM(CASE WHEN code < {PNG_DARK} THEN 1 ELSE 0 END) AS ndark,
         COUNT(*) AS ncodes
  FROM codes GROUP BY doc_id, k
)
SELECT f.doc_id AS asset_id,
       CAST(f.k AS INTEGER) AS frame_index,
       {GIF_W} AS width, {GIF_H} AS height,
       FLOOR(COALESCE(s.scode, 0) / {GIF_FRAME_PX}.0 * 1e6 + 0.5) / 1e6
         AS mean_pixel,
       CAST(COALESCE(s.ndark, 0) + {GIF_FRAME_PX} - COALESCE(s.ncodes, 0)
            AS INTEGER) AS n_dark,
       CAST(f.k + 1 AS INTEGER) AS delay_cs
FROM frames f LEFT JOIN fstats s ON s.doc_id = f.doc_id AND s.k = f.k
ORDER BY asset_id, frame_index
"""

MULTIMODAL_GIF_SUMMARY_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         GREATEST(CAST(CEIL(octet_length(encode(text)) / {GIF_FRAME_PX}.0)
                       AS BIGINT), 1) AS nf
  FROM documents
)
SELECT doc_id AS asset_id,
       CAST(nf AS INTEGER) AS n_frames,
       {GIF_W} AS screen_w, {GIF_H} AS screen_h,
       CAST(nf * (nf + 1) / 2 AS INTEGER) AS total_delay_cs,
       0 AS loop_count
FROM docs
ORDER BY asset_id
"""


def multimodal_gif_selective_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SELECTIVE decode (the JPEG pattern on the GIF path):
    the metadata walk (parse_gif_meta — block-length skips, no LZW)
    filters to ANIMATED assets (n_frames >= 2), and the expensive
    frame decode runs only on survivors. On this corpus the predicate
    keeps docs longer than one 256-byte frame (~55% of assets holding
    ~75% of bytes at sf0.1)."""
    # fused single-crossing path (r14 second pass): synth → metadata
    # triage → predicate → frame decode of survivors, composed
    # in-process; the JVM `n_frames >= 2` filter becomes the same
    # int32 comparison in pandas (row-identical; see the JPEG twin
    # _jpeg_selective for the rationale)

    def meta_filter(it):
        for pdf in it:
            nf = np.fromiter(
                (parse_gif_meta(bytes(p))[2] for p in pdf["payload"]),
                dtype=np.int32,
                count=len(pdf),
            )
            yield pdf[nf >= 2]

    return _gif_docs(spark, sf_dir).mapInPandas(
        lambda it: _gif_frame_batches(meta_filter(_gif_synth_batches(it))),
        GIF_FRAME_SCHEMA,
    )


MULTIMODAL_GIF_SELECTIVE_SQL = MULTIMODAL_GIF_FRAMES_SQL.replace(
    "FROM frames f LEFT JOIN fstats s ON s.doc_id = f.doc_id AND s.k = f.k",
    "FROM frames f LEFT JOIN fstats s ON s.doc_id = f.doc_id AND s.k = f.k\n"
    "WHERE f.nf >= 2",
)


QUERIES = {
    "multimodal_gif_frames": multimodal_gif_frames,
    "multimodal_gif_anim_summary": multimodal_gif_anim_summary,
    "multimodal_gif_selective_frames": multimodal_gif_selective_frames,
}

ORACLES = {
    "multimodal_gif_frames": MULTIMODAL_GIF_FRAMES_SQL,
    "multimodal_gif_anim_summary": MULTIMODAL_GIF_SUMMARY_SQL,
    "multimodal_gif_selective_frames": MULTIMODAL_GIF_SELECTIVE_SQL,
}
