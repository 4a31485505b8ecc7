"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/resize/frame-sample are Arrow-batched pandas UDFs
over ``mapInPandas``.  Four formats decode for REAL with only stdlib +
numpy: binary-P6 PPM (decode, nearest-neighbor resize, frame-boundary
demux of concatenated-frame payloads), PNG (chunk walk with CRC checks,
zlib IDAT inflate, all five scanline-filter reconstructions including
Paeth), GIF (from-scratch LZW decompressor — variable-width codes, clear
codes, KwKwK — palette lookup, multi-image animation demux), and
RIFF/WAVE PCM-16 audio — each verified against closed-form fixtures.
Formats needing codec libraries (JPEG/MP3/ffmpeg containers —
PIL/opencv/ffmpeg are not in this container) fall back to clearly-tagged
deterministic stand-ins; the Spark-side plumbing — schema,
partition-preserving batch iteration, UDF signatures, batch shapes — is the
same either way, so a real codec drops in without touching the plan.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("payload_size", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_size", IntegerType(), True),
        StructField("feature", ArrayType(IntegerType()), True),
        StructField("decoder", StringType(), True),
    ]
)


def to_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a media table: payload = utf-8 bytes, typed
    metadata columns.  The same shape a real image/audio ingest produces
    (payload from file bytes, format from magic numbers)."""
    return docs.select(
        "doc_id",
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.col(text_col)).alias("payload_size"),
        F.lit("txt").alias("format"),
    )


def _extract_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction.

    PPM/PNG/GIF/JPEG payloads get a REAL image decode
    (``_IMAGE_DECODERS``) and emit [w, h, mean_r, mean_g, mean_b]; WAV
    payloads get a REAL audio decode (``_decode_wav``) and emit
    [sample_rate, n_channels, n_samples, peak].  Other formats fall back
    to the deterministic stand-in (first 8 payload bytes as ints — e.g.
    MP3 would need a real audio codec); either way the pipeline shape —
    batch in, batch out, columnar — is fully exercised."""
    import numpy as np

    for pdf in batches:
        feats, decoders = [], []
        for fmt, p in zip(pdf["format"], pdf["payload"]):
            img_decoder = _IMAGE_DECODERS.get(fmt)
            arr = img_decoder(p) if img_decoder is not None else None
            wav = _decode_wav(p) if fmt == "wav" else None
            if arr is not None:
                h, w, _ = arr.shape
                means = arr.astype(np.int64).sum(axis=(0, 1)) // (w * h)
                feats.append([w, h, int(means[0]), int(means[1]), int(means[2])])
                decoders.append(f"{fmt}-numpy")
            elif wav is not None:
                rate, ch, samples = wav
                peak = (
                    int(np.abs(samples.astype(np.int64)).max())
                    if samples.size
                    else 0
                )
                feats.append([rate, ch, samples.shape[0], peak])
                decoders.append("wav-numpy")
            else:
                feats.append(list(p[:8]) if p is not None else None)
                decoders.append("stub-first8bytes")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload_size": pdf["payload_size"],
                "feature": feats,
                "decoder": decoders,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the media table — partition-
    parallel, Arrow-batched, no shuffle."""
    return media.mapInPandas(_extract_features_batches, schema=FEATURE_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("img_w", IntegerType(), True),
        StructField("img_h", IntegerType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
    ]
)


def synth_ppm(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic binary-P6 PPM payload per id (Arrow-batched
    ``mapInPandas``) — the image-ingest fixture generator.

    Dimensions and pixels are pure functions of the id (w = 4 + id%5,
    h = 3 + id%4; row y is a constant color (id+y, 2id+3y, 5id+7y) mod
    256), so downstream decode results are analytically derivable — the
    property the DuckDB oracle uses to hash-gate the REAL decode path."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                ys = np.arange(h, dtype=np.int64)
                rows = np.stack(
                    [(i + ys) % 256, (2 * i + 3 * ys) % 256, (5 * i + 7 * ys) % 256],
                    axis=1,
                ).astype(np.uint8)  # (h, 3) — one RGB color per row
                pixels = np.repeat(rows[:, None, :], w, axis=1)  # (h, w, 3)
                payloads.append(
                    f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "ppm",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


def _ppm_header(payload: bytes, start: int = 0):
    """Parse one binary-P6 header at byte offset ``start`` →
    (w, h, data_offset) or None.  Header = magic, width, height, maxval as
    whitespace-separated tokens ('#' comment lines skipped), then one
    whitespace byte, then raw RGB bytes at data_offset."""
    if payload is None or payload[start : start + 2] != b"P6":
        return None
    tokens: list[bytes] = []
    pos = start + 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":  # comment: skip to end of line
            pos = payload.find(b"\n", pos)
            if pos < 0:
                return None
            pos += 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    pos += 1  # the single whitespace byte after maxval
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    return w, h, pos


def _decode_ppm(payload: bytes):
    """Parse one binary-P6 PPM into an (h, w, 3) uint8 array, or None for
    malformed payloads."""
    import numpy as np

    hdr = _ppm_header(payload)
    if hdr is None:
        return None
    w, h, pos = hdr
    if len(payload) - pos < w * h * 3:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Walk a PNG's chunk list → list of (type, data), verifying each
    chunk's CRC-32 (over type + data, as the spec requires).  Returns
    None for a bad signature, a truncated chunk, or a CRC mismatch —
    corrupt payloads never reach the inflate step."""
    import zlib

    if payload is None or payload[:8] != PNG_SIG:
        return None
    chunks: list[tuple[bytes, bytes]] = []
    pos = 8
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        crc = payload[pos + 8 + size : pos + 12 + size]
        if len(data) < size or len(crc) < 4:
            return None  # truncated chunk
        if zlib.crc32(ctype + data) != int.from_bytes(crc, "big"):
            return None  # corrupt chunk
        chunks.append((ctype, data))
        pos += 12 + size
        if ctype == b"IEND":
            break
    return chunks


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG filter 4): whichever of left/up/up-left
    is closest to a + b − c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes):
    """REAL PNG decode into an (h, w, 3) uint8 array, or None for
    malformed payloads — stdlib ``zlib`` + numpy only.

    Full pipeline: signature + chunk walk with CRC-32 verification
    (``_png_chunks``), IHDR validation, concatenated-IDAT zlib inflate,
    then per-scanline filter reconstruction for all five filter types
    (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth).  Supports the common
    web-image shapes: 8-bit depth, color type 2 (RGB) or 6 (RGBA — the
    alpha plane is parsed then dropped), non-interlaced.  Sub lowers to
    a per-byte-phase cumsum and Up to one vector add; Average/Paeth are
    sequential in x by definition, so those rows walk pixel-by-pixel."""
    import zlib

    import numpy as np

    chunks = _png_chunks(payload)
    if not chunks or chunks[0][0] != b"IHDR" or len(chunks[0][1]) != 13:
        return None
    ihdr = chunks[0][1]
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _, _, interlace = ihdr[8:13]
    if w <= 0 or h <= 0 or bit_depth != 8 or interlace != 0:
        return None
    if color_type not in (2, 6):  # RGB / RGBA only
        return None
    bpp = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(b"".join(d for t, d in chunks if t == b"IDAT"))
    except zlib.error:
        return None
    stride = 1 + w * bpp  # filter byte + one scanline
    if len(raw) != h * stride:
        return None
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        filt, row = lines[y, 0], lines[y, 1:].copy()
        if filt == 0:
            pass
        elif filt == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            for j in range(bpp):
                np.cumsum(row[j::bpp], dtype=np.uint8, out=row[j::bpp])
        elif filt == 2:  # Up: recon[x] = raw[x] + prev[x]
            row += prev
        elif filt == 3:  # Average: + (left + up) // 2
            for x in range(w * bpp):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + (left + int(prev[x])) // 2) % 256
        elif filt == 4:  # Paeth
            for x in range(w * bpp):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + _paeth(a, int(prev[x]), c)) % 256
        else:
            return None  # invalid filter type
        out[y] = prev = row
    return out.reshape(h, w, bpp)[:, :, :3].copy()


def _encode_png(arr, row_filter=None, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real RGB PNG (8-bit, color
    type 2, non-interlaced).  ``row_filter`` maps scanline y → filter
    type 0-4 (default: all 0); residuals are the forward form of the
    same equations ``_decode_png`` reconstructs, so synthetic fixtures
    can exercise every filter path through a genuine zlib round-trip."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = arr.shape
    flat = arr.reshape(h, w * 3).astype(np.int16)
    scanlines = []
    for y in range(h):
        filt = row_filter(y) if row_filter is not None else 0
        row, prev = flat[y], (flat[y - 1] if y else np.zeros(w * 3, np.int16))
        if filt == 0:
            res = row
        elif filt == 1:
            res = row - np.concatenate([np.zeros(3, np.int16), row[:-3]])
        elif filt == 2:
            res = row - prev
        elif filt == 3:
            left = np.concatenate([np.zeros(3, np.int16), row[:-3]])
            res = row - (left + prev) // 2
        elif filt == 4:
            res = row.copy()
            for x in range(w * 3):
                a = int(row[x - 3]) if x >= 3 else 0
                c = int(prev[x - 3]) if x >= 3 else 0
                res[x] = row[x] - _paeth(a, int(prev[x]), c)
        else:
            raise ValueError(f"invalid PNG filter type {filt}")
        scanlines.append(bytes([filt]) + (res % 256).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(scanlines), level)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synth_png(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic PNG payload per id (Arrow-batched
    ``mapInPandas``) — the PNG-ingest fixture generator.

    Pixels are the SAME closed form as ``synth_ppm`` (w = 4 + id%5,
    h = 3 + id%4; row y is a constant color (id+y, 2id+3y, 5id+7y) mod
    256), so the analytic DuckDB oracle shares the PPM math; the scanline
    filter for row y is (id + y) % 5, so the hash-gated decode exercises
    ALL FIVE filter reconstructions — None/Sub/Up/Average/Paeth — through
    a genuine zlib inflate, not just the trivial filter-0 path."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                ys = np.arange(h, dtype=np.int64)
                rows = np.stack(
                    [(i + ys) % 256, (2 * i + 3 * ys) % 256, (5 * i + 7 * ys) % 256],
                    axis=1,
                ).astype(np.uint8)
                pixels = np.repeat(rows[:, None, :], w, axis=1)
                payloads.append(
                    _encode_png(pixels, row_filter=lambda y, i=i: (i + y) % 5)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "png",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


_IMAGE_DECODERS = {"ppm": _decode_ppm, "png": _decode_png}


def decode_image(media: DataFrame) -> DataFrame:
    """REAL image decode over the media table for the from-scratch
    formats — binary-P6 PPM (header parse + frombuffer), PNG (CRC'd
    chunk walk + zlib inflate + full filter reconstruction), GIF
    (from-scratch LZW + palette lookup), and baseline JPEG (from-scratch
    Huffman/DPCM entropy decode + pinned-order IDCT) — emitting
    per-channel integer sums, Arrow-batched through ``mapInPandas``
    (partition-parallel, no shuffle).  Malformed payloads decode to NULL
    stats.

    Rows in any other format (video containers, webp, …) raise
    NotImplementedError; the four verified codecs are the template a
    further format drops into."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in IMAGE_STATS_SCHEMA}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                decoder = _IMAGE_DECODERS.get(fmt)
                if decoder is None:
                    raise NotImplementedError(
                        f"no decoder for format {fmt!r}: the from-scratch "
                        f"codecs cover {sorted(_IMAGE_DECODERS)}"
                    )
                arr = decoder(payload)
                out["doc_id"].append(doc_id)
                if arr is None:
                    for k in ("img_w", "img_h", "n_pixels", "sum_r", "sum_g", "sum_b"):
                        out[k].append(None)
                    continue
                h, w, _ = arr.shape
                sums = arr.astype(np.int64).sum(axis=(0, 1))
                out["img_w"].append(w)
                out["img_h"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("peak", IntegerType(), True),
        StructField("sum_abs", LongType(), True),
        StructField("sum_sq", LongType(), True),
    ]
)


def synth_wav(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic 16-bit PCM mono WAV payload per id
    (Arrow-batched ``mapInPandas``) — the audio-ingest fixture generator.

    Sample count and samples are pure functions of the id
    (n = 20 + id%13 samples at 8 kHz; sample t = ((7·id + 31·t) mod
    2048) − 1024), so downstream decode stats are analytically
    derivable — the property the DuckDB oracle uses to hash-gate the
    REAL WAV decode path, exactly like ``synth_ppm`` does for images."""
    import struct

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                n = 20 + i % 13
                t = np.arange(n, dtype=np.int64)
                samples = (((7 * i + 31 * t) % 2048) - 1024).astype("<i2")
                data = samples.tobytes()
                fmt = struct.pack(
                    "<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 16
                )  # PCM, mono, 8 kHz, 16-bit
                body = (
                    b"WAVE"
                    + b"fmt "
                    + struct.pack("<I", len(fmt))
                    + fmt
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", len(body)) + body
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "audio",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "wav",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


def synth_wav_g711(
    ids: DataFrame, id_col: str = "doc_id", law: str = "ulaw"
) -> DataFrame:
    """Deterministic synthetic G.711-companded mono WAV payload per id —
    the telephony-audio ingest fixture (µ-law format tag 7 or A-law 6,
    8-bit samples, 8 kHz).

    n = 16 + id%11 samples; companded byte t is (3·id + 7·t) mod 256,
    so the decoded linear stream is the G.711 expansion of known bytes —
    an integer-exact analytic chain the DuckDB oracle replicates to
    hash-gate the REAL expansion-table decode."""
    import struct

    import numpy as np

    tag = 7 if law == "ulaw" else 6

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                n = 16 + i % 11
                t = np.arange(n, dtype=np.int64)
                data = ((3 * i + 7 * t) % 256).astype(np.uint8).tobytes()
                fmt = struct.pack(
                    "<HHIIHH", tag, 1, 8000, 8000, 1, 8
                )  # G.711, mono, 8 kHz, 8-bit companded
                body = (
                    b"WAVE"
                    + b"fmt "
                    + struct.pack("<I", len(fmt))
                    + fmt
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                    + (b"\x00" if len(data) & 1 else b"")
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", len(body)) + body
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "audio",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "wav",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


def _ulaw_to_linear(b: int) -> int:
    """G.711 µ-law byte → linear PCM-16 sample (the ITU/Sun reference
    expansion: complement, biased-mantissa shift by segment, sign)."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_to_linear(b: int) -> int:
    """G.711 A-law byte → linear PCM-16 sample (xor 0x55, segment-wise
    mantissa expansion; sign bit SET means positive in A-law)."""
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_G711_TABLES: dict[int, "object"] = {}


def _g711_table(audio_format: int):
    """256-entry int16 numpy expansion table for WAVE format tag 7
    (µ-law) or 6 (A-law), built once from the reference formulas."""
    import numpy as np

    if audio_format not in _G711_TABLES:
        fn = _ulaw_to_linear if audio_format == 7 else _alaw_to_linear
        _G711_TABLES[audio_format] = np.array(
            [fn(b) for b in range(256)], dtype=np.int16
        )
    return _G711_TABLES[audio_format]


def _decode_wav(payload: bytes):
    """Parse one RIFF/WAVE payload into (sample_rate, n_channels,
    (n_samples, n_channels) int16 array), or None for malformed /
    unsupported payloads.  Walks the chunk list (chunks are 2-byte
    aligned; odd sizes carry a pad byte), reads the ``fmt `` chunk for
    format/channels/rate and the ``data`` chunk for samples.  Supported
    codecs: uncompressed PCM-16 (format 1) and the G.711 companded
    telephony pair — µ-law (format 7) and A-law (format 6), 8-bit
    bytes expanded to linear PCM-16 through the reference tables."""
    import struct

    import numpy as np

    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if n_channels < 1:
        return None
    if audio_format == 1 and bits == 16:
        frame_bytes = 2 * n_channels
        n_frames = len(data) // frame_bytes
        samples = np.frombuffer(
            data, dtype="<i2", count=n_frames * n_channels
        ).reshape(n_frames, n_channels)
        return sample_rate, n_channels, samples
    if audio_format in (6, 7) and bits == 8:
        n_frames = len(data) // n_channels
        raw = np.frombuffer(
            data, dtype=np.uint8, count=n_frames * n_channels
        )
        samples = _g711_table(audio_format)[raw].reshape(
            n_frames, n_channels
        )
        return sample_rate, n_channels, samples
    return None  # other codecs need libraries not in this container


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode over the media table for the dependency-free
    RIFF/WAVE PCM-16 format: numpy chunk-walk + frombuffer + integer
    sample stats, Arrow-batched through ``mapInPandas``
    (partition-parallel, no shuffle).  Malformed WAV payloads decode to
    NULL stats; rows in any other format raise NotImplementedError
    (MP3/FLAC/OGG need codec libraries, not in this container) — the
    same contract as ``decode_image``'s PPM path."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in AUDIO_STATS_SCHEMA}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                if fmt != "wav":
                    raise NotImplementedError(
                        f"no decoder for format {fmt!r}: only RIFF/WAVE "
                        "PCM decodes without codec libraries"
                    )
                decoded = _decode_wav(payload)
                out["doc_id"].append(doc_id)
                if decoded is None:
                    for k in (
                        "sample_rate",
                        "n_channels",
                        "n_samples",
                        "peak",
                        "sum_abs",
                        "sum_sq",
                    ):
                        out[k].append(None)
                    continue
                rate, ch, samples = decoded
                s = samples.astype(np.int64)
                out["sample_rate"].append(rate)
                out["n_channels"].append(ch)
                out["n_samples"].append(samples.shape[0])
                out["peak"].append(
                    int(np.abs(s).max()) if s.size else 0
                )
                out["sum_abs"].append(int(np.abs(s).sum()))
                out["sum_sq"].append(int((s * s).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("target_rate", IntegerType(), False),
        StructField("resampled", BinaryType(), True),
        StructField("n_samples_out", LongType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """Sample-rate conversion over the media table (1 row in → 1 row
    out, Arrow-batched, partition-parallel, no shuffle).

    REAL for WAV: decode (``_decode_wav``), nearest-sample pick at the
    new rate (out frame t takes source frame floor((t+0.5)·src/dst) —
    the same pixel-center mapping ``_resize_nn`` uses, so results are a
    closed-form function of the source), re-encode PCM-16 WAV at
    ``target_rate`` — decoder tag 'wav-numpy-nearest'.  Malformed WAV →
    NULL output.  Other formats raise NotImplementedError (proper
    resampling of compressed audio needs codec + DSP libraries)."""
    import struct

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs, ns, decoders = [], [], []
            for fmt, p in zip(pdf["format"], pdf["payload"]):
                if fmt != "wav":
                    raise NotImplementedError(
                        f"no resampler for format {fmt!r}: only RIFF/WAVE "
                        "PCM resamples without DSP libraries"
                    )
                decoded = _decode_wav(p)
                decoders.append("wav-numpy-nearest")
                if decoded is None:
                    outs.append(None)
                    ns.append(None)
                    continue
                rate, ch, samples = decoded
                n_src = samples.shape[0]
                n_dst = (n_src * target_rate) // rate if rate else 0
                idx = ((np.arange(n_dst) + 0.5) * n_src / max(n_dst, 1))
                idx = np.clip(idx.astype(np.int64), 0, max(n_src - 1, 0))
                picked = (
                    samples[idx]
                    if n_src
                    else np.zeros((0, ch), dtype="<i2")
                )
                data = picked.astype("<i2").tobytes()
                fmt_chunk = struct.pack(
                    "<HHIIHH",
                    1,
                    ch,
                    target_rate,
                    target_rate * 2 * ch,
                    2 * ch,
                    16,
                )
                body = (
                    b"WAVE"
                    + b"fmt "
                    + struct.pack("<I", len(fmt_chunk))
                    + fmt_chunk
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                outs.append(b"RIFF" + struct.pack("<I", len(body)) + body)
                ns.append(n_dst)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "target_rate": target_rate,
                    "resampled": outs,
                    "n_samples_out": ns,
                    "decoder": decoders,
                }
            )

    return media.mapInPandas(batches, schema=RESAMPLE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("target_w", IntegerType(), False),
        StructField("target_h", IntegerType(), False),
        StructField("thumb", BinaryType(), True),
        StructField("thumb_size", IntegerType(), True),
        StructField("decoder", StringType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("frame_size", IntegerType(), True),
    ]
)


def _resize_nn(arr, width: int, height: int):
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width):
    output pixel (ty, tx) takes source pixel (floor((ty+0.5)·sh/th),
    floor((tx+0.5)·sw/tw)) — the standard pixel-center mapping, so the
    result is a pure closed-form function of the source (the analytic
    round-trip test derives it independently)."""
    import numpy as np

    sh, sw, _ = arr.shape
    ys = ((np.arange(height) + 0.5) * sh / height).astype(np.int64)
    xs = ((np.arange(width) + 0.5) * sw / width).astype(np.int64)
    ys = np.clip(ys, 0, sh - 1)
    xs = np.clip(xs, 0, sw - 1)
    return arr[ys][:, xs]


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Thumbnail/resize over the media table (1 row in → 1 row out,
    Arrow-batched, partition-parallel, no shuffle).

    REAL for PPM, PNG, GIF, and JPEG: decode (``_IMAGE_DECODERS``),
    nearest-neighbor resample to (width, height) (``_resize_nn``),
    re-encode in the source format (binary P6 / filter-0 PNG / LZW GIF /
    baseline JPEG) — decoder tag '<fmt>-numpy-nn'.  Malformed payloads
    → NULL thumb.  Other formats keep the deterministic byte-truncate
    stand-in (tag 'stub-truncate') so batch shapes, schema, and null
    handling stay exercised for every format."""
    budget = max(64, (width * height) // 64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs, decoders = [], []
            for fmt, p in zip(pdf["format"], pdf["payload"]):
                if fmt in _IMAGE_DECODERS:
                    arr = _IMAGE_DECODERS[fmt](p)
                    if arr is None:
                        thumbs.append(None)
                    elif fmt == "png":
                        thumbs.append(_encode_png(_resize_nn(arr, width, height)))
                    elif fmt == "gif":
                        thumbs.append(_encode_gif(_resize_nn(arr, width, height)))
                    elif fmt == "jpeg":
                        thumbs.append(_encode_jpeg(_resize_nn(arr, width, height)))
                    else:
                        small = _resize_nn(arr, width, height)
                        thumbs.append(
                            f"P6\n{width} {height}\n255\n".encode("ascii")
                            + small.tobytes()
                        )
                    decoders.append(f"{fmt}-numpy-nn")
                else:
                    thumbs.append(bytes(p[:budget]) if p is not None else None)
                    decoders.append("stub-truncate")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "target_w": width,
                    "target_h": height,
                    "thumb": thumbs,
                    "thumb_size": [
                        len(t) if t is not None else None for t in thumbs
                    ],
                    "decoder": decoders,
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def _split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 'video' payload on REAL frame boundaries by
    parsing each header (width × height × 3 data bytes per frame).  Stops
    at the first malformed or truncated frame."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        hdr = _ppm_header(payload, pos)
        if hdr is None:
            break
        w, h, data_off = hdr
        end = data_off + w * h * 3
        if end > len(payload):
            break
        frames.append(bytes(payload[pos:end]))
        pos = end
    return frames


def sample_frames(
    media: DataFrame, frame_bytes: int = 32, every_n: int = 2
) -> DataFrame:
    """Frame sampling (1 row in → N rows out — the UDTF-shaped multimodal
    op): demux each payload into frames and keep every ``every_n``-th.

    REAL demux for PPM, GIF, and MJPEG: a PPM video payload is
    back-to-back binary-P6 frames split on parsed headers; a GIF payload
    demuxes its image blocks (real animation container) into standalone
    single-frame GIFs; a JPEG payload is treated as an MJPEG stream —
    back-to-back baseline JPEGs split on REAL frame boundaries (a full
    segment walk per frame, then an entropy-data scan to the EOI, so a
    0xFFD9 inside a table segment can't fake a boundary) — and every
    emitted frame decodes individually (``_decode_ppm`` /
    ``_decode_gif`` / ``_decode_jpeg``).  MP4 payloads get a REAL ISO
    BMFF demux (``_split_mp4_samples``: box walk to the stbl sample
    tables, samples sliced at the stsz/stco/stsc-described offsets —
    JPEG-in-MP4 frames then decode individually).  MKV/WebM payloads
    get the REAL EBML demux since r8 (``_split_mkv_frames``: header
    gate, Segment/Cluster walk, SimpleBlock extraction).  Other formats
    keep the fixed-``frame_bytes`` chunk stand-in, preserving the
    row-explosion shape, Arrow batching, and per-frame indexing.  Rows
    with NULL payloads produce no frames (same as undecodable media)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_payload": [],
                "frame_size": [],
            }
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                if payload is None:
                    continue
                if fmt == "ppm":
                    chunks = _split_ppm_frames(payload)
                elif fmt == "gif":
                    chunks = _split_gif_frames(payload)
                elif fmt == "jpeg":
                    chunks = _split_jpeg_frames(payload)
                elif fmt == "mp4":
                    chunks = _split_mp4_samples(payload)
                elif fmt == "mkv":
                    chunks = _split_mkv_frames(payload)
                else:
                    n_frames = len(payload) // frame_bytes
                    chunks = [
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                        for i in range(n_frames)
                    ]
                for i in range(0, len(chunks), every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(chunks[i])
                    out["frame_size"].append(len(chunks[i]))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


# ── GIF: real LZW codec (stdlib-free) ────────────────────────────────


def _lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF-flavor LZW compress of palette indices: variable-width codes
    LSB-first, clear/end codes, dictionary reset at 4096 — a real
    compressor (string-table LZW), not the emit-literals shortcut, so
    round-trips exercise the decoder's dictionary growth for real."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {(i,): i for i in range(clear)}
    next_code, width = end + 1, min_code_size + 1
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for px in indices:
        cand = seq + (int(px),)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code, width = end + 1, min_code_size + 1
        seq = (int(px),)
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int):
    """GIF LZW decompress → list of palette indices, or None on a corrupt
    stream (bad code, missing clear semantics).  Handles variable code
    widths, clear-code table resets, and the KwKwK case (code ==
    next_free)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    acc = n_bits = pos = 0
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None
    out: list[int] = []
    while True:
        while n_bits < width:
            if pos >= len(data):
                return None  # ran out before the end code
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table) or not table[code]:
                return None
            entry = table[code]
        elif code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # KwKwK
        else:
            return None
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _encode_gif(frames) -> bytes:
    """Encode one or more (h, w, 3) uint8 arrays as a real GIF87a-style
    payload (one image block per frame, all full-logical-screen): ordered
    row-major-unique global palette, real LZW pixel data in 255-byte
    sub-blocks.  All frames must share dimensions and draw from one
    ≤256-color palette."""
    import numpy as np

    if not isinstance(frames, list):
        frames = [frames]
    h, w, _ = frames[0].shape
    colors: list[tuple[int, int, int]] = []
    seen: dict[tuple[int, int, int], int] = {}
    for fr in frames:
        for rgb in fr.reshape(-1, 3):
            key = (int(rgb[0]), int(rgb[1]), int(rgb[2]))
            if key not in seen:
                seen[key] = len(colors)
                colors.append(key)
    if len(colors) > 256:
        raise ValueError("GIF fixture encoder: > 256 distinct colors")
    depth = max(1, (len(colors) - 1).bit_length())  # palette size 2^depth
    palette = colors + [(0, 0, 0)] * ((1 << depth) - len(colors))
    out = bytearray(b"GIF87a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (depth - 1))  # global color table flag + size
    out += b"\x00\x00"  # background index, aspect
    for r, g, b in palette:
        out += bytes((r, g, b))
    mcs = max(2, depth)
    for fr in frames:
        idx = [seen[(int(p[0]), int(p[1]), int(p[2]))] for p in fr.reshape(-1, 3)]
        out += b"\x2c" + b"\x00\x00\x00\x00"  # image block at (0, 0)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0)  # no local color table, not interlaced
        out.append(mcs)
        lzw = _lzw_compress(np.asarray(idx, dtype=np.int64), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _gif_frames_raw(payload: bytes):
    """Parse a GIF payload → (w, h, palette, [frame index lists]) or None.
    Walks the block stream: global color table, extension blocks
    (skipped), image blocks (full-logical-screen, non-interlaced, global
    palette only — the shapes the fixture encoder produces; anything
    else refuses cleanly)."""
    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    if len(payload) < 13:
        return None
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    if not flags & 0x80:
        return None  # no global color table
    depth = (flags & 0x07) + 1
    pos = 13
    ncol = 1 << depth
    if len(payload) < pos + 3 * ncol:
        return None
    palette = [tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(ncol)]
    pos += 3 * ncol
    frames = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            return None
        if len(payload) < pos + 9:
            return None
        left = int.from_bytes(payload[pos : pos + 2], "little")
        top = int.from_bytes(payload[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        if (left, top) != (0, 0) or (fw, fh) != (w, h) or iflags & 0xC0:
            return None  # partial frames / local palette / interlace
        if pos >= len(payload):
            return None
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            data += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1  # sub-block terminator
        idx = _lzw_decompress(bytes(data), mcs)
        if idx is None or len(idx) != w * h or max(idx) >= ncol:
            return None
        frames.append(idx)
    if not frames:
        return None
    return w, h, palette, frames


def _decode_gif(payload: bytes):
    """REAL GIF decode of the FIRST frame into an (h, w, 3) uint8 array,
    or None for malformed payloads — LZW decompression (variable-width
    codes, clear codes, KwKwK), palette lookup, no external libraries."""
    import numpy as np

    parsed = _gif_frames_raw(payload)
    if parsed is None:
        return None
    w, h, palette, frames = parsed
    pal = np.asarray(palette, dtype=np.uint8)
    return pal[np.asarray(frames[0], dtype=np.int64)].reshape(h, w, 3)


def synth_gif(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic GIF payload per id — same closed-form
    pixels as ``synth_ppm``/``synth_png`` (w = 4 + id%5, h = 3 + id%4,
    row y a constant color), so the analytic oracle math is shared while
    the REAL LZW decompression sits under the hash gate."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                ys = np.arange(h, dtype=np.int64)
                rows = np.stack(
                    [(i + ys) % 256, (2 * i + 3 * ys) % 256, (5 * i + 7 * ys) % 256],
                    axis=1,
                ).astype(np.uint8)
                pixels = np.repeat(rows[:, None, :], w, axis=1)
                payloads.append(_encode_gif(pixels))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "gif",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


def _split_gif_frames(payload: bytes) -> list[bytes]:
    """Demux a (possibly animated) GIF into STANDALONE single-frame GIF
    payloads — a real container demux on parsed image blocks: each
    emitted frame re-encodes with its own palette and decodes
    individually via ``_decode_gif``.  Malformed payloads yield no
    frames."""
    import numpy as np

    parsed = _gif_frames_raw(payload)
    if parsed is None:
        return []
    w, h, palette, frames = parsed
    pal = np.asarray(palette, dtype=np.uint8)
    return [
        _encode_gif(pal[np.asarray(f, dtype=np.int64)].reshape(h, w, 3))
        for f in frames
    ]


_IMAGE_DECODERS["gif"] = _decode_gif


# ── JPEG: real baseline-sequential codec (stdlib+numpy, from scratch) ─
#
# Re-expresses the reference's image-decode surface for JPEG without
# imaging libraries: a complete baseline encoder (RGB→YCbCr 4:4:4,
# pinned-order 8×8 DCT, Annex-K quantization, DPCM/run-length entropy
# coding, canonical Huffman, byte stuffing) and the matching general
# decoder (segment walk, DHT/DQT parse, Huffman+RLE entropy decode,
# dequant, dezigzag, pinned-order IDCT, YCbCr→RGB).
#
# Both DCT directions use explicit left-fold accumulation (8 vectorized
# outer-product adds, never BLAS matmul) so every float is a pinned
# operation sequence: the synthetic fixture's constant 8×8 blocks then
# decode to values the DuckDB oracle derives with the *same* op chain,
# putting the whole codec under the bit-exact hash gate exactly like
# PNG/GIF/WAV.

_JPEG_QLUM = [
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
]
_JPEG_QCHROM = [
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
]


def _jpeg_zigzag() -> list[tuple[int, int]]:
    """The standard 64-entry zigzag scan as (row, col) pairs, generated
    from the diagonal rule (even diagonals run bottom-left→top-right)."""
    order: list[tuple[int, int]] = []
    for d in range(15):
        diag = [(i, d - i) for i in range(8) if 0 <= d - i < 8]
        order.extend(reversed(diag) if d % 2 == 0 else diag)
    return order


_ZIGZAG = _jpeg_zigzag()


def _dct_basis():
    """Orthonormal 8-point DCT-II basis B[u, x] = C(u)/2 ·
    cos((2x+1)uπ/16), C(0)=1/√2 — forward S = B·x·Bᵀ, inverse x = Bᵀ·S·B."""
    import math

    import numpy as np

    B = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            B[u, x] = (0.5 * cu) * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return B


# B[0, x] for every x: the DC basis value the oracle twin interpolates
def jpeg_dc_basis() -> float:
    import math

    return 0.5 * (1.0 / math.sqrt(2.0))


def _dct2_pinned(block, B):
    """Forward 2-D DCT with PINNED accumulation order: two stages of 8
    outer-product adds (left fold over the summed index), never BLAS —
    so the float result is a deterministic op sequence both engines can
    replicate.  T[x,v] = Σ_y block[x,y]·B[v,y]; S[u,v] = Σ_x B[u,x]·T[x,v]."""
    import numpy as np

    T = np.zeros((8, 8), dtype=np.float64)
    for y in range(8):
        T = T + np.outer(block[:, y], B[:, y])
    S = np.zeros((8, 8), dtype=np.float64)
    for x in range(8):
        S = S + np.outer(B[:, x], T[x, :])
    return S


def _idct2_pinned(coef, B):
    """Inverse 2-D DCT, same pinned fold shape: M[x,v] = Σ_u B[u,x]·
    coef[u,v]; out[x,y] = Σ_v M[x,v]·B[v,y]."""
    import numpy as np

    M = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        M = M + np.outer(B[u, :], coef[u, :])
    out = np.zeros((8, 8), dtype=np.float64)
    for v in range(8):
        out = out + np.outer(M[:, v], B[v, :])
    return out


def _jpeg_huff_specs():
    """Custom canonical Huffman specs (bits, symbols) — valid baseline
    tables carried in the DHT segment, so encoder and decoder share them
    through the FILE, not through code: DC = all 12 categories at 4 bits
    (all-ones code unused), AC = all 162 run/size symbols at 8 bits."""
    dc_syms = list(range(12))
    dc_bits = [0] * 16
    dc_bits[3] = 12  # 12 codes of length 4
    ac_syms = sorted([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)  # 162 codes of length 8
    return (dc_bits, dc_syms), (ac_bits, ac_syms)


def _huff_codes(bits, symbols):
    """Canonical JPEG code assignment: symbol -> (code, length)."""
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[symbols[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit packer with JPEG byte stuffing (0xFF → 0xFF 0x00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per T.81


class _BitReader:
    """MSB-first bit reader over entropy-coded data with un-stuffing;
    stops at any marker (0xFF followed by non-zero)."""

    def __init__(self, payload: bytes, pos: int) -> None:
        self.p = payload
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.done = False

    def bit(self):
        if self._n == 0:
            if self.pos >= len(self.p):
                self.done = True
                return None
            b = self.p[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.p):
                    self.done = True
                    return None
                nxt = self.p[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:  # a marker: entropy data ends here
                    self.done = True
                    self.pos -= 1
                    return None
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int):
        v = 0
        for _ in range(n):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category s, s-bit payload)."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return (s, v) if v > 0 else (s, v + (1 << s) - 1)


def _extend(v: int, s: int) -> int:
    """Inverse of _magnitude: s-bit payload -> signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _encode_jpeg(arr, qlum=None, qchrom=None) -> bytes:
    """Baseline-sequential JFIF encoder for an (h, w, 3) uint8 RGB array:
    4:4:4 (no subsampling), Annex-K quantization by default, custom
    canonical Huffman tables written to DHT, pinned-order DCT.  Edge
    rows/cols replicate to fill partial MCUs."""
    import numpy as np

    qlum = np.asarray(qlum if qlum is not None else _JPEG_QLUM, dtype=np.int64)
    qchrom = np.asarray(
        qchrom if qchrom is not None else _JPEG_QCHROM, dtype=np.int64
    )
    B = _dct_basis()
    h, w, _ = arr.shape
    rf = arr[:, :, 0].astype(np.float64)
    gf = arr[:, :, 1].astype(np.float64)
    bf = arr[:, :, 2].astype(np.float64)
    yf = 0.299 * rf + 0.587 * gf + 0.114 * bf
    cbf = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
    crf = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
    planes = [
        np.clip(np.floor(c + 0.5), 0, 255).astype(np.int64)
        for c in (yf, cbf, crf)
    ]
    mcx, mcy = (w + 7) // 8, (h + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((mcy * 8, mcx * 8), dtype=np.int64)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # edge-replicate partial MCUs
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    (dc_bits, dc_syms), (ac_bits, ac_syms) = _jpeg_huff_specs()
    dc_code = _huff_codes(dc_bits, dc_syms)
    ac_code = _huff_codes(ac_bits, ac_syms)
    zz = _ZIGZAG
    qtabs = [qlum, qchrom, qchrom]
    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    for my in range(mcy):
        for mx in range(mcx):
            for ci in range(3):
                block = padded[ci][
                    my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8
                ].astype(np.float64) - 128.0
                S = _dct2_pinned(block, B)
                q = np.floor(S / qtabs[ci] + 0.5).astype(np.int64)
                dc = int(q[0, 0])
                s, payload = _magnitude(dc - prev_dc[ci])
                prev_dc[ci] = dc
                code, ln = dc_code[s]
                writer.put(code, ln)
                if s:
                    writer.put(payload, s)
                seq = [int(q[u, v]) for (u, v) in zz[1:]]
                run = 0
                for coef in seq:
                    if coef == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_code[0xF0]  # ZRL: 16 zeros
                        writer.put(code, ln)
                        run -= 16
                    s, payload = _magnitude(coef)
                    code, ln = ac_code[(run << 4) | s]
                    writer.put(code, ln)
                    writer.put(payload, s)
                    run = 0
                if run:
                    code, ln = ac_code[0x00]  # EOB
                    writer.put(code, ln)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def zz_bytes(q) -> bytes:
        return bytes(int(q[u, v]) for (u, v) in zz)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_bytes(qlum) + b"\x01" + zz_bytes(qchrom))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, qid])
    out += seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms)
    dht += bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms)
    out += seg(0xC4, dht)
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _decode_jpeg(payload: bytes):
    """General baseline-sequential JPEG decoder → (h, w, 3) uint8 RGB, or
    None for malformed/unsupported payloads (progressive SOF2, subsampled
    components, restart intervals, arithmetic coding are all rejected as
    None, never mis-decoded).  Tables come from the file's own DQT/DHT
    segments; the entropy decode handles DC DPCM, AC run/size with ZRL
    and EOB, byte un-stuffing, and sign extension.  IDCT is the pinned
    left-fold (see ``_idct2_pinned``) so decoded pixels are a
    deterministic float-op sequence."""
    import numpy as np

    if payload is None or payload[:2] != b"\xff\xd8":
        return None
    B = _dct_basis()
    qtabs: dict[int, object] = {}
    hufftabs: dict[tuple[int, int], dict] = {}
    sof = None
    scan = None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT: one or more tables
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                if pq != 0 or bp + 65 > len(body):
                    return None  # 16-bit tables unsupported
                tab = np.zeros((8, 8), dtype=np.int64)
                for k, (u, v) in enumerate(_ZIGZAG):
                    tab[u, v] = body[bp + 1 + k]
                qtabs[tq] = tab
                bp += 65
        elif marker == 0xC4:  # DHT: one or more tables
            bp = 0
            while bp + 17 <= len(body):
                tc, th = body[bp] >> 4, body[bp] & 15
                bits = list(body[bp + 1 : bp + 17])
                nsym = sum(bits)
                syms = list(body[bp + 17 : bp + 17 + nsym])
                if len(syms) != nsym:
                    return None
                code_of = _huff_codes(bits, syms)
                # decode map: (length, code) -> symbol
                hufftabs[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in code_of.items()
                }
                bp += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:  # a corrupted length can shrink the body
                return None
            prec, hh, ww, nc = body[0], int.from_bytes(body[1:3], "big"), int.from_bytes(body[3:5], "big"), body[5]
            if prec != 8 or nc not in (1, 3) or len(body) < 6 + 3 * nc:
                return None
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    return None  # subsampling unsupported → honest None
                comps.append((cid, tq))
            sof = (hh, ww, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:
            return None  # restart intervals unsupported
        elif marker == 0xDA:  # SOS
            if sof is None or len(body) < 1:
                return None
            ns = body[0]
            if ns != len(sof[2]) or len(body) < 1 + 2 * ns + 3:
                return None
            scomps = []
            for c in range(ns):
                cs, tds = body[1 + 2 * c], body[2 + 2 * c]
                scomps.append((cs, tds >> 4, tds & 15))
            scan = (scomps, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if sof is None or scan is None:
        return None
    hh, ww, comps = sof
    scomps, data_pos = scan
    by_cid = {cid: tq for cid, tq in comps}
    order = []
    for cs, td, ta in scomps:
        if cs not in by_cid or (0, td) not in hufftabs or (1, ta) not in hufftabs:
            return None
        if by_cid[cs] not in qtabs:
            return None
        order.append((cs, qtabs[by_cid[cs]], hufftabs[(0, td)], hufftabs[(1, ta)]))

    def huff_read(reader, table):
        code, ln = 0, 0
        while ln < 16:
            b = reader.bit()
            if b is None:
                return None
            code = (code << 1) | b
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        return None

    mcx, mcy = (ww + 7) // 8, (hh + 7) // 8
    reader = _BitReader(payload, data_pos)
    planes = [
        np.zeros((mcy * 8, mcx * 8), dtype=np.int64) for _ in order
    ]
    prev_dc = [0] * len(order)
    zz = _ZIGZAG
    for my in range(mcy):
        for mx in range(mcx):
            for ci, (_, qtab, dct, act) in enumerate(order):
                coefs = np.zeros(64, dtype=np.int64)
                s = huff_read(reader, dct)
                if s is None or s > 11:
                    return None
                diff_bits = reader.bits(s) if s else 0
                if diff_bits is None:
                    return None
                prev_dc[ci] += _extend(diff_bits, s)
                coefs[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = huff_read(reader, act)
                    if rs is None:
                        return None
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = rs >> 4, rs & 15
                    k += run
                    if k > 63 or size == 0:
                        return None
                    vb = reader.bits(size)
                    if vb is None:
                        return None
                    coefs[k] = _extend(vb, size)
                    k += 1
                coef = np.zeros((8, 8), dtype=np.float64)
                for k2, (u, v) in enumerate(zz):
                    coef[u, v] = float(coefs[k2] * qtab[u, v])
                out = _idct2_pinned(coef, B)
                planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.clip(
                    np.floor(out + 128.5), 0, 255
                ).astype(np.int64)
    if len(planes) == 1:
        yp = planes[0][:hh, :ww]
        return np.stack([yp, yp, yp], axis=2).astype(np.uint8)
    yp = planes[0][:hh, :ww].astype(np.float64)
    cbp = planes[1][:hh, :ww].astype(np.float64)
    crp = planes[2][:hh, :ww].astype(np.float64)
    r = np.clip(np.floor((yp + 1.402 * (crp - 128.0)) + 0.5), 0, 255)
    g = np.clip(
        np.floor(
            ((yp - 0.344136 * (cbp - 128.0)) - 0.714136 * (crp - 128.0)) + 0.5
        ),
        0,
        255,
    )
    b = np.clip(np.floor((yp + 1.772 * (cbp - 128.0)) + 0.5), 0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synth_jpeg(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic baseline JPEG payload per id (Arrow-batched
    ``mapInPandas``) — the JPEG-ingest fixture generator.

    w = 8·(1 + id%3), h = 8·(1 + id%2), and every 8×8 block (bx, by) is a
    CONSTANT color (id + 5bx + 11by, 2id + 7bx + 3by, 5id + bx + 13by)
    mod 256.  Constant blocks quantize to a DC-only spectrum, so the
    whole lossy round trip — RGB→YCbCr rounding, the pinned-fold DCT,
    Annex-K DC quantization, DPCM/Huffman/byte-stuffing, dequant, the
    pinned-fold IDCT, clamp, YCbCr→RGB — is an analytically derivable
    float-op chain the DuckDB oracle replicates term for term
    (multi-block images additionally exercise the DC DPCM chain across
    blocks).  The AC run-length machinery is pytest-covered on
    non-constant images, where the twin can't follow the full DCT."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                nbx, nby = 1 + i % 3, 1 + i % 2
                w, h = 8 * nbx, 8 * nby
                arr = np.empty((h, w, 3), dtype=np.uint8)
                for by in range(nby):
                    for bx in range(nbx):
                        arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            (i + 5 * bx + 11 * by) % 256,
                            (2 * i + 7 * bx + 3 * by) % 256,
                            (5 * i + bx + 13 * by) % 256,
                        )
                payloads.append(_encode_jpeg(arr))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "jpeg",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


_IMAGE_DECODERS["jpeg"] = _decode_jpeg


def _jpeg_frame_end(p: bytes, start: int):
    """End offset (exclusive) of the baseline JPEG starting at ``start``,
    found by a REAL parse: walk the length-prefixed segments to SOS, then
    scan the entropy-coded data (skipping stuffed 0xFF00 and RST markers)
    to the EOI.  A 0xFFD9 byte pair inside a segment payload therefore
    cannot fake a frame boundary.  None for malformed frames."""
    n = len(p)
    if p[start : start + 2] != b"\xff\xd8":
        return None
    pos = start + 2
    while pos + 4 <= n:
        if p[pos] != 0xFF:
            return None
        marker = p[pos + 1]
        if marker == 0xD9:  # EOI with no scan: terminated, if degenerate
            return pos + 2
        seglen = int.from_bytes(p[pos + 2 : pos + 4], "big")
        if pos + 2 + seglen > n:
            return None
        if marker == 0xDA:  # SOS: entropy data follows
            pos = pos + 2 + seglen
            while pos + 1 < n:
                if p[pos] == 0xFF:
                    nxt = p[pos + 1]
                    if nxt == 0xD9:
                        return pos + 2
                    if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                        return None  # unexpected marker mid-scan
                    pos += 2
                else:
                    pos += 1
            return None  # ran out before EOI
        pos += 2 + seglen
    return None


def _split_jpeg_frames(payload: bytes) -> list[bytes]:
    """Demux an MJPEG-style payload (back-to-back baseline JPEGs) into
    standalone frames on REAL parsed boundaries; each frame decodes
    individually via ``_decode_jpeg``.  Stops at the first malformed or
    truncated frame."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        end = _jpeg_frame_end(payload, pos)
        if end is None:
            break
        frames.append(bytes(payload[pos:end]))
        pos = end
    return frames


# ── MP3 (MPEG-1 Layer III): real frame-header walk ───────────────────
#
# Full MP3 DECODE (Huffman spectral data, IMDCT, alias reduction) stays
# out of scope for a stdlib container; the FRAMING layer is fully
# parseable though, and it is what ingest pipelines actually need for
# audits: frame count, sample rate, exact sample count, CBR/VBR, tag
# presence.  The walk below is a real parser — ID3v2 syncsafe-size skip,
# 11-bit sync, version/layer gate, bitrate/samplerate table lookup,
# padding-aware frame length — not a byte-count heuristic.

_MP3_BITRATES = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]  # kbps, MPEG-1 Layer III (index 0 = "free", unsupported; 15 = bad)
_MP3_RATES = [44100, 48000, 32000]  # MPEG-1 samplerate index 0..2
_MP3_SAMPLES_PER_FRAME = 1152


def _mp3_frames(payload):
    """Walk an MPEG-1 Layer III stream: optional ID3v2 tag (syncsafe
    size), then consecutive frames sized from each header's
    bitrate/samplerate/padding bits.  Returns (buf, [(pos, flen)], sr,
    bitrates, has_id3) over the intact frame prefix, or None for a
    NULL payload — the shared walk behind ``_probe_mp3`` and the
    side-info parser."""
    if payload is None:
        return None
    buf = bytes(payload)
    pos = 0
    has_id3 = False
    if buf[:3] == b"ID3" and len(buf) >= 10:
        size = (
            ((buf[6] & 0x7F) << 21)
            | ((buf[7] & 0x7F) << 14)
            | ((buf[8] & 0x7F) << 7)
            | (buf[9] & 0x7F)
        )
        pos = 10 + size
        has_id3 = True
    frames: list[tuple[int, int]] = []
    sr = None
    bitrates: set[int] = set()
    while pos + 4 <= len(buf):
        h = buf[pos : pos + 4]
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            break  # lost sync
        version = (h[1] >> 3) & 3
        layer = (h[1] >> 1) & 3
        if version != 3 or layer != 1:
            break  # only MPEG-1 (11) Layer III (01)
        bri = (h[2] >> 4) & 0xF
        sri = (h[2] >> 2) & 3
        pad = (h[2] >> 1) & 1
        if bri in (0, 15) or sri == 3:
            break  # free-format / invalid indices
        br = _MP3_BITRATES[bri] * 1000
        rate = _MP3_RATES[sri]
        if sr is None:
            sr = rate
        elif sr != rate:
            break  # mixed sample rates: stop at the consistent prefix
        flen = (144 * br) // rate + pad
        if pos + flen > len(buf):
            break  # truncated final frame
        frames.append((pos, flen))
        bitrates.add(br)
        pos += flen
    return buf, frames, sr, bitrates, has_id3


def _probe_mp3(payload):
    """(n_frames, samplerate, n_samples, total_frame_bytes, is_vbr,
    has_id3) over the intact frame prefix, or None when no complete
    frame parses (malformed, free-bitrate, non-MPEG1-LayerIII, or
    mixed-samplerate streams)."""
    walked = _mp3_frames(payload)
    if walked is None:
        return None
    _, frames, sr, bitrates, has_id3 = walked
    if not frames:
        return None
    return (
        len(frames),
        sr,
        len(frames) * _MP3_SAMPLES_PER_FRAME,
        sum(fl for _, fl in frames),
        len(bitrates) > 1,
        has_id3,
    )


def _mp3_sideinfo_fields(buf, pos: int, flen: int):
    """FIXED-OFFSET side-info bitfields of one MPEG-1 Layer III frame
    without CRC in (joint-)stereo mode: main_data_begin (9 bits — the
    bit-reservoir back-pointer), the 8 scfsi bits, and granule-0
    channel-0's part2_3_length (12) / big_values (9) / global_gain (8)
    — everything up to the first variable-position field, parsed from
    the REAL bytes.  The remaining side info and the entropy payload
    (Huffman spectral data) stay out of scope, documented.  Returns
    None for CRC-protected or mono frames (both shift the offsets) or
    a frame too short to hold the 7 bytes read."""
    h = buf[pos : pos + 4]
    if len(h) < 4 or (h[1] & 1) == 0:
        return None  # protection bit 0 → a 2-byte CRC shifts side info
    if ((h[3] >> 6) & 3) == 3:
        return None  # mono: 17-byte side info with different offsets
    si = buf[pos + 4 : pos + 11]
    if len(si) < 7 or flen < 11:
        return None
    bits = int.from_bytes(si, "big")  # 56 bits

    def field(off: int, n: int) -> int:
        return (bits >> (56 - off - n)) & ((1 << n) - 1)

    return (
        field(0, 9),  # main_data_begin
        field(12, 8),  # scfsi, both channels
        field(20, 12),  # gr0 ch0 part2_3_length
        field(32, 9),  # gr0 ch0 big_values
        field(41, 8),  # gr0 ch0 global_gain
    )


MP3_SIDEINFO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("main_data_begin", LongType(), True),
        StructField("scfsi", LongType(), True),
        StructField("part2_3_length", LongType(), True),
        StructField("big_values", LongType(), True),
        StructField("global_gain", LongType(), True),
    ]
)


def probe_mp3_sideinfo(media: DataFrame) -> DataFrame:
    """REAL MPEG-1 Layer III SIDE-INFO bitfield parse per frame
    (Arrow-batched ``mapInPandas``, 1 row in → n_frames rows out):
    the fixed-offset fields every Layer III decoder reads before any
    entropy work — bit-reservoir back-pointer, scfsi, and granule-0
    channel-0's section lengths/gain — recovered from the actual
    frame bytes.  Extends ``probe_mp3``'s frame walk one layer deeper
    into the bitstream; the entropy decode itself remains the
    documented out-of-scope boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in MP3_SIDEINFO_SCHEMA}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                if fmt != "mp3":
                    raise NotImplementedError(
                        f"probe_mp3_sideinfo got format {fmt!r}"
                    )
                walked = _mp3_frames(payload)
                if walked is None:
                    continue
                buf, frames, _, _, _ = walked
                for idx, (pos, flen) in enumerate(frames):
                    parsed = _mp3_sideinfo_fields(buf, pos, flen)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    if parsed is None:
                        for key in (
                            "main_data_begin",
                            "scfsi",
                            "part2_3_length",
                            "big_values",
                            "global_gain",
                        ):
                            out[key].append(None)
                        continue
                    mdb, scfsi, p23, bv, gg = parsed
                    out["main_data_begin"].append(mdb)
                    out["scfsi"].append(scfsi)
                    out["part2_3_length"].append(p23)
                    out["big_values"].append(bv)
                    out["global_gain"].append(gg)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=MP3_SIDEINFO_SCHEMA)


MP3_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_frames", IntegerType(), True),
        StructField("samplerate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("total_frame_bytes", LongType(), True),
        StructField("is_vbr", BooleanType(), True),
        StructField("has_id3", BooleanType(), True),
    ]
)


def probe_mp3(media: DataFrame) -> DataFrame:
    """REAL MP3 framing metadata over the media table (``_probe_mp3``
    per row, Arrow-batched ``mapInPandas``, partition-parallel, no
    shuffle) — the audit pass an audio ingest pipeline runs before any
    decode: exact frame/sample counts, CBR/VBR, tag presence.
    Malformed payloads probe to NULLs; non-mp3 formats raise (the
    ``decode_audio`` contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in MP3_PROBE_SCHEMA}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                if fmt != "mp3":
                    raise NotImplementedError(
                        f"probe_mp3 got format {fmt!r}: MPEG framing "
                        "only (decode_audio handles RIFF/WAVE)"
                    )
                probed = _probe_mp3(payload)
                out["doc_id"].append(doc_id)
                if probed is None:
                    for key in (
                        "n_frames",
                        "samplerate",
                        "n_samples",
                        "total_frame_bytes",
                        "is_vbr",
                        "has_id3",
                    ):
                        out[key].append(None)
                    continue
                nf, sr, ns, tot, vbr, id3 = probed
                out["n_frames"].append(nf)
                out["samplerate"].append(sr)
                out["n_samples"].append(ns)
                out["total_frame_bytes"].append(tot)
                out["is_vbr"].append(vbr)
                out["has_id3"].append(id3)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=MP3_PROBE_SCHEMA)


def synth_mp3(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic MP3 framing stream per id — REAL headers
    (sync, MPEG-1 Layer III, table-valid bitrate/samplerate indices,
    padding bits) over deterministic filler audio bytes, so the frame
    WALK is fully exercised while the entropy payload stays opaque
    (decode is out of scope; the walk never reads it).

    Odd ids carry an ID3v2 tag of id%5 body bytes (syncsafe size).
    n = 3 + id%4 frames at 44.1 kHz; ids divisible by 3 are CBR
    (bitrate index 1 + id%14 every frame), others VBR (index
    1 + (id+f)%14 — distinct per frame); frame f pads when (id+f) is
    odd.  Every field the analytic DuckDB twin derives is therefore a
    pure function of the id — and the Spark side must recover it from
    the actual bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                parts = []
                if i % 2 == 1:
                    body = bytes((i + j) % 256 for j in range(i % 5))
                    parts.append(
                        b"ID3\x04\x00\x00"
                        + bytes([0, 0, 0, len(body) & 0x7F])
                        + body
                    )
                n = 3 + i % 4
                for f in range(n):
                    bri = 1 + (i % 14 if i % 3 == 0 else (i + f) % 14)
                    pad = (i + f) % 2
                    br = _MP3_BITRATES[bri] * 1000
                    flen = (144 * br) // 44100 + pad
                    hdr = bytes(
                        [0xFF, 0xFB, (bri << 4) | (0 << 2) | (pad << 1), 0]
                    )
                    fill = bytes(
                        (7 * i + 13 * f + j) % 256 for j in range(flen - 4)
                    )
                    parts.append(hdr + fill)
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "audio",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "mp3",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


# ── MP3 Layer III big_values entropy decode (r9) ─────────────────────
#
# Closes the declared "no entropy decode" boundary one honest step: a
# REAL gr0-ch0 big_values Huffman decode — full stereo side-info parse
# (including the variable-position fields the fixed-offset prober
# skips), ISO slen-table scalefactor bit accounting, an MSB-first bit
# reader across byte boundaries, canonical prefix-code walking, ESC
# linbits escapes and sign bits — over frames whose coded payload
# ``synth_mp3_coded`` writes with the same codebooks.
#
# Codebook honesty: Huffman TABLE 1 carries the ISO 11172-3 Table B.7
# data (x,y ∈ {0,1}: hlen/hcod = 1/1, 3/1, 2/1, 3/0), the ESC linbits
# schedule is ISO's (tables 16-23 → 1,2,3,4,6,8,10,13), and the count1
# region decodes with the REAL ISO Table B quadruple code
# (count1table_select=1: every vwxy quadruple in 4 bits as its one's
# complement — fully specified, no listing needed).  Two declared
# stand-ins/boundaries remain, stated here rather than papered over:
# the 16×16 ESC code VALUES are a uniform 8-bit canonical code (the
# full B.7 listing is not reproducible in this container), so
# real-world ESC frames would not decode; and count1 Table A
# (select=0) frames with a non-empty count1 region scope-gate to null
# (Table A's exact code assignment is likewise not safely
# reproducible — a guessed table shared by this module's encoder AND
# decoder would pass every round-trip gate while being wrong, the one
# failure mode the bit-exact gates cannot catch).

_MP3_HUFF_TABLE1 = {
    (0, 0): (1, 0b1),
    (0, 1): (3, 0b001),
    (1, 0): (2, 0b01),
    (1, 1): (3, 0b000),
}
# stand-in ESC codebook: every (x, y) pair in 0..15 coded as the 8-bit
# value x·16+y — a complete canonical prefix code (256 × 2^-8 = 1)
_MP3_ESC_MAX = 15
_MP3_LINBITS = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13}
# ISO slen tables for scalefac_compress 0..15 (long blocks: slen1 over
# sfb 0-10, slen2 over sfb 11-20)
_MP3_SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
_MP3_SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]


def _mp3_huff_codes(table: int):
    """(codebook dict (x, y) → (hlen, hcod), linbits) for a supported
    table_select value; None for unsupported tables."""
    if table == 1:
        return _MP3_HUFF_TABLE1, 0
    if table in _MP3_LINBITS:
        book = {
            (x, y): (8, (x << 4) | y)
            for x in range(16)
            for y in range(16)
        }
        return book, _MP3_LINBITS[table]
    return None


class _Mp3BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def tell(self) -> int:
        return len(self.bits)

    def tobytes(self) -> bytes:
        out = bytearray()
        acc, n = 0, 0
        for b in self.bits:
            acc = (acc << 1) | b
            n += 1
            if n == 8:
                out.append(acc)
                acc, n = 0, 0
        if n:
            out.append(acc << (8 - n))
        return bytes(out)


class _Mp3BitReader:
    def __init__(self, buf: bytes, bitpos: int = 0) -> None:
        self.buf = buf
        self.pos = bitpos

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.buf[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def _mp3_gr0ch0_sideinfo(buf: bytes, pos: int):
    """FULL gr0-ch0 side info of a stereo no-CRC frame, including the
    variable-position fields ``_mp3_sideinfo_fields`` stops before:
    (main_data_begin, part2_3_length, big_values, scalefac_compress,
    window_switching, table_selects, region0/1_count).  None when the
    frame is CRC-protected or mono (offset-shifting layouts)."""
    h = buf[pos : pos + 4]
    if len(h) < 4 or (h[1] & 1) == 0 or ((h[3] >> 6) & 3) == 3:
        return None
    si = buf[pos + 4 : pos + 36]
    if len(si) < 32:
        return None
    r = _Mp3BitReader(si)
    mdb = r.get(9)
    r.get(3)  # private_bits (stereo)
    r.get(8)  # scfsi
    p23 = r.get(12)
    bv = r.get(9)
    r.get(8)  # global_gain
    scomp = r.get(4)
    wsf = r.get(1)
    if wsf != 0:
        return None  # short/mixed blocks: different field layout
    tsel = (r.get(5), r.get(5), r.get(5))
    reg0 = r.get(4)
    reg1 = r.get(3)
    r.get(1)  # preflag
    r.get(1)  # scalefac_scale
    c1sel = r.get(1)  # count1table_select: 0 = table A, 1 = table B
    return mdb, p23, bv, scomp, tsel, reg0, reg1, c1sel


MP3_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("huff_table", IntegerType(), True),
        StructField("n_values", IntegerType(), True),
        StructField("sum_values", LongType(), True),
        StructField("sum_abs", LongType(), True),
        StructField("max_abs", LongType(), True),
        StructField("n_escapes", IntegerType(), True),
        StructField("bits_read", IntegerType(), True),
        StructField("n_count1", IntegerType(), True),
        StructField("sum_count1", LongType(), True),
    ]
)


def decode_mp3_bigvalues(media: DataFrame) -> DataFrame:
    """REAL MPEG-1 Layer III gr0-ch0 BIG_VALUES entropy decode
    (Arrow-batched ``mapInPandas``, 1 row in → n_frames rows out): walk
    the frames, parse the FULL stereo side info, skip the scalefactor
    bits the ISO slen tables dictate for scalefac_compress, then decode
    2·big_values spectral values from the actual main-data bits —
    canonical prefix walk, ESC linbits escapes, sign bits (1 → negate,
    written only for nonzero values) — and emit per-frame aggregates of
    the decoded values plus the exact bit count consumed.

    After big_values, the COUNT1 region decodes until part2_3_length is
    exhausted: quadruples of ±1/0 values under the real ISO Table B
    code (4-bit one's complement + sign bits), reported as
    (n_count1, sum_count1).

    Scope gates (null row, never a wrong value): CRC-protected / mono /
    short-block frames, nonzero main_data_begin (bit-reservoir
    assembly), mixed per-region table_select (region boundaries need
    the samplerate's scalefactor-band table), table_select values
    outside the supported codebooks, and count1 Table A regions (see
    the codebook-honesty note above)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in MP3_DECODE_SCHEMA}
            nulls = [f.name for f in MP3_DECODE_SCHEMA][2:]
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                if fmt != "mp3":
                    raise NotImplementedError(
                        f"decode_mp3_bigvalues got format {fmt!r}"
                    )
                walked = _mp3_frames(payload)
                if walked is None:
                    continue
                buf, frames, _, _, _ = walked
                for idx, (pos, flen) in enumerate(frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    row = _decode_one_bigvalues(buf, pos, flen)
                    if row is None:
                        for key in nulls:
                            out[key].append(None)
                        continue
                    for key, val in zip(nulls, row):
                        out[key].append(val)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=MP3_DECODE_SCHEMA)


def _decode_one_bigvalues(buf: bytes, pos: int, flen: int):
    si = _mp3_gr0ch0_sideinfo(buf, pos)
    if si is None:
        return None
    mdb, p23, bv, scomp, tsel, _reg0, _reg1, c1sel = si
    if mdb != 0:
        return None  # bit-reservoir assembly out of scope
    if not (tsel[0] == tsel[1] == tsel[2]):
        return None  # region-mixed selects need the sfb band table
    codes = _mp3_huff_codes(tsel[0])
    if codes is None:
        return None
    book, linbits = codes
    # invert to a prefix-walk map: (hlen, hcod) -> (x, y)
    dec = {v: k for k, v in book.items()}
    main = buf[pos + 36 : pos + flen]
    r = _Mp3BitReader(main)
    # part2: scalefactor bits (slen1 over sfb 0-10, slen2 over 11-20)
    r.get(11 * _MP3_SLEN1[scomp] + 10 * _MP3_SLEN2[scomp])
    sum_v = sum_a = max_a = 0
    n_esc = 0
    try:
        for _ in range(bv):
            code, length = 0, 0
            while True:
                code = (code << 1) | r.get(1)
                length += 1
                if (length, code) in dec:
                    break
                if length > 19:
                    return None  # invalid prefix
            x, y = dec[(length, code)]
            vals = []
            for v in (x, y):
                if linbits and v == _MP3_ESC_MAX:
                    v += r.get(linbits)
                    n_esc += 1
                if v != 0 and r.get(1):
                    v = -v
                vals.append(v)
            for v in vals:
                sum_v += v
                sum_a += abs(v)
                max_a = max(max_a, abs(v))
        # count1 region: quadruples of ±1/0 values until part2_3_length
        # is exhausted.  Table B (count1table_select=1) is the REAL ISO
        # 11172-3 code — every quadruple vwxy in 4 bits as its one's
        # complement; Table A's code assignment is a remaining declared
        # boundary (see the codebook-honesty note), so select=0 frames
        # with a non-empty count1 region scope-gate to null.
        n_c1 = 0
        sum_c1 = 0
        while r.pos < p23:
            if c1sel != 1:
                return None  # count1 Table A: declared boundary
            quad = r.get(4) ^ 0xF  # table B: hcod = ~vwxy
            for shift in (3, 2, 1, 0):
                bit = (quad >> shift) & 1
                if bit:
                    val = -1 if r.get(1) else 1
                    sum_c1 += val
            n_c1 += 1
    except IndexError:
        return None  # ran off the frame: malformed stream
    if r.pos != p23:
        return None  # part2_3_length disagrees with the bits consumed
    return (tsel[0], 2 * bv, sum_v, sum_a, max_a, n_esc, r.pos, n_c1, sum_c1)


def synth_mp3_coded(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP3 streams with REAL gr0-ch0 entropy payloads:
    stereo no-CRC frames at 44.1 kHz whose side info is internally
    consistent (main_data_begin 0, long blocks, region-uniform
    table_select) and whose main data is a genuine Huffman encoding —
    written bit-by-bit with the shared codebooks — of values that are
    pure functions of the id, so the analytic DuckDB twin can derive
    every decoded aggregate while the Spark side must recover it from
    the actual bits.

    Per id: 1 + id%2 frames.  Frame f uses table 1 when (id+f)%3 == 0
    (values in {0,1}) else ESC table 16 + (id+f)%8 with values in
    0..M−1, M = 16 + min(2^linbits − 1, 14) — escapes above 15 sized
    to every table's linbits width; pair k of frame f codes
    x = (3·id + 5·f + 7·k) % M, y = (2·id + 3·f + 11·k) % M with sign
    bits (id+f+k)%2 on nonzero values; big_values = 6 + (id+f)%5
    pairs; scalefac_compress = (id+f) % 16 prepends the slen-table bit
    count of filler scalefactor bits.  A count1 region of 2 + (id+f)%3
    quadruples follows under the real ISO Table B code: quadruple q's
    bits are ((id+f+q)%2, (id+2f+3q)%2, (2id+f+5q)%2, (id+3f+7q)%2)
    with sign bit (id+f+q+p)%2 on each nonzero position p."""

    def one_payload(i: int) -> bytes:
        parts = []
        for f in range(1 + i % 2):
            if (i + f) % 3 == 0:
                table, m = 1, 2
                book, linbits = _mp3_huff_codes(table)
            else:
                table = 16 + (i + f) % 8
                book, linbits = _mp3_huff_codes(table)
                # value range capped so every escape payload fits the
                # table's linbits width: v ≤ 15 + min(2^linbits − 1, 14)
                m = 16 + min((1 << linbits) - 1, 14)
            scomp = (i + f) % 16
            n_pairs = 6 + (i + f) % 5
            w = _Mp3BitWriter()
            # filler scalefactors: slen1 bits each for sfb 0-10, slen2
            # for 11-20 — values (i+f+sfb) masked to width
            s1, s2 = _MP3_SLEN1[scomp], _MP3_SLEN2[scomp]
            for sfb in range(21):
                n = s1 if sfb < 11 else s2
                if n:
                    w.put((i + f + sfb) & ((1 << n) - 1), n)
            for k in range(n_pairs):
                x = (3 * i + 5 * f + 7 * k) % m
                y = (2 * i + 3 * f + 11 * k) % m
                cx = min(x, _MP3_ESC_MAX) if linbits else x
                cy = min(y, _MP3_ESC_MAX) if linbits else y
                hlen, hcod = book[(cx, cy)]
                w.put(hcod, hlen)
                for v, cv in ((x, cx), (y, cy)):
                    if linbits and cv == _MP3_ESC_MAX:
                        w.put(v - _MP3_ESC_MAX, linbits)
                    if v != 0:
                        w.put((i + f + k) % 2, 1)  # 1 → negative
            # count1 region: 2 + (i+f)%3 quadruples of ±1/0 values,
            # coded with the REAL ISO Table B (hcod = one's complement
            # of vwxy in 4 bits) + a sign bit per nonzero position
            n_quads = 2 + (i + f) % 3
            for q in range(n_quads):
                bits = (
                    (i + f + q) % 2,
                    (i + 2 * f + 3 * q) % 2,
                    (2 * i + f + 5 * q) % 2,
                    (i + 3 * f + 7 * q) % 2,
                )
                quad = (
                    (bits[0] << 3)
                    | (bits[1] << 2)
                    | (bits[2] << 1)
                    | bits[3]
                )
                w.put(quad ^ 0xF, 4)
                for p, bit in enumerate(bits):
                    if bit:
                        w.put((i + f + q + p) % 2, 1)  # 1 → negative
            p23 = w.tell()
            main = w.tobytes()

            si = _Mp3BitWriter()
            si.put(0, 9)  # main_data_begin
            si.put(0, 3)  # private_bits
            si.put(0, 8)  # scfsi
            # gr0 ch0
            si.put(p23, 12)
            si.put(n_pairs, 9)  # big_values
            si.put((7 * i + 100) % 256, 8)  # global_gain
            si.put(scomp, 4)
            si.put(0, 1)  # windows_switching_flag
            si.put(table, 5)
            si.put(table, 5)
            si.put(table, 5)
            si.put(15, 4)  # region0_count
            si.put(7, 3)  # region1_count
            si.put(0, 1)  # preflag
            si.put(0, 1)  # scalefac_scale
            si.put(1, 1)  # count1table_select: table B (the real code)
            # gr0 ch1 + gr1 ch0 + gr1 ch1: silent (all-zero, 59 bits
            # each — valid: p23 = 0, big_values = 0)
            for _ in range(3):
                si.put(0, 59)
            side = si.tobytes()
            assert len(side) == 32, len(side)

            bri = 9  # 128 kbps → 417/418-byte frames, ample room
            pad = (i + f) % 2
            br = _MP3_BITRATES[bri] * 1000
            flen = (144 * br) // 44100 + pad
            hdr = bytes(
                [0xFF, 0xFB, (bri << 4) | (0 << 2) | (pad << 1), 0]
            )
            body = main + bytes(
                (11 * i + 17 * f + j) % 256
                for j in range(flen - 36 - len(main))
            )
            assert 36 + len(main) <= flen, (i, f, len(main))
            parts.append(hdr + side + body)
        return b"".join(parts)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [one_payload(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "audio",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "mp3",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


# ── MP4 (ISO BMFF): real box-walk container demux ────────────────────
#
# Re-expresses the reference's video-container surface (reference
# main repo exposes opaque media payloads only) for the one true
# container format a from-scratch stdlib parser can fully honor: the
# ISO base media file format's box structure and sample tables.  The
# WRITER below builds a minimal-but-valid single-track file (ftyp +
# moov with full mvhd/tkhd/mdhd/hdlr/minf/stbl sample tables + mdat);
# the READER is a general box walk that trusts only the tables —
# stsz/stco(co64)/stsc — never "mdat starts after moov" layout
# assumptions, so files with padding, reordered boxes, or multi-chunk
# layouts demux correctly.


def _box(typ: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _fullbox(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


_MP4_MATRIX = (
    (0x00010000).to_bytes(4, "big")
    + bytes(4) * 3
    + (0x00010000).to_bytes(4, "big")
    + bytes(4) * 3
    + (0x40000000).to_bytes(4, "big")
)


def _build_mp4(
    samples: list[bytes], width: int, height: int, mdat_padding: int = 0
) -> bytes:
    """A valid single-track ISO BMFF file: JPEG samples in one mdat
    chunk, full sample tables (25 fps stts, one stsc run, per-sample
    stsz, one stco offset).  ``mdat_padding`` inserts dead bytes before
    the first sample INSIDE mdat — stco points past them, which is
    exactly the layout freedom readers must honor."""
    n = len(samples)
    timescale, delta = 1000, 40
    duration = n * delta

    def moov(chunk_offset: int) -> bytes:
        mvhd = _fullbox(
            b"mvhd",
            0,
            0,
            bytes(8)  # creation/modification
            + timescale.to_bytes(4, "big")
            + duration.to_bytes(4, "big")
            + (0x00010000).to_bytes(4, "big")  # rate 1.0
            + (0x0100).to_bytes(2, "big")  # volume 1.0
            + bytes(2 + 8)  # reserved
            + _MP4_MATRIX
            + bytes(24)  # pre_defined
            + (2).to_bytes(4, "big"),  # next_track_ID
        )
        tkhd = _fullbox(
            b"tkhd",
            0,
            7,  # enabled | in_movie | in_preview
            bytes(8)
            + (1).to_bytes(4, "big")  # track_ID
            + bytes(4)  # reserved
            + duration.to_bytes(4, "big")
            + bytes(8)  # reserved
            + bytes(2 + 2 + 2 + 2)  # layer, alt_group, volume, reserved
            + _MP4_MATRIX
            + (width << 16).to_bytes(4, "big")
            + (height << 16).to_bytes(4, "big"),
        )
        mdhd = _fullbox(
            b"mdhd",
            0,
            0,
            bytes(8)
            + timescale.to_bytes(4, "big")
            + duration.to_bytes(4, "big")
            + (0x55C4).to_bytes(2, "big")  # language "und"
            + bytes(2),
        )
        hdlr = _fullbox(
            b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"VideoHandler\0"
        )
        # VisualSampleEntry 'jpeg' (86-byte body incl. the 6+2 sample
        # entry header): the sample description readers key decode on.
        stsd_entry = _box(
            b"jpeg",
            bytes(6)
            + (1).to_bytes(2, "big")  # data_reference_index
            + bytes(16)  # pre_defined/reserved
            + width.to_bytes(2, "big")
            + height.to_bytes(2, "big")
            + (0x00480000).to_bytes(4, "big") * 2  # 72 dpi h/v
            + bytes(4)
            + (1).to_bytes(2, "big")  # frame_count
            + bytes(32)  # compressorname
            + (24).to_bytes(2, "big")  # depth
            + (0xFFFF).to_bytes(2, "big"),  # pre_defined -1
        )
        stsd = _fullbox(b"stsd", 0, 0, (1).to_bytes(4, "big") + stsd_entry)
        stts = _fullbox(
            b"stts",
            0,
            0,
            (1).to_bytes(4, "big")
            + n.to_bytes(4, "big")
            + delta.to_bytes(4, "big"),
        )
        stsc = _fullbox(
            b"stsc",
            0,
            0,
            (1).to_bytes(4, "big")
            + (1).to_bytes(4, "big")  # first_chunk
            + n.to_bytes(4, "big")  # samples_per_chunk
            + (1).to_bytes(4, "big"),  # sample_description_index
        )
        stsz = _fullbox(
            b"stsz",
            0,
            0,
            (0).to_bytes(4, "big")  # sample_size 0 → per-sample table
            + n.to_bytes(4, "big")
            + b"".join(len(s).to_bytes(4, "big") for s in samples),
        )
        stco = _fullbox(
            b"stco",
            0,
            0,
            (1).to_bytes(4, "big") + chunk_offset.to_bytes(4, "big"),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        dref = _fullbox(
            b"dref",
            0,
            0,
            (1).to_bytes(4, "big") + _fullbox(b"url ", 0, 1, b""),
        )
        dinf = _box(b"dinf", dref)
        vmhd = _fullbox(b"vmhd", 0, 1, bytes(8))
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + (0x200).to_bytes(4, "big") + b"isomiso2")
    # moov's byte LENGTH is offset-independent, so build once with a
    # placeholder to size the header, then once with the real offset.
    header_len = len(ftyp) + len(moov(0)) + 8  # + mdat box header
    mdat_payload = bytes(mdat_padding) + b"".join(samples)
    return (
        ftyp
        + moov(header_len + mdat_padding)
        + _box(b"mdat", mdat_payload)
    )


def _walk_boxes(buf, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each well-formed box
    in [start, end); handles 64-bit largesize and size-0 (to-end) boxes,
    stops at the first malformed header."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        typ = bytes(buf[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size


def _find_box(buf, start: int, end: int, path: list[bytes]):
    """(payload_start, payload_end) of the first box at ``path`` (e.g.
    [b'moov', b'trak', b'mdia']), or None."""
    for typ, ps, pe in _walk_boxes(buf, start, end):
        if typ != path[0]:
            continue
        if len(path) == 1:
            return ps, pe
        found = _find_box(buf, ps, pe, path[1:])
        if found is not None:  # else keep scanning siblings (multi-trak)
            return found
    return None


def _split_mp4_samples(payload: bytes) -> list[bytes]:
    """REAL ISO BMFF demux: box-walk to the sample tables and slice every
    sample at the file offsets stsc/stco(co64)/stsz describe.  No layout
    assumptions — mdat position, padding, and multi-chunk runs all come
    from the tables.  Returns [] on anything malformed (missing tables,
    offsets past EOF), never raises."""
    buf = payload
    stbl = _find_box(
        buf, 0, len(buf), [b"moov", b"trak", b"mdia", b"minf", b"stbl"]
    )
    if stbl is None:
        return []
    tables: dict[bytes, tuple[int, int]] = {}
    for typ, ps, pe in _walk_boxes(buf, stbl[0], stbl[1]):
        tables[typ] = (ps, pe)
    try:
        szs, sze = tables[b"stsz"]
        fixed_size = int.from_bytes(buf[szs + 4 : szs + 8], "big")
        n_samples = int.from_bytes(buf[szs + 8 : szs + 12], "big")
        # The 32-bit count fields are UNTRUSTED: a crafted ~60-byte payload
        # declaring 0xFFFFFFFF entries would allocate gigabytes in the
        # executor before any slicing.  Every declared count is therefore
        # clamped against the bytes that could actually hold it BEFORE any
        # list materializes — counts past the extent mean a malformed file,
        # and the contract is "return [] on anything malformed".
        if fixed_size:
            if n_samples * fixed_size > len(buf):
                return []
            sizes = [fixed_size] * n_samples
        else:
            if szs + 12 + 4 * n_samples > sze:
                return []
            sizes = [
                int.from_bytes(buf[szs + 12 + 4 * i : szs + 16 + 4 * i], "big")
                for i in range(n_samples)
            ]
        if b"stco" in tables:
            cs, ce = tables[b"stco"]
            n_chunks = int.from_bytes(buf[cs + 4 : cs + 8], "big")
            if cs + 8 + 4 * n_chunks > ce:
                return []
            offsets = [
                int.from_bytes(buf[cs + 8 + 4 * i : cs + 12 + 4 * i], "big")
                for i in range(n_chunks)
            ]
        else:
            cs, ce = tables[b"co64"]
            n_chunks = int.from_bytes(buf[cs + 4 : cs + 8], "big")
            if cs + 8 + 8 * n_chunks > ce:
                return []
            offsets = [
                int.from_bytes(buf[cs + 8 + 8 * i : cs + 16 + 8 * i], "big")
                for i in range(n_chunks)
            ]
        scs, sce = tables[b"stsc"]
        n_runs = int.from_bytes(buf[scs + 4 : scs + 8], "big")
        if scs + 8 + 12 * n_runs > sce:
            return []
        runs = [
            (
                int.from_bytes(buf[scs + 8 + 12 * i : scs + 12 + 12 * i], "big"),
                int.from_bytes(buf[scs + 12 + 12 * i : scs + 16 + 12 * i], "big"),
            )
            for i in range(n_runs)
        ]
    except (KeyError, IndexError):
        return []
    if not runs or n_samples == 0:
        return []
    # expand stsc runs → samples-per-chunk for each chunk
    per_chunk: list[int] = []
    for ri, (first, spc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
        per_chunk.extend([spc] * (last - first + 1))
    frames: list[bytes] = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        if ci >= len(per_chunk) or si >= n_samples:
            break
        off = chunk_off
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            end = off + sizes[si]
            if end > len(buf):
                return frames
            frames.append(bytes(buf[off:end]))
            off = end
            si += 1
    return frames


def synth_mp4(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic MP4 payload per id (Arrow-batched
    ``mapInPandas``) — the video-container-ingest fixture generator.

    2 + id%3 single-block 8×8 JPEG frames (frame f is the constant color
    ((id+17f) % 256, (2id+29f) % 256, (5id+41f) % 256) — the DC-only
    analytic regime `synth_jpeg` pins), wrapped in a valid single-track
    ISO BMFF container with id%7 bytes of in-mdat padding before the
    first sample so the demuxer's stco honesty is exercised on every
    row."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                frames = []
                for f in range(2 + i % 3):
                    arr = np.empty((8, 8, 3), dtype=np.uint8)
                    arr[:, :] = (
                        (i + 17 * f) % 256,
                        (2 * i + 29 * f) % 256,
                        (5 * i + 41 * f) % 256,
                    )
                    frames.append(_encode_jpeg(arr))
                payloads.append(
                    _build_mp4(frames, 8, 8, mdat_padding=i % 7)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "video",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "mp4",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


# ── MKV/WebM (EBML): real container demux ────────────────────────────
#
# Replaces the byte-truncate stand-in for Matroska payloads with a real
# from-scratch EBML parser: variable-size integers (ids keep their
# length-marker bits, sizes strip them, all-ones means unknown-size /
# to-end), a guarded element walk (declared sizes clamped to the
# enclosing extent — same untrusted-count discipline as the MP4 sample
# tables), and SimpleBlock frame extraction (track vint + 16-bit
# relative timestamp + flags; laced blocks are skipped, not guessed).
# The WRITER emits a minimal-but-valid file: EBML header (DocType
# matroska), Segment with Info/Tracks, and Timestamp'd Clusters of
# SimpleBlocks.

_EBML_HEADER = 0x1A45DFA3
_MKV_SEGMENT = 0x18538067
_MKV_CLUSTER = 0x1F43B675
_MKV_TIMESTAMP = 0xE7
_MKV_SIMPLEBLOCK = 0xA3


def _ebml_size(value: int) -> bytes:
    """EBML size vint: smallest width whose all-ones (reserved for
    'unknown') is not the value."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            return (value | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError(f"EBML size too large: {value}")


def _ebml_read_size(buf, pos):
    """(value, next_pos, is_unknown) for a size vint at ``pos``, or None
    on truncation / a zero lead byte (no marker = malformed)."""
    if pos >= len(buf) or buf[pos] == 0:
        return None
    first = buf[pos]
    length, mask = 1, 0x80
    while not first & mask:
        mask >>= 1
        length += 1
    if pos + length > len(buf):
        return None
    v = first & (mask - 1)
    for i in range(1, length):
        v = (v << 8) | buf[pos + i]
    unknown = v == (1 << (7 * length)) - 1
    return v, pos + length, unknown


def _ebml_read_id(buf, pos):
    """(id, next_pos) for an element id at ``pos`` — ids KEEP the
    length-marker bits (that is how Matroska ids are written down)."""
    if pos >= len(buf) or buf[pos] == 0:
        return None
    first = buf[pos]
    length, mask = 1, 0x80
    while not first & mask:
        mask >>= 1
        length += 1
    if length > 4 or pos + length > len(buf):
        return None
    return int.from_bytes(buf[pos : pos + length], "big"), pos + length


def _walk_ebml(buf, start: int, end: int):
    """Yield (id, payload_start, payload_end) for each well-formed EBML
    element in [start, end); unknown-size elements extend to the
    enclosing end; stops at the first malformed header (the
    ``_walk_boxes`` contract)."""
    pos = start
    while pos < end:
        rid = _ebml_read_id(buf, pos)
        if rid is None:
            return
        eid, pos = rid
        rsz = _ebml_read_size(buf, pos)
        if rsz is None:
            return
        size, pos, unknown = rsz
        pe = end if unknown else pos + size
        if pe > end:
            return
        yield eid, pos, pe
        pos = pe


def _ebml_elem(eid: int, payload: bytes) -> bytes:
    return (
        eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        + _ebml_size(len(payload))
        + payload
    )


def _ebml_uint(eid: int, value: int) -> bytes:
    body = value.to_bytes(max(1, (value.bit_length() + 7) // 8), "big")
    return _ebml_elem(eid, body)


def _build_mkv(
    frames: list[bytes],
    frames_per_cluster: int = 2,
    frame_duration_ms: int = 40,
) -> bytes:
    """Minimal-but-valid single-track Matroska file: EBML header
    (DocType matroska, version/read-version/id-size/size-size), Segment
    → Info (TimestampScale 1 ms) + Tracks (one video TrackEntry) +
    Clusters of ``frames_per_cluster`` SimpleBlocks each, cluster
    Timestamp absolute, block timestamps relative int16."""
    header = _ebml_elem(
        _EBML_HEADER,
        _ebml_uint(0x4286, 1)  # EBMLVersion
        + _ebml_uint(0x42F7, 1)  # EBMLReadVersion
        + _ebml_uint(0x42F2, 4)  # EBMLMaxIDLength
        + _ebml_uint(0x42F3, 8)  # EBMLMaxSizeLength
        + _ebml_elem(0x4282, b"matroska")  # DocType
        + _ebml_uint(0x4287, 2)  # DocTypeVersion
        + _ebml_uint(0x4285, 2),  # DocTypeReadVersion
    )
    info = _ebml_elem(
        0x1549A966, _ebml_uint(0x2AD7B1, 1_000_000)  # TimestampScale 1 ms
    )
    tracks = _ebml_elem(
        0x1654AE6B,
        _ebml_elem(
            0xAE,  # TrackEntry
            _ebml_uint(0xD7, 1)  # TrackNumber
            + _ebml_uint(0x73C5, 1)  # TrackUID
            + _ebml_uint(0x83, 1),  # TrackType video
        ),
    )
    clusters = []
    for c0 in range(0, len(frames), frames_per_cluster):
        cluster_ts = c0 * frame_duration_ms
        body = _ebml_uint(_MKV_TIMESTAMP, cluster_ts)
        for f, frame in enumerate(frames[c0 : c0 + frames_per_cluster]):
            rel = f * frame_duration_ms
            body += _ebml_elem(
                _MKV_SIMPLEBLOCK,
                bytes([0x81])  # track 1 as a 1-byte vint
                + rel.to_bytes(2, "big", signed=True)
                + bytes([0x80])  # keyframe, no lacing
                + frame,
            )
        clusters.append(_ebml_elem(_MKV_CLUSTER, body))
    segment = _ebml_elem(_MKV_SEGMENT, info + tracks + b"".join(clusters))
    return header + segment


def _mkv_containers(buf, start: int, end: int, want_id: int):
    """Yield (payload_start, payload_end) for each ``want_id`` CONTAINER
    element in [start, end), CLAMPING a declared extent that overruns
    the buffer (a truncated download keeps its intact prefix — the
    ``_split_mp4_samples`` salvage contract; leaf elements still
    require exact extents via ``_walk_ebml``).  Non-matching siblings
    with honest extents are skipped; the walk stops at the first
    malformed header."""
    pos = start
    while pos < end:
        rid = _ebml_read_id(buf, pos)
        if rid is None:
            return
        eid, pos = rid
        rsz = _ebml_read_size(buf, pos)
        if rsz is None:
            return
        size, pos, unknown = rsz
        pe = end if unknown else min(pos + size, end)
        if eid == want_id:
            yield pos, pe
        pos = pe


def _split_mkv_frames(payload: bytes) -> list[bytes]:
    """REAL Matroska demux: EBML header gate, Segment walk, per-Cluster
    SimpleBlock extraction (track vint skipped, 2-byte relative
    timestamp + flags honored, LACED blocks skipped rather than
    mis-split).  Container extents (Segment, Cluster) clamp to the
    buffer so a truncated file keeps its intact frame prefix; leaf
    blocks need exact extents.  Returns [] on anything that is not an
    EBML stream — never raises."""
    buf = payload
    rid = _ebml_read_id(buf, 0)
    if rid is None or rid[0] != _EBML_HEADER:
        return []
    rsz = _ebml_read_size(buf, rid[1])
    if rsz is None:
        return []
    body = rsz[1] + rsz[0] if not rsz[2] else len(buf)
    if body > len(buf):
        return []
    frames: list[bytes] = []
    for ps, pe in _mkv_containers(buf, body, len(buf), _MKV_SEGMENT):
        for cs, ce in _mkv_containers(buf, ps, pe, _MKV_CLUSTER):
            for bid, bs, be in _walk_ebml(buf, cs, ce):
                if bid != _MKV_SIMPLEBLOCK:
                    continue
                rtrack = _ebml_read_size(buf, bs)
                if rtrack is None:
                    continue
                _, dpos, _ = rtrack
                if dpos + 3 > be:
                    continue
                flags = buf[dpos + 2]
                if flags & 0x06:  # laced — sizes live in a lace header
                    continue
                frames.append(bytes(buf[dpos + 3 : be]))
    return frames


MKV_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_clusters", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("total_frame_bytes", LongType(), True),
        StructField("first_frame_size", LongType(), True),
    ]
)


def probe_mkv(media: DataFrame) -> DataFrame:
    """REAL Matroska structure metadata (Arrow-batched ``mapInPandas``,
    partition-parallel, no shuffle): cluster and SimpleBlock counts and
    frame byte totals recovered from the actual EBML bytes — the audit
    pass a video ingest runs before any decode.  Non-EBML payloads
    probe to NULLs; non-mkv formats raise (the ``probe_mp3``
    contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in MKV_PROBE_SCHEMA}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                if fmt != "mkv":
                    raise NotImplementedError(
                        f"probe_mkv got format {fmt!r}: EBML/Matroska only"
                    )
                out["doc_id"].append(doc_id)
                rid = None if payload is None else _ebml_read_id(payload, 0)
                rsz = (
                    None
                    if rid is None or rid[0] != _EBML_HEADER
                    else _ebml_read_size(payload, rid[1])
                )
                if rsz is not None:
                    body = rsz[1] + rsz[0] if not rsz[2] else len(payload)
                if rsz is None or body > len(payload):
                    for key in (
                        "n_clusters",
                        "n_frames",
                        "total_frame_bytes",
                        "first_frame_size",
                    ):
                        out[key].append(None)
                    continue
                n_clusters = sum(
                    1
                    for ps, pe in _mkv_containers(
                        payload, body, len(payload), _MKV_SEGMENT
                    )
                    for _ in _mkv_containers(
                        payload, ps, pe, _MKV_CLUSTER
                    )
                )
                frames = _split_mkv_frames(payload)
                out["n_clusters"].append(n_clusters)
                out["n_frames"].append(len(frames))
                out["total_frame_bytes"].append(
                    sum(len(f) for f in frames)
                )
                out["first_frame_size"].append(
                    len(frames[0]) if frames else None
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=MKV_PROBE_SCHEMA)


def synth_mkv(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic Matroska payload per id: 2 + id%3
    binary-P6 PPM frames (frame f is the constant color ((id+17f)%256,
    (2id+29f)%256, (5id+41f)%256) — synth_mp4's closed form, PPM-encoded
    so every frame size and pixel sum is analytic), packed 2 per
    Cluster.  Every probe field is therefore a pure function of the id
    — and the Spark side must recover it from the actual EBML bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                frames = []
                for f in range(2 + i % 3):
                    px = bytes(
                        [
                            (i + 17 * f) % 256,
                            (2 * i + 29 * f) % 256,
                            (5 * i + 41 * f) % 256,
                        ]
                        * 64
                    )
                    frames.append(b"P6\n8 8\n255\n" + px)
                payloads.append(_build_mkv(frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "video",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "mkv",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


# ── perceptual hashing (image near-dedup) ────────────────────────────

PHASH_SIZE = 32  # gray resize target before the DCT
PHASH_LOW = 8  # low-frequency block whose median thresholds the bits
PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("phash", LongType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def _phash_basis():
    """Orthonormal 32-point DCT-II basis (the pHash literature's
    transform; float here, not pinned-order — this family is
    pytest-gated against a Python reference, not a SQL twin, because
    the decode itself is not SQL-expressible)."""
    import numpy as np

    n = PHASH_SIZE
    B = np.zeros((n, n))
    for u in range(n):
        c = math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n)
        for x in range(n):
            B[u, x] = c * math.cos((2 * x + 1) * u * math.pi / (2 * n))
    return B


def _phash64(arr) -> int:
    """64-bit perceptual hash of an HxWx3 uint8 image: integer
    luminance, nearest-neighbor resize to 32×32 (index arithmetic
    identical to ``_resize_nn``), 2-D DCT, top-left 8×8 low-frequency
    block, bit = coefficient > block median.  Robust to resizing and
    re-encoding (a pixel-replicated upscale hashes IDENTICALLY — the
    NN grid recovers the original samples); brightness inversion flips
    nearly every bit.  Packed row-major, wrapped to a signed 64-bit
    long (hamming distance is bit_count(xor), sign-safe)."""
    import numpy as np

    h, w, _ = arr.shape
    gray = (
        arr[:, :, 0].astype(np.int64) * 299
        + arr[:, :, 1].astype(np.int64) * 587
        + arr[:, :, 2].astype(np.int64) * 114
    ) // 1000
    n = PHASH_SIZE
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    small = gray[np.ix_(ys, xs)].astype(np.float64)
    B = _phash_basis()
    coef = B @ small @ B.T
    low = coef[:PHASH_LOW, :PHASH_LOW].ravel()
    med = float(np.median(low))
    bits = 0
    for i, v in enumerate(low):
        if v > med:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def phash_media(media: DataFrame) -> DataFrame:
    """Perceptual hashes over the media table: real decode (PPM / PNG /
    GIF / JPEG) then ``_phash64``, Arrow-batched through mapInPandas —
    partition-parallel, no shuffle.  Malformed payloads hash to NULL;
    formats without a decoder raise like ``decode_image`` does.

    Output: (doc_id, phash, decoder)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes, decs = [], [], []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                decoder = _IMAGE_DECODERS.get(fmt)
                if decoder is None:
                    raise NotImplementedError(
                        f"no decoder for format {fmt!r}: the from-scratch "
                        f"codecs cover {sorted(_IMAGE_DECODERS)}"
                    )
                arr = decoder(payload)
                ids.append(doc_id)
                hashes.append(None if arr is None else _phash64(arr))
                decs.append(None if arr is None else f"{fmt}-numpy")
            yield pd.DataFrame(
                {"doc_id": ids, "phash": hashes, "decoder": decs}
            )

    return media.mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_dup_pairs(
    hashed: DataFrame,
    max_hamming: int = 7,
    n_bands: int = 8,
    id_col: str = "doc_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Image near-dup pairs from perceptual hashes: band the 64-bit
    hash into ``n_bands`` equal slices, equi-join on any shared band
    (first-shared-band in-join dedup — the same no-DISTINCT discipline
    as the MinHash/SimHash operators), then keep pairs with hamming
    distance ≤ ``max_hamming`` (bit_count of xor, JVM-side).

    Recall is EXACT for ``max_hamming < n_bands``: a pair within
    hamming h < n_bands has at least one band its differing bits never
    touch (pigeonhole), and that intact band's equi-join emits the
    candidate.  The constructor REJECTS max_hamming ≥ n_bands — a
    best-effort probabilistic mode would silently lose pairs; callers
    wanting a larger radius must raise n_bands to keep the guarantee.

    Scale shape: |bands| narrow rows per image, per-band hash
    equi-join — never an all-pairs scan; random 8-bit band collisions
    sit at 1/256 per band for unrelated images."""
    from .dedup import first_shared_band_terms

    if not 1 <= n_bands <= 64 or 64 % n_bands:
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} forfeits the exactness guarantee "
            f"(needs max_hamming < n_bands={n_bands}); lower it or use "
            "more bands"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1

    def band_sig_at(side: str, j: int) -> Column:
        # band-j slice of the packed hash — the accessor
        # first_shared_band_terms folds over (the SAME shared helper the
        # minhash / simhash / embedding-LSH paths use, not a re-rolled
        # copy of the lowest-shared-band predicate)
        return F.shiftrightunsigned(
            F.col(f"{side}.{hash_col}"), j * width
        ).bitwiseAND(F.lit(mask))

    rows = hashed.filter(F.col(hash_col).isNotNull()).select(id_col, hash_col)
    bands = rows.select(
        F.col(id_col),
        F.col(hash_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, hash_col, "b.band", "b.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                *first_shared_band_terms(band_sig_at, n_bands),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def synth_bmp(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic 24-bit BI_RGB BMP payload per id —
    pixels share ``synth_ppm``'s closed form (w = 4 + id%5,
    h = 3 + id%4, row y a constant (id+y, 2id+3y, 5id+7y) mod 256
    color), stored the way real BMPs are: BITMAPFILEHEADER +
    BITMAPINFOHEADER, rows BOTTOM-UP, BGR byte order, every row padded
    to a 4-byte boundary — so the decoder's row-flip, channel-swap and
    stride handling are all on the hash-gated path."""

    import numpy as np
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                ys = np.arange(h, dtype=np.int64)
                rows = np.stack(
                    [(i + ys) % 256, (2 * i + 3 * ys) % 256, (5 * i + 7 * ys) % 256],
                    axis=1,
                ).astype(np.uint8)  # (h, 3) RGB per row, top-down
                pixels = np.repeat(rows[:, None, :], w, axis=1)  # (h, w, 3)
                bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
                stride = (w * 3 + 3) // 4 * 4
                padded = np.zeros((h, stride), dtype=np.uint8)
                padded[:, : w * 3] = bgr.reshape(h, w * 3)
                data = padded.tobytes()
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
                )
                payloads.append(header + data)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image",
                    "payload": payloads,
                    "payload_size": [len(p) for p in payloads],
                    "format": "bmp",
                }
            )

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


def _decode_bmp(payload: bytes):
    """REAL BMP decode: BITMAPFILEHEADER + BITMAPINFOHEADER parse,
    24-bit uncompressed (BI_RGB) pixel array with 4-byte row stride,
    bottom-up (positive height) or top-down (negative height) row
    order, BGR→RGB — returns (h, w, 3) uint8 RGB or None on any
    malformation (the NULL-stats contract shared by all the image
    codecs)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        data_offset = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
    except struct.error:
        return None
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    if data_offset + stride * h > len(payload):
        return None
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)
    bgr = raw[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


_IMAGE_DECODERS["bmp"] = _decode_bmp
