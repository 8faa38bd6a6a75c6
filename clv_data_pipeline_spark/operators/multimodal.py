"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video ride through the engine as opaque ``binary``
payload columns plus a typed metadata struct.  The Spark-side contract
is real and tested — schema, Arrow batch shapes, mapInPandas
signatures, partition behavior.  The codec step is REAL for container
formats whose dimensions live in fixed header fields: PNG, GIF, BMP,
JPEG, WAV (RIFF) and MP4 (ISO-BMFF ``tkhd``) are parsed with pure
``struct`` arithmetic; PIL is used preferentially when importable
(import-guarded — full decode also validates the pixel data), and
anything unrecognized falls back to the deterministic
:func:`fake_decoder` so the pipeline never dies on a corrupt payload.

Scale notes: payloads never hit Python row-at-a-time — mapInPandas
moves Arrow record batches; metadata extraction reads only headers
(byte slices), so the scan stays IO-bound.  Feature extraction that
changes cardinality (frame sampling) also fits mapInPandas since it
may emit 0..n output rows per input.
"""

from __future__ import annotations

import binascii
import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - PIL is absent in this container
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

#: metadata contract for every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: wrap a text column as a binary payload with a
    deterministic media_type, standing in for real image/audio bytes."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")) \
             .withColumn(
                 "media_type",
                 F.element_at(
                     F.array(F.lit("image/png"), F.lit("audio/wav"),
                             F.lit("video/mp4")),
                     (F.col("doc_id") % 3 + 1).cast("int"),
                 ),
             )


# ---------------------------------------------------------------------------
# Real payload synthesis — valid container files built from scratch, so
# the decode path below parses genuine PNG/WAV/MP4 structure in tests.
# ---------------------------------------------------------------------------


def make_png(width: int, height: int) -> bytes:
    """A valid 8-bit grayscale PNG (signature, IHDR, zlib IDAT, IEND,
    correct CRCs) with deterministic pixel data."""
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 31 + y * 17) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(channels: int, sample_rate: int, n_frames: int) -> bytes:
    """A valid PCM16 RIFF/WAVE file with deterministic sample data."""
    data = bytes((i * 7) % 251 for i in range(n_frames * channels * 2))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_mp4(width: int, height: int) -> bytes:
    """A minimal but structurally valid ISO-BMFF file: ftyp +
    moov{mvhd, trak{tkhd}} with 16.16 fixed-point dimensions in tkhd."""
    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(b"mvhd", b"\x00" + b"\x00" * 3 + struct.pack(
        ">IIII", 0, 0, 1000, 0) + struct.pack(">i", 0x00010000)
        + b"\x00" * 6 + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(
        ">IIII", 0, 0, 1, 0) + struct.pack(">I", 0) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0) + b"\x00" * 36
        + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


# ---------------------------------------------------------------------------
# Real header parsers — fixed-offset struct reads, no codec libraries.
# ---------------------------------------------------------------------------


def _png_dims(p: bytes) -> tuple[int, int]:
    # IHDR is always the first chunk: width/height at bytes 16..24
    return struct.unpack(">II", p[16:24])


def _gif_dims(p: bytes) -> tuple[int, int]:
    # logical screen descriptor follows the 6-byte signature, LE
    return struct.unpack("<HH", p[6:10])


def _bmp_dims(p: bytes) -> tuple[int, int]:
    # BITMAPINFOHEADER at offset 14: LE int32 width, height
    w, h = struct.unpack("<ii", p[18:26])
    return w, abs(h)  # negative height = top-down rows


def _jpeg_dims(p: bytes) -> tuple[int, int]:
    # walk marker segments to the first SOFn frame header
    i = 2
    while i + 9 < len(p):
        if p[i] != 0xFF:
            i += 1
            continue
        marker = p[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", p[i + 5:i + 9])
            return w, h
        seg_len = struct.unpack(">H", p[i + 2:i + 4])[0]
        i += 2 + seg_len
    raise ValueError("no SOF marker found in JPEG stream")


def _wav_meta(p: bytes) -> tuple[int, int]:
    # walk RIFF chunks to fmt; returns (channels, sample_rate)
    i = 12
    while i + 8 <= len(p):
        cid, clen = p[i:i + 4], struct.unpack("<I", p[i + 4:i + 8])[0]
        if cid == b"fmt ":
            channels, rate = struct.unpack("<HI", p[i + 10:i + 16])
            return channels, rate
        i += 8 + clen + (clen & 1)
    raise ValueError("no fmt chunk found in RIFF stream")


def _mp4_dims(p: bytes) -> tuple[int, int]:
    # walk the box tree (moov -> trak -> tkhd); width/height are the
    # final 8 bytes of a version-0 tkhd, 16.16 fixed point
    def walk(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i:i + 4])[0]
            typ = buf[i + 4:i + 8]
            if size < 8:
                break
            if typ in (b"moov", b"trak"):
                found = walk(buf, i + 8, i + size)
                if found:
                    return found
            elif typ == b"tkhd":
                w, h = struct.unpack(">II", buf[i + size - 8:i + size])
                return w >> 16, h >> 16
            i += size
        return None

    dims = walk(p, 0, len(p))
    if dims is None:
        raise ValueError("no tkhd box found in MP4 stream")
    return dims


def default_decoder(payload: bytes, media_type: str) -> tuple[int, int]:
    """Real codec hook: sniff the container by magic bytes and parse
    dimensions from its header.  Images return (width, height); WAV
    returns (channels, sample_rate).  PIL, when importable, handles
    images instead (full decode validates pixel data too); unknown or
    corrupt payloads fall back to :func:`fake_decoder` so a bad row
    degrades instead of failing the stage.
    """
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            if _PILImage is not None:  # pragma: no cover
                import io
                return _PILImage.open(io.BytesIO(payload)).size
            return _png_dims(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _gif_dims(payload)
        if payload[:2] == b"BM":
            return _bmp_dims(payload)
        if payload[:2] == b"\xff\xd8":
            return _jpeg_dims(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _wav_meta(payload)
        if payload[4:8] == b"ftyp":
            return _mp4_dims(payload)
    except (ValueError, struct.error, IndexError):
        pass
    return fake_decoder(payload, media_type)


def attach_real_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach genuine container-format payloads (valid PNG / WAV / MP4
    bytes, deterministic per id) so downstream decode exercises real
    header structure end to end.  Synthesis runs in mapInPandas — bytes
    are born executor-side, never routed through the driver.
    """
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
        ]
    )

    def _attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, types = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                kind = i % 3
                if kind == 0:
                    payloads.append(make_png(16 + i % 32, 16 + i % 17))
                    types.append("image/png")
                elif kind == 1:
                    payloads.append(make_wav(1 + i % 2, 8000 + 100 * (i % 5), 64))
                    types.append("audio/wav")
                else:
                    payloads.append(make_mp4(320 + i % 64, 240 + i % 48))
                    types.append("video/mp4")
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["media_type"] = types
            yield pdf

    return df.mapInPandas(_attach, schema)


def fake_decoder(payload: bytes, media_type: str) -> tuple[int, int]:
    """Deterministic stand-in: 'dimensions' derived from payload bytes,
    so tests exercise the full Arrow round trip with stable outputs."""
    w = 16 + (len(payload) % 1024)
    h = 16 + (sum(payload[:8]) % 1024) if payload else 16
    return w, h


def extract_media_metadata(
    df: DataFrame,
    decoder: Callable[[bytes, str], tuple[int, int]] = default_decoder,
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode/inspect payloads via mapInPandas (Arrow batches).

    Emits MEDIA_META_SCHEMA rows.  Column pruning still applies — only
    (id, payload, media_type) cross into Python.
    """
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                decoder(p if p is not None else b"", mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    pruned = df.select(id_col, "payload", "media_type")
    return pruned.mapInPandas(_extract, MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling shape: 1 input row -> 0..max_frames output rows
    (here: fixed-stride byte slices standing in for video frames).
    Demonstrates cardinality-changing mapInPandas with binary output.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                payload = payload or b""
                for i in range(min(max_frames, max(len(payload) // every_n_bytes, 0))):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(
                        payload[i * every_n_bytes:(i + 1) * every_n_bytes]
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_sample, schema)
