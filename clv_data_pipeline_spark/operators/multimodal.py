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


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    """length + type + data + CRC32 — the PNG chunk frame shared by the
    synthesizer (make_png) and the re-encoder (encode_png_gray)."""
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int) -> bytes:
    """A valid 8-bit grayscale PNG (signature, IHDR, zlib IDAT, IEND,
    correct CRCs) with deterministic pixel data."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 31 + y * 17) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
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


# ---------------------------------------------------------------------------
# Real pixel operations — stdlib-zlib PNG decode, nearest-neighbor
# resize, channel statistics.  No codec library needed for the 8-bit
# grayscale PNGs this pipeline synthesizes; foreign/corrupt payloads
# fall back deterministically instead of failing the job (same
# contract as default_decoder).
# ---------------------------------------------------------------------------


def decode_png_gray(p: bytes):
    """Decode an 8-bit grayscale PNG to an (h, w) uint8 array.

    Real decode: IHDR parse, IDAT concatenation, zlib inflate, and
    scanline de-filtering (filter types 0/1/2 — None/Sub/Up — which
    cover every encoder this repo ships and most grayscale encoders).
    Raises ValueError on anything else; callers catch and fall back.
    """
    import numpy as np

    if p[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", p[16:24])
    if w == 0 or h == 0:
        raise ValueError("degenerate zero-dimension PNG")
    bit_depth, color_type = p[24], p[25]
    if bit_depth != 8 or color_type != 0:
        raise ValueError("only 8-bit grayscale supported")
    if p[26] != 0 or p[27] != 0 or p[28] != 0:
        # nonzero compression/filter-method/interlace: Adam7 streams
        # would otherwise de-filter "successfully" into scrambled
        # pixels — reject deterministically instead
        raise ValueError("unsupported PNG compression/filter/interlace")
    idat, off = b"", 8
    while off < len(p):
        (ln,) = struct.unpack(">I", p[off:off + 4])
        typ = p[off + 4:off + 8]
        if typ == b"IDAT":
            idat += p[off + 8:off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    stride = w + 1
    img = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        filt, data = line[0], np.frombuffer(line[1:], dtype=np.uint8)
        if filt == 0:
            row = data.copy()
        elif filt == 1:  # Sub: add left neighbor (sequential by nature)
            row = data.copy()
            for x in range(1, w):
                row[x] = (int(row[x]) + int(row[x - 1])) & 0xFF
        elif filt == 2:  # Up: add the row above
            row = (data.astype(np.int16) + prev).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {filt}")
        img[y] = row
        prev = row
    return img


def encode_png_gray(img) -> bytes:
    """(h, w) uint8 -> valid 8-bit grayscale PNG (filter 0 rows)."""
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def resize_nearest(img, tw: int, th: int):
    """Nearest-neighbor resample to (th, tw) — pure index arithmetic."""
    import numpy as np

    h, w = img.shape
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ys][:, xs]


def resize_images(
    df: DataFrame,
    target_w: int = 8,
    target_h: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode -> nearest-resize -> re-encode, Arrow batch at a time.

    The Spark-side ``media_type = 'image/png'`` filter runs FIRST so
    scan pruning/pushdown still applies and only image rows cross into
    Python (the q_mapinarrow rule).  Undecodable payloads emit
    ok = false with a null output instead of failing the batch — at
    100 TB a corrupt row must never kill the job.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("in_w", T.IntegerType()),
            T.StructField("in_h", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("n_bytes_out", T.IntegerType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = decode_png_gray(payload or b"")
                    small = encode_png_gray(
                        resize_nearest(img, target_w, target_h)
                    )
                    out["in_h"].append(int(img.shape[0]))
                    out["in_w"].append(int(img.shape[1]))
                    out["resized"].append(small)
                    out["n_bytes_out"].append(len(small))
                    out["ok"].append(True)
                except (ValueError, IndexError, zlib.error, struct.error):
                    out["in_h"].append(None)
                    out["in_w"].append(None)
                    out["resized"].append(None)
                    out["n_bytes_out"].append(None)
                    out["ok"].append(False)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("media_type") == "image/png")
        .select(id_col, "payload")
        .mapInPandas(_resize, schema)
    )


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pixel-statistics feature extraction per image: mean/std/min/max
    plus a 4-bin intensity histogram — the fixed-width feature row an
    image-quality filter or dedup stage consumes.  Same filter-first /
    never-fail contract as :func:`resize_images`."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_px", T.DoubleType()),
            T.StructField("std_px", T.DoubleType()),
            T.StructField("min_px", T.IntegerType()),
            T.StructField("max_px", T.IntegerType()),
            T.StructField("hist", T.ArrayType(T.LongType())),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                # compute EVERYTHING before appending anything, so a
                # failure mid-row can never leave ragged columns
                try:
                    img = decode_png_gray(payload or b"")
                    # exact integer sufficient stats, then ONE double
                    # division sequence — the identical arithmetic a
                    # SQL oracle runs, so results are bit-comparable
                    # (np.mean/np.std accumulate differently).  Emit
                    # UNROUNDED doubles: python round() is banker's,
                    # Spark/DuckDB ROUND is half-up — the registered
                    # query rounds Spark-side so both engines round
                    # the identical double identically.
                    n = img.size
                    s1 = int(img.astype(np.int64).sum())
                    s2 = int((img.astype(np.int64) ** 2).sum())
                    mean = s1 / n
                    row = (
                        int(img.shape[1]), int(img.shape[0]), mean,
                        (s2 / n - mean * mean) ** 0.5,
                        int(img.min()), int(img.max()),
                        np.bincount(img.ravel() >> 6, minlength=4)
                        .astype("int64").tolist(),
                        True,
                    )
                except (ValueError, IndexError, zlib.error, struct.error,
                        ZeroDivisionError):
                    row = (None,) * 7 + (False,)
                out["doc_id"].append(doc_id)
                for k, v in zip(("width", "height", "mean_px", "std_px",
                                 "min_px", "max_px", "hist", "ok"), row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("media_type") == "image/png")
        .select(id_col, "payload")
        .mapInPandas(_feat, schema)
    )


def decode_wav_pcm16(p: bytes):
    """Decode a PCM16 RIFF/WAVE payload to (channels, sample_rate,
    int16 sample array) — real chunk walk (fmt / data), stdlib struct +
    numpy frombuffer.  Raises ValueError on anything non-PCM16."""
    import numpy as np

    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    off, channels, rate, bits, data = 12, None, None, None, None
    while off + 8 <= len(p):
        typ = p[off:off + 4]
        (ln,) = struct.unpack("<I", p[off + 4:off + 8])
        body = p[off + 8:off + 8 + ln]
        if typ == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif typ == b"data":
            data = body
        off += 8 + ln + (ln & 1)  # RIFF pads odd-length chunks
    if channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return channels, rate, np.frombuffer(data, dtype="<i2")


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Amplitude features per audio payload: sample count, mean, RMS,
    peak — the fixed-width row an audio-quality filter consumes.
    Exact integer sufficient stats, unrounded doubles out (the query
    rounds Spark-side); same filter-first / never-fail contract as
    :func:`image_features`."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("mean_amp", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                # compute everything before appending anything (an
                # empty data chunk raises ZeroDivisionError mid-row;
                # partial appends would leave ragged columns and kill
                # the task at DataFrame construction)
                try:
                    ch, rate, v = decode_wav_pcm16(bytes(payload or b""))
                    n = len(v)
                    s1 = int(v.astype(np.int64).sum())
                    s2 = int((v.astype(np.int64) ** 2).sum())
                    row = (
                        ch, rate, n, s1 / n, (s2 / n) ** 0.5,
                        int(np.abs(v.astype(np.int64)).max()), True,
                    )
                except (ValueError, IndexError, struct.error,
                        ZeroDivisionError):
                    row = (None,) * 6 + (False,)
                out["doc_id"].append(doc_id)
                for k, val in zip(("channels", "sample_rate", "n_samples",
                                   "mean_amp", "rms", "peak", "ok"), row):
                    out[k].append(val)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("media_type") == "audio/wav")
        .select(id_col, "payload")
        .mapInPandas(_feat, schema)
    )


def image_dhash(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode -> nearest-
    resize to 9x8 -> 64 horizontal-gradient bits, returned as two
    32-bit halves (``dhash_hi``, ``dhash_lo`` — two BIGINTs instead of
    one unsigned 64-bit value, so no signed-overflow games in either
    engine).  Near-duplicate images differ in few bits under Hamming
    distance regardless of scale/brightness shifts; pairing +
    bit_count(xor) happens JVM-side on the hashes, never on pixels.

    The Spark-side media_type filter runs FIRST (scan pushdown
    survives); undecodable payloads yield ok=false rows.
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("dhash_hi", T.LongType()),
            T.StructField("dhash_lo", T.LongType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "dhash_hi": [], "dhash_lo": [], "ok": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                hi = lo = 0
                ok = True
                try:
                    img = decode_png_gray(bytes(payload))
                    small = resize_nearest(img, 9, 8).astype(np.int16)
                    grad = (small[:, :8] > small[:, 1:]).astype(np.int64)
                    for k in range(8):
                        for j in range(8):
                            if grad[k, j]:
                                if k < 4:
                                    hi |= 1 << (k * 8 + j)
                                else:
                                    lo |= 1 << ((k - 4) * 8 + j)
                except Exception:
                    ok = False
                out[id_col].append(int(doc_id))
                out["dhash_hi"].append(hi)
                out["dhash_lo"].append(lo)
                out["ok"].append(ok)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("media_type") == "image/png")
        .select(id_col, "payload")
        .mapInPandas(_hash, schema)
    )


def audio_fingerprint(
    df: DataFrame, id_col: str = "doc_id", n_bits: int = 32
) -> DataFrame:
    """Waveform fingerprint per audio payload: decode PCM16, take the
    first channel's first ``n_bits``+1 samples, hash the SIGN OF THE
    DERIVATIVE (sample[j+1] > sample[j]) into one BIGINT — the shape
    (not the level) of the waveform, so gain changes don't move the
    fingerprint.  The audio analogue of image_dhash; near-dup pairing
    happens on the 8-byte fingerprints, never on samples.
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("fp", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "fp": [], "n_samples": [], "ok": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                fp, n, ok = 0, 0, True
                try:
                    ch, _rate, v = decode_wav_pcm16(bytes(payload))
                    mono = v[::ch][: n_bits + 1].astype(np.int32)
                    n = len(v) // ch
                    for j in range(min(n_bits, len(mono) - 1)):
                        if mono[j + 1] > mono[j]:
                            fp |= 1 << j
                except Exception:
                    ok = False
                out[id_col].append(int(doc_id))
                out["fp"].append(fp)
                out["n_samples"].append(n)
                out["ok"].append(ok)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("media_type") == "audio/wav")
        .select(id_col, "payload")
        .mapInPandas(_fp, schema)
    )
