"""Real-codec multimodal path: synthesized container bytes must parse
back to their construction parameters through ``default_decoder``
(header-struct parsers; PIL if importable), and the Spark mapInPandas
round trip must carry the same values end to end."""

from __future__ import annotations

import struct

from clv_data_pipeline_spark.operators.multimodal import (
    attach_real_payload,
    default_decoder,
    extract_media_metadata,
    fake_decoder,
    make_mp4,
    make_png,
    make_wav,
)


def test_png_roundtrip():
    assert default_decoder(make_png(33, 21), "image/png") == (33, 21)


def test_wav_roundtrip():
    assert default_decoder(make_wav(2, 8300, 64), "audio/wav") == (2, 8300)


def test_mp4_roundtrip():
    assert default_decoder(make_mp4(352, 288), "video/mp4") == (352, 288)


def test_gif_header_parse():
    gif = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 6
    assert default_decoder(gif, "image/gif") == (640, 480)


def test_bmp_header_parse():
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 20
    assert default_decoder(bmp, "image/bmp") == (800, 600)


def test_jpeg_sof_parse():
    # SOI, APP0 (16 bytes), SOF0 with height=120 width=160
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 120, 160) + b"\x01\x11\x00"
    )
    assert default_decoder(jpeg, "image/jpeg") == (160, 120)


def test_unknown_bytes_fall_back_to_fake():
    garbage = b"not a media file at all"
    assert default_decoder(garbage, "application/octet-stream") == fake_decoder(
        garbage, "application/octet-stream"
    )


def test_truncated_png_falls_back():
    assert default_decoder(b"\x89PNG\r\n\x1a\n\x00", "image/png") == fake_decoder(
        b"\x89PNG\r\n\x1a\n\x00", "image/png"
    )


def test_spark_real_payload_roundtrip(spark):
    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    meta = extract_media_metadata(
        attach_real_payload(df), decoder=default_decoder
    )
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        kind = i % 3
        if kind == 0:
            assert r["media_type"] == "image/png"
            assert (r["width"], r["height"]) == (16 + i % 32, 16 + i % 17)
        elif kind == 1:
            assert r["media_type"] == "audio/wav"
            assert (r["width"], r["height"]) == (1 + i % 2, 8000 + 100 * (i % 5))
        else:
            assert r["media_type"] == "video/mp4"
            assert (r["width"], r["height"]) == (320 + i % 64, 240 + i % 48)
        assert r["n_bytes"] > 0
