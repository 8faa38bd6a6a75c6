"""Real PNG pixel ops (operators/multimodal.py): decode fidelity
against the known synthesis formula, encode->decode round trip,
nearest-neighbor resize indexing, filter-type support, and the
never-fail contract for corrupt payloads."""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pytest

from clv_data_pipeline_spark.operators.multimodal import (
    attach_real_payload,
    decode_png_gray,
    encode_png_gray,
    image_features,
    make_png,
    resize_images,
    resize_nearest,
)


def _expected(w, h):
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return ((x * 31 + y * 17) % 256).astype(np.uint8)


def test_decode_matches_synthesis_formula():
    for w, h in [(16, 16), (47, 32), (20, 17)]:
        assert np.array_equal(decode_png_gray(make_png(w, h)), _expected(w, h))


def test_encode_decode_roundtrip():
    img = _expected(23, 19)
    assert np.array_equal(decode_png_gray(encode_png_gray(img)), img)


def test_decode_sub_and_up_filters():
    # hand-build a 3x3 PNG using filter 1 (Sub) then 2 (Up) rows
    img = np.array([[10, 20, 30], [13, 24, 35], [113, 4, 215]],
                   dtype=np.uint8)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF))

    row0 = b"\x00" + img[0].tobytes()  # None
    sub = np.diff(img[1].astype(np.int16), prepend=0) % 256
    row1 = b"\x01" + sub.astype(np.uint8).tobytes()  # Sub
    up = (img[2].astype(np.int16) - img[1]) % 256
    row2 = b"\x02" + up.astype(np.uint8).tobytes()  # Up
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    p = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
         + chunk(b"IDAT", zlib.compress(row0 + row1 + row2))
         + chunk(b"IEND", b""))
    assert np.array_equal(decode_png_gray(p), img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png_gray(b"not a png at all")


def test_resize_nearest_indexing():
    img = _expected(16, 16)
    half = resize_nearest(img, 8, 8)
    assert half.shape == (8, 8)
    assert np.array_equal(half, img[::2, ::2])


def test_resize_images_never_fails_on_corrupt_payload(spark):
    df = spark.createDataFrame(
        [(1, bytearray(make_png(16, 16)), "image/png"),
         (2, bytearray(b"\x89PNG\r\n\x1a\ncorrupt!!"), "image/png"),
         (3, bytearray(b"RIFF...."), "audio/wav")],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r["doc_id"]: r for r in resize_images(df, 8, 8).collect()}
    assert rows[1]["ok"] and rows[1]["in_w"] == 16
    assert decode_png_gray(bytes(rows[1]["resized"])).shape == (8, 8)
    assert rows[2]["ok"] is False and rows[2]["resized"] is None
    assert 3 not in rows  # non-image rows filtered Spark-side


def test_image_features_match_numpy(spark):
    docs = spark.createDataFrame([(0,), (3,), (6,)], "doc_id long")
    d = attach_real_payload(docs)
    feats = {r["doc_id"]: r for r in image_features(d).collect()}
    for i in (0, 3, 6):
        w, h = 16 + i % 32, 16 + i % 17
        img = _expected(w, h)
        r = feats[i]
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_px"] - img.mean()) < 1e-9
        assert r["min_px"] == int(img.min())
        assert r["max_px"] == int(img.max())
        assert r["hist"] == np.bincount(
            img.ravel() >> 6, minlength=4).tolist()


def test_wav_decode_matches_formula():
    import numpy as np

    from clv_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm16,
        make_wav,
    )

    ch, rate, v = decode_wav_pcm16(make_wav(2, 8100, 64))
    assert (ch, rate, len(v)) == (2, 8100, 128)
    exp = np.array(
        [(((2 * j * 7) % 251) + 256 * (((2 * j + 1) * 7) % 251)
          + 32768) % 65536 - 32768 for j in range(128)],
        dtype=np.int16,
    )
    assert np.array_equal(v, exp)


def test_audio_features_never_fail_and_filter_first(spark):
    from clv_data_pipeline_spark.operators.multimodal import (
        audio_features,
        make_wav,
    )

    df = spark.createDataFrame(
        [(1, bytearray(make_wav(1, 8000, 4)), "audio/wav"),
         (2, bytearray(b"RIFFbroken"), "audio/wav"),
         (3, bytearray(b"\x89PNG"), "image/png")],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert rows[1]["ok"] and rows[1]["n_samples"] == 4
    assert rows[2]["ok"] is False
    assert 3 not in rows


def test_image_features_zero_dim_png_emits_not_ok(spark):
    import struct as st
    import zlib as zl

    from clv_data_pipeline_spark.operators.multimodal import (
        _png_chunk,
        image_features,
    )

    ihdr = st.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0)
    degenerate = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
                  + _png_chunk(b"IDAT", zl.compress(b""))
                  + _png_chunk(b"IEND", b""))
    df = spark.createDataFrame(
        [(1, bytearray(degenerate), "image/png")],
        "doc_id long, payload binary, media_type string",
    )
    rows = image_features(df).collect()
    assert len(rows) == 1 and rows[0]["ok"] is False


def test_decode_rejects_interlaced_png():
    import struct as st
    import zlib as zl

    from clv_data_pipeline_spark.operators.multimodal import (
        _png_chunk,
        decode_png_gray,
    )

    ihdr = st.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)  # interlace=1
    p = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"IDAT", zl.compress(bytes(20)))
         + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png_gray(p)


def test_audio_features_empty_data_chunk_emits_not_ok(spark):
    import struct as st

    from clv_data_pipeline_spark.operators.multimodal import audio_features

    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", 0))
    empty_wav = b"RIFF" + st.pack("<I", len(body)) + body
    df = spark.createDataFrame(
        [(1, bytearray(empty_wav), "audio/wav")],
        "doc_id long, payload binary, media_type string",
    )
    rows = audio_features(df).collect()
    assert len(rows) == 1 and rows[0]["ok"] is False


def test_wav_decode_skips_odd_length_chunks():
    import struct as st

    from clv_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm16,
    )

    # a 3-byte LIST chunk (odd -> 1 pad byte) precedes fmt/data
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = st.pack("<hh", 100, -100)
    body = (b"WAVE"
            + b"LIST" + st.pack("<I", 3) + b"abc" + b"\x00"  # pad
            + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(data)) + data)
    wav = b"RIFF" + st.pack("<I", len(body)) + body
    ch, rate, v = decode_wav_pcm16(wav)
    assert (ch, rate, list(v)) == (1, 8000, [100, -100])


def test_dhash_invariant_under_exact_upscale(spark):
    """dHash of a 9x8 image equals the dHash of its exact 2x nearest
    upscale (18x16): the resample index maps align (j*2w//9 == 2*(j*w//9)
    when w=9), so the gradient bits are identical — the property that
    makes Hamming-on-dHash a scale-robust near-dup detector."""
    import numpy as np

    from clv_data_pipeline_spark.operators.multimodal import (
        decode_png_gray,
        encode_png_gray,
        image_dhash,
    )

    base = np.array(
        [[(x * 31 + y * 17) % 256 for x in range(9)] for y in range(8)],
        dtype=np.uint8,
    )
    up = np.kron(base, np.ones((2, 2), dtype=np.uint8))
    rows = [
        (1, encode_png_gray(base), "image/png"),
        (2, encode_png_gray(up), "image/png"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {r["doc_id"]: (r["dhash_hi"], r["dhash_lo"], r["ok"])
           for r in image_dhash(df).collect()}
    assert got[1][2] and got[2][2]
    assert got[1][:2] == got[2][:2]
    # sanity: decode round-trips the exact pixels
    assert (decode_png_gray(encode_png_gray(base)) == base).all()
