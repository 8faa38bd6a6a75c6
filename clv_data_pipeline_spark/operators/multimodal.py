"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video ride through the engine as opaque ``binary``
payload columns plus a typed metadata struct.  The Spark-side contract
is real and tested — schema, Arrow batch shapes, mapInPandas
signatures, partition behavior; only the *codec* step is stubbed
(PIL/ffmpeg are not in this container), behind an explicit
``decoder=`` hook that raises NotImplementedError by default or takes
a deterministic fake for tests.

Scale notes: payloads never hit Python row-at-a-time — mapInPandas
moves Arrow record batches; metadata extraction reads only headers
(here: byte slices), so the scan stays IO-bound.  Feature extraction
that changes cardinality (frame sampling) also fits mapInPandas since
it may emit 0..n output rows per input.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def default_decoder(payload: bytes, media_type: str) -> tuple[int, int]:
    """Codec hook. Real deployments plug PIL/soundfile/pyav here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; pass a "
        "decoder= callable (e.g. PIL-based) to extract_media_metadata"
    )


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
