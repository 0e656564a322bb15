"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference's text_image_embedding processor
(processor/TextImageEmbeddingProcessor.java:42-162) sends {inputText,
inputImage} maps to an ML model; the Spark-side analog treats media as
``binary`` payload columns with typed metadata structs and runs decode /
feature-extract / resize / frame-sample as Arrow-batched ``mapInPandas``
stages.

The image/audio codec libraries are not in this container, so the decode
step is STUBBED: ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a clearly-marked deterministic fake decoder
(payload bytes → pseudo pixel stats) exercises the real Spark plumbing —
schema, Arrow batching, partitioning — end-to-end in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def make_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4)
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                ("application/octet-stream", 64 + i, 48 + i, 1000 * (i % 7)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a deterministic media table from a documents table (payload =
    the text's UTF-8 bytes, kind cycling by id) — entirely Catalyst, so the
    downstream mapInPandas feature extraction is cross-engine checkable
    (n_bytes == octet_length(text)) without shipping python-made blobs."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            ((F.col(id_col) % 7) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decoder': digest-seeded feature vector.
    Clearly NOT a real codec — stands in for PIL/ffmpeg, which aren't in
    this container. Keeps the Spark-side batch shapes honest."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/opencv (not installed); "
            "pass fake=True for the deterministic test decoder"
        )
    return _fake_decode(payload)


def extract_features(
    media: DataFrame, dim: int = 8, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, vectorized numpy
    per batch, no per-row Python beyond the payload loop (codec calls are
    inherently per-payload; real codecs release the GIL)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp —
    the sequence/posexplode side is real Catalyst; the frame decode itself
    is the stubbed step (payload carried through untouched)."""
    vids = media.filter(F.col("kind") == "video")
    stamps = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return vids.select(
        "media_id",
        F.posexplode(stamps).alias("frame_idx", "ts_ms"),
        "payload",
    )
