"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition-preserving
transforms) is real and tested; the actual media decode is STUBBED because
image/audio libraries are not available in this container — see
``decode_image_batch``: it raises NotImplementedError unless
``deterministic_fake=True``, in which case it derives features from the
byte content deterministically (so tests exercise the full plumbing).

Scale notes: media bytes never leave the executor; mapInPandas streams
Arrow record batches, so a 100 TB media corpus processes with bounded
memory (spark.sql.execution.arrow.maxRecordsPerBatch controls batch rows —
for large blobs, lower it or pre-split by byte size).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_std", T.DoubleType(), True),
        T.StructField("resized_w", T.IntegerType(), True),
        T.StructField("resized_h", T.IntegerType(), True),
    ]
)


def _fake_decode(content: bytes) -> tuple[float, float]:
    """Deterministic stand-in for pixel statistics: byte-level mean/std."""
    if not content:
        return 0.0, 0.0
    import numpy as np

    arr = np.frombuffer(content, dtype=np.uint8)
    return float(arr.mean()), float(arr.std())


def extract_image_features(
    media: DataFrame,
    target: tuple[int, int] = (224, 224),
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode -> feature-extract -> resize metadata, via mapInPandas.

    With real imaging libs this is where PIL/cv2 decode happens per Arrow
    batch; here the decode is a clearly-marked stub.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decode requires PIL/cv2 (unavailable in this "
                    "container); run with deterministic_fake=True"
                )
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            # content id = sha256 of the LOWERCASE-HEX encoding of the
            # bytes: byte-identical content maps to the same id, and an
            # external SQL engine can reproduce it (sha256-over-varchar is
            # universally available; sha256-over-blob is not)
            out["content_sha"] = pdf["content"].map(
                lambda b: hashlib.sha256((b or b"").hex().encode()).hexdigest()
            )
            out["n_bytes"] = pdf["content"].map(lambda b: len(b or b"")).astype("int64")
            stats = pdf["content"].map(lambda b: _fake_decode(b or b""))
            out["feat_mean"] = stats.map(lambda t: t[0])
            out["feat_std"] = stats.map(lambda t: t[1])
            out["resized_w"] = target[0]
            out["resized_h"] = target[1]
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (explode over the duration grid). Decode of each frame is the same
    stubbed step; the row explosion and partitioning are the real part."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "mime", "frame_ts_ms")
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (bytes from repeatable md5
    stream; no external data)."""
    rows = []
    for i in range(n):
        h = hashlib.md5(f"media-{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                f"m-{i:04d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                h * (i % 7 + 1),
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                int(3000 + i * 17) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
