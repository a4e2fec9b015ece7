"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition-preserving
transforms) is real and tested. Decode is an OPTIONAL-DEPENDENCY path:
``extract_image_features(deterministic_fake=False)`` decodes for real via
PIL when importable (lazily, on the executor) and raises a clear
ImportError otherwise; the default ``deterministic_fake=True`` derives
features from the byte content deterministically — the oracle-checkable
path, exercised everywhere (imaging libs are absent in this container, so
the PIL path is unit-tested under ``pytest.importorskip``).

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


def _pil_decode(content: bytes, target: tuple[int, int]) -> tuple[float, float]:
    """Real decode path: PIL open -> resize -> grayscale pixel mean/std.
    Import happens per-call inside the executor (optional dependency);
    callers gate on availability via ``pil_available``."""
    import io

    import numpy as np
    from PIL import Image

    with Image.open(io.BytesIO(content)) as im:
        arr = np.asarray(im.convert("L").resize(target), dtype=np.float64)
    return float(arr.mean()), float(arr.std())


def pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def extract_image_features(
    media: DataFrame,
    target: tuple[int, int] = (224, 224),
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode -> feature-extract -> resize metadata, via mapInPandas.

    deterministic_fake=True (default): features derive from the raw bytes
    deterministically — the oracle-checkable path, and the only one on
    clusters without imaging libs. deterministic_fake=False: REAL decode
    via PIL (optional dependency, imported lazily on the executor); raises
    ImportError with a clear message where PIL is absent. The Spark-side
    plumbing (Arrow batches, schema, partitioning) is identical either way.
    """
    if not deterministic_fake and not pil_available():
        raise ImportError(
            "real image decode requires pillow (PIL) on the executors; "
            "install it or run with deterministic_fake=True"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
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
            if deterministic_fake:
                stats = pdf["content"].map(lambda b: _fake_decode(b or b""))
            else:
                stats = pdf["content"].map(
                    lambda b: _pil_decode(b, target) if b else (0.0, 0.0)
                )
            out["feat_mean"] = stats.map(lambda t: t[0])
            out["feat_std"] = stats.map(lambda t: t[1])
            out["resized_w"] = target[0]
            out["resized_h"] = target[1]
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("bytes_per_sec", T.DoubleType(), True),
        T.StructField("amp_mean", T.DoubleType(), True),
        T.StructField("amp_std", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio byte-feature extraction via the same Arrow mapInPandas path:
    content id, size, effective byterate against the declared duration, and
    byte-level amplitude statistics (deterministic — a codec decode would
    slot in exactly here; none is shipped, same optional-dependency stance
    as the image path)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            out["content_sha"] = pdf["content"].map(
                lambda b: hashlib.sha256((b or b"").hex().encode()).hexdigest()
            )
            out["n_bytes"] = pdf["content"].map(lambda b: len(b or b"")).astype(
                "int64"
            )
            out["duration_ms"] = pdf["duration_ms"].astype("Int64")
            # exact IEEE division, no rounding: the same (n*1000.0)/d on
            # any engine yields the identical double
            # pd.notna guard: duration_ms is a nullable Int64 series, so a
            # null duration yields pd.NA whose truthiness RAISES on the
            # executor (`if d` is ambiguous for NA)
            out["bytes_per_sec"] = [
                (n * 1000.0) / d if pd.notna(d) and d > 0 else None
                for n, d in zip(out["n_bytes"], out["duration_ms"])
            ]
            stats = pdf["content"].map(lambda b: _fake_decode(b or b""))
            out["amp_mean"] = stats.map(lambda t: t[0])
            out["amp_std"] = stats.map(lambda t: t[1])
            yield out

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
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


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("frame_hex", T.StringType(), True),
    ]
)


def extract_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame extraction with the codec decode STOOD IN by a
    deterministic byte window: one row per planned frame (the
    frame_sample_plan grid), each carrying an 8-byte slice of the
    container bytes at a frame-indexed offset — exactly where a real
    decoder's frame buffer would slot in (same optional-dependency
    stance as image/audio; no codec libs ship in this environment).
    The windowing runs over the HEX of the content so every value is
    re-derivable by an external SQL oracle with plain string math."""
    v = media.filter(F.col("kind") == "video").withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("duration_ms"), F.lit(0)).cast("long"),
                F.lit(int(every_ms)).cast("long"),
            )
        ),
    )
    return v.select(
        "media_id",
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
        F.length("content").cast("long").alias("n_bytes"),
        F.expr(
            "substring(lower(hex(content)), "
            f"cast(2 * pmod(cast(frame_ts_ms / {int(every_ms)} as bigint) * 7, "
            "greatest(length(content) - 7, 1)) + 1 as int), 16)"
        ).alias("frame_hex"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (bytes from repeatable md5
    stream; no external data).

    Partitioning is sized to the row count (r6): a driver-local relation
    otherwise parallelizes to one row per core, and every downstream
    mapInPandas branch then launches a Python task per ROW — for the
    96-row fixture that was 3 branches x 32 one-row Arrow tasks. One
    slice per 32 rows keeps the same results with ~1/30th the Python
    task launches; real media tables are file-backed scans and never hit
    this path."""
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
    n_slices = max(1, min(spark.sparkContext.defaultParallelism, n // 32))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), MEDIA_SCHEMA
    )
