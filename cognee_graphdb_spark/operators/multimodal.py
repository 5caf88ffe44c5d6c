"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference routes binary media through LLM loaders (audio->transcript
image->description, infrastructure/loaders/core/audio_loader.py:18,
image_loader.py:15).  For a 100 TB training-data pipeline the engine
additionally needs decode / feature-extract / resize / frame-sample as
DATA-PARALLEL operators.

The decode libraries (PIL, ffmpeg, torchaudio) are NOT in this container, so
the innermost decode call is stubbed: ``deterministic_fake=True`` derives
features from the bytes' md5 (stable, testable batch plumbing);
``deterministic_fake=False`` raises NotImplementedError where the real decoder
would run.  Everything Spark-side — schema, Arrow batching, partition layout —
is real and is the part that matters at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def _feature_schema(dim: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )


def extract_features(
    media: DataFrame, dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract, Arrow-batched.  Fake path: md5-seeded unit
    vector per blob (deterministic); real path: plug the model call into
    ``_decode_features``."""
    import hashlib

    import numpy as np
    import pandas as pd

    from cognee_graphdb_spark.session import ship_package

    ship_package(media.sparkSession)

    def _decode_features(content: bytes) -> list[float]:
        if not deterministic_fake:
            raise NotImplementedError("real image/audio decode requires PIL/ffmpeg — not in this container")
        seed = int.from_bytes(hashlib.md5(content or b"").digest()[:8], "big")
        rng = np.random.RandomState(seed % (2**32))
        v = rng.standard_normal(dim)
        return (v / np.linalg.norm(v)).astype(np.float32).tolist()

    def run(batches):
        for pdf in batches:
            rows = [
                (mid, _decode_features(bytes(c) if c is not None else b""))
                for mid, c in zip(pdf["media_id"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return media.select("media_id", "content").mapInPandas(run, _feature_schema(dim))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame offset —
    the pure-expression half (sequence + explode); the frame DECODE itself is
    the stubbed binary step.  Partitioning: rows explode ~duration/every_ms
    wide, so repartition by media_id after this for decode parallelism."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_offset_ms"),
    )
    return frames


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize metadata plan: compute target dimensions as expressions (the
    byte-level resample is the stubbed decode step)."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        (F.col("width") * scale).cast("int").alias("target_width"),
        (F.col("height") * scale).cast("int").alias("target_height"),
    )
