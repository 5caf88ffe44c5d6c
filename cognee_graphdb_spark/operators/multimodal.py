"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference routes binary media through LLM loaders (audio->transcript
image->description, infrastructure/loaders/core/audio_loader.py:18,
image_loader.py:15).  For a 100 TB training-data pipeline the engine
additionally needs decode / feature-extract / resize / frame-sample as
DATA-PARALLEL operators.

WAV (RIFF PCM), BMP (24bpp), PPM (P6), PNG, GIF and baseline JPEG decode for REAL via the public-spec
parsers in :mod:`cognee_graphdb_spark.sources.media` (stdlib only, same
approach as sources/pdf.py): ``audio_frame_sample`` samples actual PCM
amplitudes, ``image_resize`` resamples actual pixel rows, and
``extract_features`` computes real signal/pixel statistics for those formats.
Formats needing heavyweight codecs (mp3/mp4 — ffmpeg is not in this
container) keep the md5-seeded stand-in behind ``deterministic_fake=True``
(or raise NotImplementedError), exactly where the real codec call would plug
in.  Everything Spark-side — schema, Arrow batching, partition layout — is
identical for both paths.
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

    from cognee_graphdb_spark.sources import media as m

    def _real_features(content: bytes) -> list[float] | None:
        # REAL decode for the stdlib-parseable formats: WAV -> windowed RMS
        # profile; BMP/PPM -> per-grid-cell mean luminance.  Both are
        # deterministic signal statistics, padded/truncated to dim.  None for
        # anything that is not a well-formed supported blob — a RIFF-magic
        # AVI, a truncated WAV, or a 32bpp BMP must fall back to the stand-in
        # path, never crash the corpus job.
        try:
            if content[:4] == b"RIFF":
                samples = m.wav_samples(content)
                info = m.parse_wav(content)
                center = 128.0 if info.sample_width == 1 else 0.0
                full = 255.0 if info.sample_width == 1 else 32768.0
                n = max(1, len(samples) // dim)
                return [
                    float(
                        (
                            sum((s - center) ** 2 for s in samples[i * n : (i + 1) * n])
                            / max(1, len(samples[i * n : (i + 1) * n]))
                        )
                        ** 0.5
                        / full
                    )
                    for i in range(dim)
                ]
            if m.is_image_magic(content):
                px = m.decode_image(content)
                h, w = len(px), len(px[0])
                side = max(1, int(dim**0.5))
                feats = []
                for gy in range(side):
                    for gx in range(side):
                        cell = [
                            px[y][x]
                            for y in range(gy * h // side, max(gy * h // side + 1, (gy + 1) * h // side))
                            for x in range(gx * w // side, max(gx * w // side + 1, (gx + 1) * w // side))
                        ]
                        lum = sum(0.299 * r + 0.587 * g + 0.114 * b for r, g, b in cell) / len(cell)
                        feats.append(float(lum / 255.0))
                return feats[:dim] + [0.0] * max(0, dim - len(feats))
        except Exception:
            return None
        return None

    def _decode_features(content: bytes) -> list[float]:
        real = _real_features(content)
        if real is not None:
            return real
        if not deterministic_fake:
            raise NotImplementedError("decode for this format requires PIL/ffmpeg — not in this container")
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


def audio_frame_sample(media: DataFrame, every_ms: int = 100) -> DataFrame:
    """REAL audio sampling: decode each WAV blob's PCM frames and emit
    (media_id, frame_offset_ms, amplitude) at every_ms steps — the decoded
    counterpart of :func:`frame_sample_plan` (which stays expression-only for
    formats without an in-container codec).  Arrow-batched mapInPandas; one
    blob never leaves its partition, so decode scales with executors."""
    import pandas as pd

    from cognee_graphdb_spark.session import ship_package
    from cognee_graphdb_spark.sources.media import wav_sample_at_offsets

    ship_package(media.sparkSession)
    schema = "media_id string, frame_offset_ms long, amplitude long"

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    samples = wav_sample_at_offsets(bytes(content), every_ms)
                except Exception:
                    continue  # malformed blob: skip, don't fail the corpus job
                for off, amp in samples:
                    rows.append((mid, off, amp))
            yield pd.DataFrame(rows, columns=["media_id", "frame_offset_ms", "amplitude"])

    return media.select("media_id", "content").mapInPandas(run, schema)


def image_resize(media: DataFrame, target_width: int, target_height: int) -> DataFrame:
    """REAL image resize: decode BMP/PPM/PNG/GIF/JPEG pixel rows, nearest-neighbor
    resample (sx = tx*w//tw), and emit per-image stats of the RESIZED pixels
    — (media_id, width, height, target_width, target_height, red_sum).
    The integer-exact mapping keeps the output oracle-checkable."""
    import numpy as np
    import pandas as pd

    from cognee_graphdb_spark.session import ship_package
    from cognee_graphdb_spark.sources.media import decode_image_np, resize_nearest_np

    ship_package(media.sparkSession)
    schema = (
        "media_id string, width int, height int, target_width int, "
        "target_height int, red_sum long"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    px = decode_image_np(bytes(content))
                    small = resize_nearest_np(px, target_width, target_height)
                except Exception:
                    continue  # malformed blob: skip, don't fail the corpus job
                h, w = px.shape[0], px.shape[1]
                red_sum = int(small[:, :, 0].astype(np.int64).sum())
                rows.append((mid, w, h, target_width, target_height, red_sum))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "target_width", "target_height", "red_sum"],
            )

    return media.select("media_id", "content").mapInPandas(run, schema)


def media_info(media: DataFrame) -> DataFrame:
    """Typed-metadata sniff per blob — the corpus-scale front door for
    multimodal columns: one Arrow-batched pass classifies each binary and
    extracts REAL container metadata with zero sample decode.

    WAV (RIFF parse), MP3 (frame-header walk: exact VBR-aware duration),
    MP4 (ISO BMFF box tree: duration/dims/codec), and the decodable image
    formats (BMP/PPM/PNG/GIF/baseline JPEG: dimensions) all come from
    sources/media.py, sources/jpeg.py and sources/container.py public-spec
    parsers.  Unknown formats emit kind='opaque' with NULL metadata rather
    than failing the corpus job.  Output: (media_id, kind, duration_ms,
    sample_rate, channels, width, height, codec)."""
    import pandas as pd

    from cognee_graphdb_spark.session import ship_package

    ship_package(media.sparkSession)
    schema = (
        "media_id string, kind string, duration_ms long, sample_rate int, "
        "channels int, width int, height int, codec string"
    )

    def _sniff(mid: str, data: bytes):
        from cognee_graphdb_spark.sources import media as m
        from cognee_graphdb_spark.sources.container import parse_mp3, parse_mp4

        try:
            if data[:4] == b"RIFF":
                info = m.parse_wav(data)
                return (
                    mid, "audio", info.duration_ms, info.sample_rate,
                    info.channels, None, None, "pcm",
                )
            if len(data) > 8 and data[4:8] in (b"ftyp", b"moov", b"styp"):
                v = parse_mp4(data)
                codec = v.codecs[0] if v.codecs else None
                return (mid, "video", v.duration_ms, None, None, v.width, v.height, codec)
            if m.is_image_magic(data):
                # HEADER-ONLY dims — the sniff pass must never pay a pixel
                # decode (that's the expensive fan-out this pass precedes)
                if data[:2] == b"BM":
                    w, h = m.parse_bmp(data)[:2]
                    fmt = "bmp"
                elif data[:2] == b"P6":
                    w, h = m.parse_ppm(data)
                    fmt = "ppm"
                elif data[:1] == b"\x89":
                    w, h = m.parse_png(data)[:2]
                    fmt = "png"
                elif data[:1] == b"G":
                    w, h = m.parse_gif(data)
                    fmt = "gif"
                else:
                    from cognee_graphdb_spark.sources.jpeg import parse_jpeg

                    w, h = parse_jpeg(data)[:2]
                    fmt = "jpeg"
                return (mid, "image", None, None, None, w, h, fmt)
            if data[:3] == b"ID3" or (len(data) > 1 and data[0] == 0xFF and data[1] & 0xE0 == 0xE0):
                a = parse_mp3(data)
                return (mid, "audio", a.duration_ms, a.sample_rate, a.channels, None, None, "mp3")
        except Exception:
            pass  # malformed blob of a known magic: classify opaque, don't fail
        return (mid, "opaque", None, None, None, None, None, None)

    cols = ["media_id", "kind", "duration_ms", "sample_rate", "channels", "width", "height", "codec"]

    def run(batches):
        for pdf in batches:
            rows = [
                _sniff(mid, bytes(c) if c is not None else b"")
                for mid, c in zip(pdf["media_id"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "content").mapInPandas(run, schema)


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
