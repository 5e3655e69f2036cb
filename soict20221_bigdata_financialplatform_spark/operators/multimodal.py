"""Multimodal column plumbing (driver brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side contract — schemas, partitioning, batch shape, UDF signatures
— is real and tested; the actual media decoding is STUBBED behind
``_decode_image_stub`` (the image/audio libraries are not in this container).
Swapping in PIL/ffmpeg is a one-function change per modality; everything
around it (how bytes flow through Arrow, how features land in columns, how
work is partitioned) is the production design.

Scale notes: media bytes never hit the driver; ``mapInPandas`` streams Arrow
record batches through the Python worker, so peak memory is one batch, not
one partition (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds rows per
batch — set it low for large blobs). Partition by content id so a later join
back to metadata is co-partitioned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque media blob (the lakehouse-standard shape:
# bytes + enough metadata to filter WITHOUT decoding).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),  # -1 when unknown/NA
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(content: bytes) -> "object":
    """STUB: real implementation would be ``PIL.Image.open(BytesIO(content))``.

    Raises so accidental production use is loud; tests monkeypatch or use the
    deterministic fake feature path below, which never decodes.
    """
    raise NotImplementedError(
        "media decoding is stubbed in this environment — plug PIL/ffmpeg here"
    )


def _byte_entropy(b: bytes) -> float:
    """Cheap no-decode feature: Shannon entropy of the byte histogram."""
    import math

    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def _fake_embedding(b: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a model embedding: a dim-bucket byte
    histogram, L1-normalized. Replaces the decode→model path until the
    decoder stub is filled; same shape, same determinism guarantees."""
    buckets = [0] * dim
    for x in b:
        buckets[x % dim] += 1
    total = sum(buckets) or 1
    return [float(c) / total for c in buckets]


def extract_image_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """media (MEDIA_SCHEMA) → IMAGE_FEATURE_SCHEMA via ``mapInPandas``.

    Streams Arrow batches; only image rows are processed (filter pushed
    before the Python stage so non-image bytes never cross the Arrow
    boundary)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b or b"")),
                    "byte_entropy": content.map(lambda b: _byte_entropy(b or b"")),
                    "feature": content.map(
                        lambda b: _fake_embedding(b or b"", feature_dim)
                    ),
                }
            )

    imgs = media.where(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(_extract, schema=IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling PLAN: explode each video into (media_id,
    frame_ts_ms) rows at a fixed cadence using only metadata — the actual
    frame extraction joins this plan against the decode stage. Pure native
    expressions; no bytes move."""
    v = media.where(F.col("kind") == "video")
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return v.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )


def resize_metadata(
    media: DataFrame, max_side: int = 512
) -> DataFrame:
    """Resize PLANNING as native expressions: compute target dimensions
    preserving aspect ratio (the byte-level resample happens in the decode
    stage). Filterable without touching content."""
    w, h = F.col("width"), F.col("height")
    scale = F.when(
        (w > 0) & (h > 0), F.least(F.lit(1.0), max_side / F.greatest(w, h))
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )
