"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata struct (SURVEY.md §7 Phase 6).

The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas`` transforms,
partition-size control — is real and tested. The codec calls themselves are
STUBBED: this container has no image/audio libraries, so decode uses a
deterministic fake (size-prefixed pseudo-pixels) behind ``_decode_impl``;
swap in PIL/torchaudio/ffmpeg in production. The UDF signatures and batch
shapes do not change when the real codec lands.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal row: payload + typed metadata (media_type drives
#: dispatch; width/height/duration are nullable per modality).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

_FEATURE_DIM = 16


def _decode_impl(payload: bytes, media_type: str) -> np.ndarray:
    """STUB codec: deterministic pseudo-decode (hash-seeded), replaced by a
    real decoder (PIL / torchaudio / pyav) in production. Deterministic so
    tests can golden-check the downstream plumbing."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.random(_FEATURE_DIM, dtype=np.float64)


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    Output: (media_id, media_type, feature array<double>, n_bytes int).
    Partitioning note: repartition upstream so each task holds
    O(batch_hint) blobs — binary columns dominate memory, not row count."""
    out_schema = (
        "media_id string, media_type string, feature array<double>, n_bytes int"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_impl(p, t).tolist()
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(fn, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing (STUB codec): passes payload through the batch
    pipeline and rewrites metadata; a real implementation decodes, resizes,
    re-encodes inside the same mapInPandas shape."""
    out_schema = MEDIA_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["media_type"] == "image"].copy()
            if len(img):
                img["width"] = width
                img["height"] = height
            yield img

    return media.mapInPandas(fn, out_schema)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (STUB: frame count derived from duration; real impl decodes frames)."""
    frames = media.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no decode): bytes/dims per type."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.max("width").alias("max_width"),
        F.max("duration_ms").alias("max_duration_ms"),
    )
