"""Declared multimodal queries: the binary-column pipeline (decode →
resize → feature-extract → aggregate) over a deterministic synthetic media
corpus sized by the scale factor.

Rows-only checks (no SQL oracle: binary codecs aren't SQL-expressible);
the codec kernels themselves are golden-tested in tests/test_operators.py
(known-pixel images, sine-wave WAVs, hand-built BMP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import media_feature_pipeline, synthetic_media
from ..tables import Tables
from .registry import query


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media corpus scaled like the documents table (¼ of its rows) so the
    query grows with sf; payloads are real encoded PPM/WAV bytes rendered
    distributed (mapInPandas over spark.range — no driver blobs)."""
    n_docs = Tables(spark, sf_dir).documents.count()
    return synthetic_media(spark, max(60, n_docs // 4))


@query("media_feature_stats", survey="ext-multimodal,K1,K2")
def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: resize images to 16×16 (real decode +
    nearest resample + re-encode), extract per-modality features (real
    channel stats / audio RMS; video stubbed), aggregate per media_type.
    Uses the FUSED decode→resize→feature operator (one Arrow pass; the
    composed resize_images∘extract_features form is proven equivalent in
    tests/test_operators.py). avg_feat0 doubles as an embedded correctness
    probe: for images it is the post-resize width (16.0), for audio the
    sample rate (16000.0)."""
    feats = media_feature_pipeline(_corpus(spark, sf_dir), 16, 16)
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_feat0"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
    )
