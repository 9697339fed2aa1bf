"""PCA low-rank projection for embedding columns — the dimensionality-
reduction member of the embedding-ops family (int8 quantization, PQ,
IVF/LSH ANN live beside it).

Train on a BOUNDED deterministic sample (the same collect-cap move as IVF
and PQ training): center + SVD give the top-k principal directions and
their explained-variance ratios; the projection itself streams the corpus
through one Arrow map pass with the (k × d) component matrix in the UDF
closure. At 100 TB: the trained model is O(k·d) — broadcast-sized — and
projection is map-only; downstream ANN then runs in k dims instead of d
(the standard recall/compute trade).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_pca(
    corpus: DataFrame,
    dim: int,
    k: int,
    seed: int = 42,
    sample_cap: int = 4096,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (mean (d,), components (k, d) row-orthonormal, explained
    variance ratio (k,)) from an ≤ sample_cap deterministic sample."""
    from .sampling import bounded_sample

    x = bounded_sample(corpus, sample_cap, seed)
    mean = x.mean(0)
    # SVD of the centered sample: rows of Vt are the principal directions.
    # Sign-fix each component (largest-|coord| entry positive) so the model
    # is deterministic across LAPACK builds.
    _, s, vt = np.linalg.svd(x - mean, full_matrices=False)
    comp = vt[:k]
    signs = np.sign(comp[np.arange(len(comp)), np.abs(comp).argmax(1)])
    signs[signs == 0] = 1.0
    comp = comp * signs[:, None]
    var = s**2
    ratio = var[:k] / var.sum() if var.sum() > 0 else np.zeros(k)
    return mean, comp, ratio


def pca_project(
    corpus: DataFrame, mean: np.ndarray, components: np.ndarray
) -> DataFrame:
    """(vec_id, e) → (vec_id, proj array<double>): one Arrow map pass,
    proj = (e - mean) @ componentsᵀ. Map-only — no shuffle."""

    @F.pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        mat = np.array(v.tolist(), dtype=np.float64)
        out = (mat - mean) @ components.T
        return pd.Series(list(out))

    return corpus.select("vec_id", proj(F.col("e")).alias("proj"))


def pca_reconstruct(
    projected: DataFrame, mean: np.ndarray, components: np.ndarray
) -> DataFrame:
    """(vec_id, proj) → (vec_id, recon array<double>): recon =
    mean + proj @ components. With k = d (full rank) this is exact up to
    float error — the oracle-checkable certifier configuration."""

    @F.pandas_udf("array<double>")
    def recon(p: pd.Series) -> pd.Series:
        if not len(p):
            return pd.Series([], dtype=object)
        mat = np.array(p.tolist(), dtype=np.float64)
        out = mean + mat @ components
        return pd.Series(list(out))

    return projected.select("vec_id", recon(F.col("proj")).alias("recon"))
