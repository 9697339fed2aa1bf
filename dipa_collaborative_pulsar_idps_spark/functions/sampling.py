"""Bounded deterministic sampling — the shared training-sample contract of
every driver-side model fit (IVF coarse quantizer, PQ codebooks, PCA).

One id-hash thinning filter + one capped collect: driver traffic is
≤ ``cap`` rows in expectation whether the corpus is 500 rows or 1 B, the
selection is a pure function of (id, seed) — identical across runs,
engines, and partitionings — and every trainer samples THE SAME WAY, so
a change to the contract lands everywhere at once.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_sample(
    corpus: DataFrame,
    cap: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> np.ndarray:
    """Collect ≤ ~cap deterministically-chosen vectors as an (n, d) float64
    matrix. The hash filter thins BEFORE the collect, so the driver never
    sees more than the sampled fraction regardless of corpus size."""
    n = corpus.count()
    frac = min(1.0, cap / max(n, 1))
    sample_df = corpus.where(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
        < F.lit(int(frac * 1_000_000))
        if frac < 1.0
        else F.lit(True)
    )
    rows = sample_df.select(vec_col).collect()  # bounded-collect: ≤ ~cap rows via the hash filter above, corpus-size-independent
    return np.array([r[0] for r in rows], dtype=np.float64)
