"""Scalar quantization (SQ8) — the FAISS ``IndexScalarQuantizer``
(QT_8bit) production point between Flat (1×, exact) and PQ (32×, lossy
ranking): each dimension is linearly quantized to one uint8 against
per-dimension [min, max] bounds learned from the corpus — 8× compression
at float64 (4× at float32) with near-exact recall, because the per-dim
error is bounded by range/510.

Unlike every other quantizer in this engine (k-means coarse/fine
codebooks, hyperplane LSH), SQ training is a DETERMINISTIC aggregate —
one distributed min/max pass, no sampling, no iteration — so the whole
index (train → encode → dequantized scoring) is SQL-expressible and the
declared query carries a full DuckDB value oracle (queries/datapipe3.py),
not just a recall floor.

At 100 TB: training is one JVM-side agg (2·d scalars to the driver);
encoding is a map-only Arrow pass; search reads only the code column
(d bytes/row) and dequantizes per batch inside the kernel — the scan is
8× less I/O for one transient B×d float materialization per Arrow batch.
Rounding is ``floor(x + 0.5)`` (NOT banker's rounding) so the Spark
kernel and the SQL oracle quantize identically bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pq import _MAX_QUERY_BATCH
from .similarity import topk

_LEVELS = 255  # uint8 code range [0, 255]


def train_sq(corpus: DataFrame, dim: int, vec_col: str = "e") -> np.ndarray:
    """Per-dimension [min, max] bounds — one distributed agg pass (2·d
    scalar expressions, JVM-side), returned as a ``(2, dim)`` float64
    array. Deterministic: no sample, no seed."""
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.col(vec_col)[i]).alias(f"mn{i}"))
        aggs.append(F.max(F.col(vec_col)[i]).alias(f"mx{i}"))
    row = corpus.agg(*aggs).collect()[0]  # bounded-collect: one row of 2·dim scalars
    vmin = np.array([row[2 * i] for i in range(dim)], dtype=np.float64)
    vmax = np.array([row[2 * i + 1] for i in range(dim)], dtype=np.float64)
    return np.stack([vmin, vmax])


def _scale(bounds: np.ndarray) -> np.ndarray:
    """Per-dim range with the zero-range guard (constant dims encode to
    code 0 and reconstruct exactly to the constant)."""
    s = bounds[1] - bounds[0]
    return np.where(s == 0.0, 1.0, s)


def sq_encode(
    corpus: DataFrame, bounds: np.ndarray, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Encode (vec_id, e) → (vec_id, *keep, codes array<int> of uint8
    values) — map-only Arrow pass, bounds in the closure. Out-of-range
    values (serving vectors beyond the trained bounds) clip to [0, 255],
    matching FAISS."""
    vmin = bounds[0]
    s = _scale(bounds)

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        mat = np.array(v.tolist(), dtype=np.float64)
        codes = np.floor((mat - vmin) / s * _LEVELS + 0.5)  # floor(x+0.5): ties away from even, = the SQL oracle
        return pd.Series(list(np.clip(codes, 0, _LEVELS).astype(np.int32)))

    return corpus.select("vec_id", *keep, enc(F.col("e")).alias("codes"))


def sq_reconstruct(bounds: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Dequantize code rows: vmin + code/255 · range."""
    return bounds[0] + codes.astype(np.float64) / _LEVELS * _scale(bounds)


def sq_search(
    encoded: DataFrame,
    bounds: np.ndarray,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Top-k scan over SQ codes: exact cosine between each query and every
    DEQUANTIZED vector (the same score-the-reconstruction contract as the
    ADC scan, pinned bit-level by the oracle). queries: (query_id, qe),
    bounded like the ADC serving batch; each corpus partition dequantizes
    its codes batch-at-a-time and emits only per-partition top-k."""
    q_rows = queries.limit(_MAX_QUERY_BATCH + 1).collect()  # bounded-collect: serving batch ≤ _MAX_QUERY_BATCH
    if len(q_rows) > _MAX_QUERY_BATCH:
        raise ValueError(
            f"query batch exceeds {_MAX_QUERY_BATCH}; chunk the serving batch"
        )
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int"
        )
    q_ids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.qe for r in q_rows], dtype=np.float64)
    q_unit = q_mat / np.maximum(
        np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12
    )
    vmin, s = bounds[0], _scale(bounds)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.float64)
            recon = vmin + codes / _LEVELS * s  # (B, d) — transient, per batch
            norms = np.maximum(np.linalg.norm(recon, axis=1), 1e-12)
            cos = q_unit @ (recon / norms[:, None]).T
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out_q, out_n, out_c = [], [], []
            for row, q in enumerate(q_ids):
                keep = vec_ids != q
                sc, ids = cos[row, keep], vec_ids[keep]
                part = np.lexsort((ids, -sc))[:k]
                out_q.append(np.full(len(part), q))
                out_n.append(ids[part])
                out_c.append(sc[part])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    return topk(
        encoded.mapInPandas(scan, "query_id long, neighbor_id long, cosine double"),
        k,
    )


def save_sq(spark, bounds: np.ndarray, path: str) -> None:
    """Persist the SQ bounds (2 rows of d doubles — tiny) — same
    train-once/serve-many contract as the PQ codebooks."""
    rows = [(int(i), [float(x) for x in bounds[i]]) for i in range(2)]
    spark.createDataFrame(rows, "i int, vals array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_sq(spark, path: str) -> np.ndarray:
    """Load bounds persisted by :func:`save_sq` (bit-exact round-trip)."""
    rows = spark.read.parquet(path).collect()  # bounded-collect: 2 bounds rows
    out = np.empty((2, len(rows[0].vals)), dtype=np.float64)
    for r in rows:
        out[r.i] = r.vals
    return out
