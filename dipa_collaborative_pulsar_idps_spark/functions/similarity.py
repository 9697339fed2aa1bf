"""Similarity search over embedding columns (SURVEY.md §7 Phase 6).

Two paths:
- exact brute-force cosine top-k (the baseline; queries/datapipe2.py) —
  broadcast the query batch, one pass over the corpus;
- LSH-bucketed ANN: random-hyperplane signatures → bucket join with
  multi-probe expansion → exact cosine only on candidates. At 100 TB the
  corpus side is scanned once and shuffled only on small bucket keys.

All randomness is a fixed-seed hyperplane family — reproducible runs.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_scores(corpus: DataFrame, queries: DataFrame) -> DataFrame:
    """Exact cosine of every (query, corpus) pair.

    corpus: (vec_id, e array<double>); queries: (query_id, qe array<double>).
    Query side is broadcast — corpus streams through one stage, repartitioned
    off the scan so the dot products spread across cores."""
    n_part = corpus.sparkSession.sparkContext.defaultParallelism
    return (
        F.broadcast(queries)
        .join(corpus.repartition(n_part, "vec_id"), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e")))).alias(
                "cosine"
            ),
        )
    )


def topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def hyperplane_signature(df: DataFrame, vec_col: str, dim: int, n_planes: int = 8) -> DataFrame:
    """Add a ``bucket`` int column: sign bits of dot(vec, plane_j)."""
    planes = _planes(dim, n_planes)
    sig = None
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(w) for w in p])
        bit = F.when(_dot(F.col(vec_col), plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.withColumn("bucket", sig.cast("int"))


def _probe_masks(n_planes: int, radius: int) -> list[int]:
    masks = [0]
    if radius >= 1:
        masks += [1 << j for j in range(n_planes)]
    if radius >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)
        ]
    return masks


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: hyperplane buckets + multi-probe (flip up to
    *probe_radius* sign bits), exact cosine on candidates only.

    corpus: (vec_id, e); queries: (query_id, qe). Output like :func:`topk`.
    Scanned fraction ≈ Σ C(n_planes, r≤radius) / 2^n_planes of the corpus.
    """
    c_sig = hyperplane_signature(corpus.withColumnRenamed("e", "e"), "e", dim, n_planes)
    q_sig = hyperplane_signature(
        queries.withColumnRenamed("qe", "qe").withColumn("e", F.col("qe")), "e", dim, n_planes
    ).drop("e")
    masks = _probe_masks(n_planes, probe_radius)
    probed = q_sig.withColumn(
        "probe_bucket",
        F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])),
    )
    cand = (
        F.broadcast(probed)
        .join(
            c_sig,
            (F.col("probe_bucket") == c_sig["bucket"])
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "qe", "vec_id", "e")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e")))).alias(
            "cosine"
        ),
    )
    return topk(scored, k)


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Fraction of exact top-k pairs recovered by the approximate result."""
    e = exact.where(F.col("rk") <= k).select("query_id", "neighbor_id")
    a = approx.where(F.col("rk") <= k).select("query_id", "neighbor_id")
    hits = e.join(a, ["query_id", "neighbor_id"], "left_semi").count()
    total = e.count()
    return hits / total if total else math.nan


def cosine_pairs_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked matrix multiply —
    (keep_id, dup_id, cosine) with keep_id < dup_id.

    The HOF expression path (``zip_with``/``aggregate``) interprets per
    element: N²·d lambda evaluations (~18 s for 2 k×64 at sf0.1). Here the
    row-normalized corpus matrix is broadcast once (n·d·8 bytes — 2 k×64 ≈
    1 MB; bound: must fit executor memory, beyond that use the LSH/IVF
    candidate paths) and each partition's block computes ``block @ corpusᵀ``
    in BLAS through mapInPandas — one corpus scan, no shuffle, ~vectorized
    throughout. Same semantics as the expression path to float precision.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = float(threshold)

    def block_pairs(batches):
        corpus_ids, corpus = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            qid = pdf[id_col].to_numpy(dtype=np.int64)
            sims = q @ corpus.T
            qi, cj = np.nonzero((sims >= thr) & (qid[:, None] < corpus_ids[None, :]))
            yield pd.DataFrame(
                {
                    "keep_id": qid[qi],
                    "dup_id": corpus_ids[cj],
                    "cosine": sims[qi, cj],
                }
            )

    n_part = spark.sparkContext.defaultParallelism
    return emb.select(id_col, vec_col).repartition(n_part, id_col).mapInPandas(
        block_pairs, "keep_id long, dup_id long, cosine double"
    )
