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
    if radius >= n_planes:
        # exhaustive probing: every bucket — ann_topk_lsh degenerates to the
        # exact brute-force result (the oracle-checkable configuration).
        return list(range(1 << n_planes))
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
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via DISTRIBUTED block self-join —
    (keep_id, dup_id, cosine) with keep_id < dup_id.

    The HOF expression path (``zip_with``/``aggregate``) interprets per
    element: N²·d lambda evaluations (~18 s for 2 k×64 at sf0.1). Here:

    1. every vector is hash-assigned to one of B blocks;
    2. each block is gathered into a single row (one ``collect_list``);
    3. each block row is exploded to its B(B+1)/2 unordered block-pair keys
       (left role for (b, j≥b), right role for (i≤b, b)) — a plain hash
       shuffle on the pair key, NO broadcast and NO nested-loop join;
    4. ``applyInPandas`` per pair computes ``A @ Bᵀ`` in BLAS and keeps
       pairs ≥ threshold.

    Nothing touches the driver and no task holds more than two blocks:
    per-task memory = 2·(N/B)·d·8 bytes; each block is shuffled to ≤ B+1
    tasks (the inherent replication of exact all-pairs blocking). At 100 TB
    set ``n_blocks`` so a block fits executor memory (e.g. 1 M rows × 1 k
    dims ≈ 8 GB corpus → B = 64 gives two ~125 MB blocks per task). Exact
    same pair set as the expression path to float precision (tested).
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    par = spark.sparkContext.defaultParallelism
    B = int(n_blocks) if n_blocks else max(4, math.ceil(math.sqrt(4 * par)))
    thr = float(threshold)

    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("blk"),
    )
    grouped = v.groupBy("blk").agg(
        F.collect_list(F.struct("id", "vec")).alias("rows")
    )
    left = grouped.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("bj"),
        F.lit("a").alias("role"),
        "rows",
    )
    right = grouped.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit("b").alias("role"),
        "rows",
    )
    tasks = left.unionByName(right)

    def compute(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"keep_id": [], "dup_id": [], "cosine": []})
        by_role = {r.role: r.rows for r in pdf.itertuples()}
        if "a" not in by_role or "b" not in by_role:
            return empty  # partner block hashed empty
        diagonal = key[0] == key[1]

        def unpack(rows):
            ids = np.fromiter((r["id"] for r in rows), dtype=np.int64, count=len(rows))
            mat = np.array([r["vec"] for r in rows], dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            return ids, mat

        aid, amat = unpack(by_role["a"])
        bid, bmat = unpack(by_role["b"])
        sims = amat @ bmat.T
        mask = sims >= thr
        # one unordered pair appears in exactly one block-pair task; within
        # the diagonal task both (x,y) and (y,x) index the same matrix, so
        # keep the strict upper triangle by id there.
        mask &= aid[:, None] < bid[None, :] if diagonal else aid[:, None] != bid[None, :]
        ai, bj = np.nonzero(mask)
        if not len(ai):
            return empty
        x, y = aid[ai], bid[bj]
        return pd.DataFrame(
            {
                "keep_id": np.minimum(x, y),
                "dup_id": np.maximum(x, y),
                "cosine": sims[ai, bj],
            }
        )

    return tasks.groupBy("bi", "bj").applyInPandas(
        compute, "keep_id long, dup_id long, cosine double"
    )
