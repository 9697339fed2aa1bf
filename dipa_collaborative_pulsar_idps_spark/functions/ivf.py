"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path beside hyperplane LSH (functions/similarity.py).

Build (the FAISS-style recipe): train k-means centroids on a BOUNDED
sample (≤ ``sample_per_list``·n_list rows — driver memory is O(k·d)
regardless of corpus size, the standard coarse-quantizer training move),
then assign the FULL corpus distributed: centroid matrix closed over the
Arrow UDF, one argmin matmul per batch. Search: score a query only against
the vectors in its ``n_probe`` nearest lists — scanned fraction ≈
n_probe / n_list.

At 100 TB: the centroid table is tiny (broadcast); assignment is one pass;
the probe join shuffles only on list ids. Lists should be written
partitioned by list_id so a probe prunes partitions at scan time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_cols, grouped_topk_scores, topk


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 25) -> np.ndarray:
    """Seeded k-means++ init + Lloyd until convergence — pure numpy on the
    (bounded) training sample. Empty clusters are re-seeded to the point
    farthest from its centroid, so exactly k non-degenerate lists emerge."""
    rng = np.random.default_rng(seed)
    n = len(x)
    cents = np.empty((k, x.shape[1]))
    cents[0] = x[rng.integers(n)]
    d2 = ((x - cents[0]) ** 2).sum(1)
    for j in range(1, k):  # k-means++: sample ∝ squared distance
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents[j] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((x - cents[j]) ** 2).sum(1))
    for _ in range(iters):
        dist = (x**2).sum(1)[:, None] - 2 * x @ cents.T + (cents**2).sum(1)[None, :]
        labels = dist.argmin(1)
        new = np.empty_like(cents)
        for j in range(k):
            members = x[labels == j]
            if len(members):
                new[j] = members.mean(0)
            else:
                new[j] = x[dist.min(1).argmax()]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def build_ivf_index(
    corpus: DataFrame,
    dim: int,
    n_list: int = 16,
    seed: int = 42,
    sample_per_list: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assigned_corpus, centroids).

    assigned_corpus: (vec_id, e, list_id) — corpus with inverted-list id.
    centroids: (list_id, centroid array<double>) — tiny, broadcastable.

    Training collects at most ``sample_per_list * n_list`` vectors chosen
    by a deterministic id-hash — bounded driver traffic by construction
    (NOT a corpus collect; at 1 B rows this is still ≤ 4096 rows for the
    default n_list=16). Assignment streams the corpus through one Arrow
    pass with the centroid matrix in the UDF closure."""
    from .sampling import bounded_sample

    x = bounded_sample(corpus, sample_per_list * n_list, seed)
    cents = _lloyd(x, n_list, seed)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="int32")
        mat = np.array(v.tolist(), dtype=np.float64)
        dist = -2 * mat @ cents.T + (cents**2).sum(1)[None, :]  # ‖v‖² constant per row
        return pd.Series(dist.argmin(1).astype("int32"))

    assigned = corpus.select("vec_id", "e", assign(F.col("e")).alias("list_id"))
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k by cosine, scanning only the n_probe nearest inverted lists.

    queries: (query_id, qe array<double>). Output: like similarity.topk.
    """
    q_cent = (
        F.broadcast(queries)
        .join(F.broadcast(centroids))
        .select(
            "query_id",
            "qe",
            "list_id",
            cosine_cols(F.col("qe"), F.col("centroid")).alias("c_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("list_id"))
    probes = (
        q_cent.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= n_probe)
        .select("list_id", "query_id", "qe")
    )
    # Cogroup on list_id: each inverted list's vectors cross one Arrow
    # boundary once (not once per probing query), BLAS-scored per list with
    # per-list top-k — the global window then merges n_probe·k id rows per
    # query instead of every candidate (see grouped_topk_scores).
    scored = grouped_topk_scores(
        assigned.select("list_id", "vec_id", "e"), probes, k, key="list_id"
    )
    return topk(scored, k)


def save_ivf_index(assigned: DataFrame, centroids: DataFrame, path: str) -> None:
    """Persist the index: inverted lists hive-partitioned by ``list_id`` —
    the layout that makes a probe a PARTITION-PRUNED scan (only the
    n_probe list directories are read; asserted in tests) — plus the tiny
    centroid table. Build once, serve many: the k-means pass is amortized
    across every subsequent query batch."""
    assigned.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/lists")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a persisted index: (assigned, centroids), search-ready."""
    assigned = spark.read.parquet(f"{path}/lists").select("vec_id", "e", "list_id")
    centroids = spark.read.parquet(f"{path}/centroids")
    return assigned, centroids
