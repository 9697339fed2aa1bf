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
    assigned = _assign_to_centroids(corpus, cents)
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    )
    return assigned, centroids


def _assign_to_centroids(corpus: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, e) → (vec_id, e, list_id): nearest-centroid assignment in
    one Arrow pass, the centroid matrix closed over the UDF (tiny —
    O(k·d) — so every executor gets it with the task, no join)."""

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="int32")
        mat = np.array(v.tolist(), dtype=np.float64)
        dist = -2 * mat @ cents.T + (cents**2).sum(1)[None, :]  # ‖v‖² constant per row
        return pd.Series(dist.argmin(1).astype("int32"))

    return corpus.select("vec_id", "e", assign(F.col("e")).alias("list_id"))


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
    centroid table and the build-time quantization-error baseline
    (``stats/batch_id=base``) that :func:`ivf_append_batch` measures
    assignment drift against. Build once, serve many: the k-means pass is
    amortized across every subsequent query batch."""
    assigned.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/lists")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    err, n = quantization_error(assigned, centroids)
    _write_stats_row(centroids.sparkSession, path, "base", n, err)


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a persisted index: (assigned, centroids), search-ready. The
    serving relation is the base lists UNION any appended delta batches
    (``deltas/batch_id=*/list_id=*``) — both sides are hive-partitioned on
    list_id, so a probe's list filter still prunes to only the probed
    directories across base AND deltas."""
    assigned = spark.read.parquet(f"{path}/lists").select("vec_id", "e", "list_id")
    deltas = _read_deltas(spark, path)
    if deltas is not None:
        assigned = assigned.unionByName(deltas)
    centroids = spark.read.parquet(f"{path}/centroids")
    return assigned, centroids


def _read_deltas(spark, path: str) -> DataFrame | None:
    return _read_delta_dir(spark, f"{path}/deltas", ("vec_id", "e", "list_id"))


def _read_delta_dir(spark, root: str, cols: tuple[str, ...]) -> DataFrame | None:
    """The appended delta batches under *root*, or None when no batch was
    ever appended. Existence is checked through Hadoop's FileSystem API
    (not os.path), so the layout works unchanged on HDFS/S3 at cluster
    scale. Shared by the IVF (raw-vector) and IVF-PQ (code) layouts."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    return spark.read.parquet(root).select(*cols)


def read_index_stats(spark, path: str) -> tuple[dict, int]:
    """(base stats row as a dict, total appended row count) from the
    ``stats/batch_id=*`` commits — the inputs to the retrain triggers."""
    stats = spark.read.parquet(f"{path}/stats").collect()  # bounded-collect: one row per committed batch
    base = next(r for r in stats if r["batch_id"] == "base")
    appended_n = sum(r["n_vectors"] for r in stats if r["batch_id"] != "base")
    return (
        {"n_vectors": base["n_vectors"], "mean_sq_err": base["mean_sq_err"]},
        appended_n,
    )


def quantization_error(assigned: DataFrame, centroids: DataFrame) -> tuple[float, int]:
    """(mean squared L2 distance to the assigned centroid, row count) —
    one broadcast join + one aggregate, all JVM-side built-ins. This is
    the FAISS-style index-health number: it rises when incoming data
    drifts away from the trained centroids."""
    sq = F.aggregate(
        F.zip_with("e", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    row = (
        assigned.join(F.broadcast(centroids), "list_id")
        .agg(F.avg(sq).alias("err"), F.count("*").alias("n"))
        .collect()[0]  # bounded-collect: one scalar row
    )
    return (float(row["err"] or 0.0), int(row["n"]))


def _write_stats_row(spark, path: str, batch_id: str, n: int, err: float) -> None:
    """One (n, mean_sq_err) row at ``stats/batch_id=<id>`` — overwrite into
    the batch's own directory, so a replayed commit rewrites the same
    stamp instead of appending a duplicate (the exactly-once shape)."""
    spark.createDataFrame(
        [(n, err)], "n_vectors long, mean_sq_err double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats/batch_id={batch_id}")


def ivf_append_batch(
    spark,
    path: str,
    batch: DataFrame,
    batch_id: str,
    retrain_drift: float = 1.5,
    retrain_mass: float = 0.5,
) -> dict:
    """Append new vectors to a PERSISTED IVF index without retraining —
    the incremental-ingest path the text indexes (MinHash bands, TF-IDF
    postings) already have.

    ``batch``: (vec_id, e array<double>). Work is O(batch): assign against
    the SAVED centroids (one Arrow pass, centroid matrix in the UDF
    closure), write to ``deltas/batch_id=<id>/list_id=*/`` with mode
    overwrite — the batch's own directory is the idempotent commit stamp
    (a crashed or replayed batch rewrites the same directory, never
    double-appends; same exactly-once shape as the streaming dedup/TF-IDF
    sinks) — and record the batch's quantization error beside the build
    baseline.

    Returns drift stats including ``needs_retrain``, which trips when
    (a) the batch's mean squared quantization error exceeds
    ``retrain_drift`` × the build baseline (the data moved away from the
    trained centroids), or (b) appended mass exceeds ``retrain_mass`` ×
    the trained corpus (enough new data that k-means would place
    centroids differently). Retrain = build_ivf_index over
    load_ivf_index(...)[0] + save — the caller owns when."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()  # bounded-collect: n_list rows
    cents = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    assigned = _assign_to_centroids(batch.select("vec_id", "e"), cents)
    assigned.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/deltas/batch_id={batch_id}")
    # measure the COMMITTED batch (read-back, not the in-memory frame), so
    # the stat reflects exactly what serving will scan
    committed = spark.read.parquet(f"{path}/deltas/batch_id={batch_id}").select(
        "vec_id", "e", "list_id"
    )
    centroids = spark.read.parquet(f"{path}/centroids")
    batch_err, batch_n = quantization_error(committed, centroids)
    _write_stats_row(spark, path, batch_id, batch_n, batch_err)
    base, appended_n = read_index_stats(spark, path)
    drift = batch_err / base["mean_sq_err"] if base["mean_sq_err"] > 0 else 1.0
    appended_frac = appended_n / base["n_vectors"] if base["n_vectors"] else 0.0
    return {
        "batch_id": batch_id,
        "n_vectors": batch_n,
        "mean_sq_err": batch_err,
        "base_mean_sq_err": base["mean_sq_err"],
        "drift_ratio": round(drift, 4),
        "appended_frac": round(appended_frac, 4),
        "needs_retrain": drift > retrain_drift or appended_frac > retrain_mass,
    }
