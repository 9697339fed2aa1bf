"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path beside hyperplane LSH (functions/similarity.py).

Build: k-means over the corpus (pyspark.ml, seeded → deterministic) gives
n_list centroids; every vector is assigned to its nearest centroid (the
"inverted list"). Search: score a query only against the vectors in its
``n_probe`` nearest lists — scanned fraction ≈ n_probe / n_list.

At 100 TB: the centroid table is tiny (broadcast); assignment is one pass;
the probe join shuffles only on list ids. Lists should be written
partitioned by list_id so a probe prunes partitions at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dot, _norm, topk


def _to_ml_vector(df: DataFrame, arr_col: str, out_col: str = "features") -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(arr_col)))


def build_ivf_index(
    corpus: DataFrame, dim: int, n_list: int = 16, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Returns (assigned_corpus, centroids).

    assigned_corpus: (vec_id, e, list_id) — corpus with inverted-list id.
    centroids: (list_id, centroid array<double>) — tiny, broadcastable.
    """
    from pyspark.ml.clustering import KMeans

    ml = _to_ml_vector(corpus, "e")
    model = KMeans(k=n_list, seed=seed, featuresCol="features").fit(ml)
    assigned = (
        model.transform(ml)
        .withColumnRenamed("prediction", "list_id")
        .select("vec_id", "e", "list_id")
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
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
            (_dot(F.col("qe"), F.col("centroid"))
             / (_norm(F.col("qe")) * _norm(F.col("centroid")))).alias("c_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("list_id"))
    probes = (
        q_cent.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= n_probe)
        .select("query_id", "qe", "list_id")
    )
    cand = F.broadcast(probes).join(assigned, "list_id").where(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e")))).alias(
            "cosine"
        ),
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
