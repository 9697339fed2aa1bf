"""Distributed connected components — near-dup CLUSTER formation.

Pair generators (MinHash-LSH, n-gram Jaccard, embedding cosine —
functions/dedup.py, functions/similarity.py) emit edges; deduplication
needs the transitive closure: every document keyed by its cluster, one
canonical survivor per cluster. This is small-label propagation:

    label(v) ← min(label(v), min label of v's neighbors)   until fixpoint

Each iteration is one shuffle (join on node) + one aggregation; rounds =
graph diameter, and near-dup graphs are shallow (dup clusters are small
and dense), so 3-5 rounds typically converge. ``localCheckpoint`` after
each round truncates the lineage so plans don't grow exponentially.
At 100 TB the same loop holds: labels and edges are both keyed shuffles;
no driver-side data beyond the one-row convergence count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    *edges* is undirected input (each pair once is enough); *nodes*
    optionally supplies the full vertex universe so isolated vertices get
    singleton components (component = themselves).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    # size the loop's shuffles to the graph, not the session default: the
    # edge set is usually tiny relative to the corpus that produced it, and
    # per-round fixed cost on oversized shuffles dominates small graphs.
    n_edges = sym.count()
    parts = max(2, min(sym.sparkSession.sparkContext.defaultParallelism, n_edges // 50_000 + 1))
    sym = sym.repartition(parts, "u").localCheckpoint(eager=True)

    verts = sym.select(F.col("u").alias("node")).distinct()
    if nodes is not None:
        verts = nodes.select(F.col(nodes.columns[0]).alias("node")).unionByName(
            verts
        ).distinct()
    labels = (
        verts.repartition(parts, "node")
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min label among each node's neighbors
        nbr_min = (
            labels.join(sym, labels["node"] == sym["u"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.where(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels
