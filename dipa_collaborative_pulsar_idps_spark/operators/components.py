"""Distributed connected components — near-dup CLUSTER formation.

Pair generators (MinHash-LSH, n-gram Jaccard, embedding cosine —
functions/dedup.py, functions/similarity.py) emit edges; deduplication
needs the transitive closure: every document keyed by its cluster, one
canonical survivor per cluster.

Algorithm: iterated PARTITION-LOCAL UNION-FIND CONTRACTION (the
two-level union-find used by large dedup pipelines, cf. the alternating
algorithm of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14):

1. hash-partition the edge set; inside each partition run union-by-min
   union-find over just that partition's edges (one ``mapInPandas``
   pass) → star edges (node, root), root = partition-local min id;
2. a node seen by several partitions welds their roots together, so the
   RESIDUAL graph for the next round is exactly
   {(min_root(x), other_root(x)) : x straddles partitions} — usually
   orders of magnitude smaller than the input;
3. compose the node→root map into the running labels (one keyed join)
   and repeat on the residual until it is empty.

Why this beats plain min-label propagation (and propagation + pointer
jumping, both measured here first): propagation costs one shuffle round
per graph-diameter hop — a 17-link near-dup chain took 17 rounds, and
pointer jumping over FIXED edges only halved that (random ids make the
label tree shallow). Contraction instead removes every intra-partition
path in a single pass, so rounds ≈ how often the residual shrinks by
the per-task edge budget — 2-3 rounds at any realistic scale. The
per-task state is a dict over one partition's edge endpoints, bounded
by ``edges_per_task`` (NOT by corpus size); labels and residuals are
keyed shuffles; the driver sees only one-row counts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _uf_contract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Union-find with path compression + union-by-min over ONE partition's
    edges (the iterator spans all Arrow batches of the partition). Emits
    (node, root) for every endpoint seen; union-by-min makes each tree's
    root the minimum member id, preserving component = min reachable id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for pdf in batches:
        for a, b in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    if parent:
        nodes = list(parent)
        yield pd.DataFrame(
            {"node": nodes, "root": [find(x) for x in nodes]}
        ).astype("int64")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 20,
    edges_per_task: int = 1_000_000,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    *edges* is undirected input (each pair once is enough); *nodes*
    optionally supplies the full vertex universe so isolated vertices get
    singleton components (component = themselves). ``edges_per_task``
    bounds per-task union-find memory (dict over ≤ 2·edges_per_task ids).
    """
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism

    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    # labels over the vertex universe; updated by composition each round.
    verts = cur.select(F.col("u").alias("node")).unionByName(
        cur.select(F.col("v").alias("node"))
    )
    if nodes is not None:
        verts = verts.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        )
    labels = (
        verts.distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        n_edges = cur.count()
        if n_edges == 0:
            break
        # size tasks to the RESIDUAL graph: 1 task while it fits the
        # per-task budget (single-pass finish), up to defaultParallelism.
        p = max(1, min(par, n_edges // edges_per_task + 1))
        local = (
            cur.repartition(p, "u")
            .mapInPandas(_uf_contract, "node long, root long")
            .localCheckpoint(eager=True)
        )
        # node→min root composition map (a node straddling partitions has
        # several roots; they are all in its component, take the min)...
        lmap = local.groupBy("node").agg(F.min("root").alias("root"))
        # ...and the residual graph: weld the remaining distinct roots of
        # each straddling node to its min root.
        cur = (
            local.join(lmap.withColumnRenamed("root", "mroot"), "node")
            .where(F.col("root") != F.col("mroot"))
            .select(F.col("mroot").alias("u"), F.col("root").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        labels = (
            labels.join(
                lmap.select(
                    F.col("node").alias("__ln"), F.col("root").alias("__lr")
                ),
                labels["component"] == F.col("__ln"),
                "left",
            )
            .select(
                "node", F.coalesce("__lr", "component").alias("component")
            )
            .localCheckpoint(eager=True)
        )
    return labels
