"""Distributed heavy hitters: per-partition SpaceSaving candidate
generation + exact verification of candidates only.

The classic two-phase frequent-items pattern (Metwally et al.'s
SpaceSaving run independently per partition): each task tracks at most
``m`` counters — BOUNDED memory however high the column's cardinality —
and emits its surviving candidate items. By pigeonhole, any item with
GLOBAL frequency > N/m must exceed n_p/m in at least one partition, so it
survives that partition's SpaceSaving and reaches the candidate union.
Phase 2 exact-counts the (small) candidate set via a broadcast semi-join,
so the final top-k is EXACT whenever the k-th item clears the N/m bar —
an approximate-machinery operator with a deterministic, oracle-checkable
result. At 100 TB: the full-cardinality groupBy this replaces shuffles
every distinct item; this shuffles only candidates (≤ m × n_partitions
rows) plus one broadcast.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spacesaving_candidates(items: DataFrame, col: str, m: int = 128) -> DataFrame:
    """Phase 1: per-partition SpaceSaving with ``m`` counters → distinct
    candidate values. Memory per task is O(m), independent of cardinality."""

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < m:
                    counters[v] = 1
                else:
                    # SpaceSaving eviction: replace the min counter, new
                    # item inherits min+1 (overestimates, never misses a
                    # true heavy hitter)
                    mk = min(counters, key=counters.get)
                    mv = counters.pop(mk)
                    counters[v] = mv + 1
        yield pd.DataFrame({col: list(counters.keys())})

    return items.mapInPandas(per_partition, f"{col} string").distinct()


def heavy_hitters_exact(
    items: DataFrame, col: str, k: int = 10, m: int = 128
) -> DataFrame:
    """Exact top-k frequent values via SpaceSaving candidates + exact
    count of candidates only. Output: (value, n) — identical to the full
    groupBy's top-k whenever the k-th frequency exceeds N/m (the operator
    asserts nothing weaker reaches the output: counts ARE exact because
    phase 2 recounts candidates over the full data)."""
    cands = spacesaving_candidates(items, col, m)
    counted = (
        items.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n"))
    )
    return counted.orderBy(F.desc("n"), F.asc(col)).limit(k)
