"""Distributed order statistics: exact interpolated quantiles without a
single-task value buffer.

Spark's exact ``percentile`` aggregate is a TypedImperativeAggregate —
every value lands in ONE final aggregation buffer, which at 100 TB is an
executor-OOM, not a slow path. This operator computes the SAME
PERCENTILE_CONT values (verified to 1e-9 against ``F.percentile`` in
tests) with only scalable pieces: one range shuffle, per-partition
counts, broadcast prefix offsets, and a lookup of the ≤ 2·|qs| rows
sitting at the target sorted positions — the distributed-selection form
of the engine's prefix-sum family (`token_shard_assignment_scalable`,
`global_row_ids_scalable`).

The count branch and the selection branch share one Exchange (Spark
reuses the identical shuffle subtree), so the data is range-partitioned
once. Ties are safe: row_number breaks them arbitrarily but the VALUE at
any global sorted index is unique by definition.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame, col: str, qs: list[float], n_parts: int = 64
) -> list[float]:
    """PERCENTILE_CONT(q) for each q in ``qs`` over ``df[col]``
    (non-null values), returned as driver-side floats (|qs| numbers —
    this is an aggregate result, not a dataset)."""
    vals = df.select(F.col(col).alias("p")).where(F.col("p").isNotNull())
    n = vals.count()
    if n == 0:
        return [float("nan")] * len(qs)
    rs = [(n - 1) * q for q in qs]
    need = sorted({i for r in rs for i in (math.floor(r), math.ceil(r))})
    d = vals.repartitionByRange(n_parts, "p").withColumn(
        "pid", F.spark_partition_id()
    )
    counts = d.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("off")
    )
    wl = Window.partitionBy("pid").orderBy("p")
    sel = (
        d.join(F.broadcast(offsets), "pid")
        .withColumn("gidx", F.col("off") + F.row_number().over(wl) - 1)
        .where(F.col("gidx").isin([int(x) for x in need]))
        .select("gidx", "p")
    )
    at = {int(r.gidx): float(r.p) for r in sel.collect()}  # bounded-collect: ≤ 2·|qs| rows
    out = []
    for r in rs:
        lo, hi = math.floor(r), math.ceil(r)
        out.append(at[lo] + (r - lo) * (at[hi] - at[lo]))
    return out
