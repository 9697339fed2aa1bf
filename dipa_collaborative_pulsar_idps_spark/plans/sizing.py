"""Data-proportional partition sizing (the 100 TB discipline, both ways).

A fixed ``repartition(defaultParallelism)`` is wrong at BOTH ends of the
scale: at test SFs it shreds a 1 MB corpus into 32 overhead-dominated
shards (each paying task launch + Arrow round-trip for ~60 rows), and on a
real cluster it UNDER-partitions once the input outgrows
cores × maxPartitionBytes. The right count is proportional to the data:

    n = clamp(plan_size / bytes_per_partition, 1, defaultParallelism × fan)

``plan_size`` comes from Catalyst's own statistics (the same estimate the
planner uses for broadcast decisions) — no Spark job, works on any lineage,
and reflects column pruning already applied to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan (file size for bare
    scans, scaled through projections/filters). No job is triggered."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def sized_partition_count(
    df: DataFrame,
    *,
    bytes_per_partition: int = 8 << 20,
    inflate: float = 1.0,
    fan: int = 1,
) -> int:
    """Partition count proportional to estimated bytes × ``inflate``.

    ``inflate`` accounts for downstream row expansion the optimizer cannot
    see (shingle/perm explodes, block self-joins); ``fan`` lifts the
    defaultParallelism clamp for compute-bound stages that want more waves.
    """
    spark = df.sparkSession
    cap = max(1, spark.sparkContext.defaultParallelism * fan)
    est = max(1.0, plan_size_bytes(df) * inflate)
    return int(max(1, min(cap, -(-est // bytes_per_partition))))


def right_size(
    df: DataFrame,
    *cols: str,
    bytes_per_partition: int = 8 << 20,
    inflate: float = 1.0,
    fan: int = 1,
) -> DataFrame:
    """``repartition`` to a data-proportional count — by key when ``cols``
    given (co-location for a downstream keyed op), round-robin otherwise."""
    n = sized_partition_count(
        df, bytes_per_partition=bytes_per_partition, inflate=inflate, fan=fan
    )
    return df.repartition(n, *cols) if cols else df.repartition(n)
