"""Skew-handling operators (SURVEY.md §6 build-plan phase 6: "skewed keys →
salting or AQE skew-join").

AQE's skew-join splitting covers joins; for AGGREGATIONS over heavily skewed
keys (one bot source producing 99% of telemetry — exactly the Mirai
workload), pre-aggregation under a salt bounds the per-task load:

    phase 1: groupBy(key, salt) partial-agg   (salt spreads the hot key)
    phase 2: groupBy(key) final-agg           (combines ≤ n_salts rows/key)

For algebraic aggregates (sum/count/min/max) the result is identical to the
direct groupBy; Spark's own partial aggregation already helps, but salting
also bounds the SHUFFLE partition size for the hot key — the thing that
OOMs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Two-phase salted sum: identical result to
    ``df.groupBy(*key_cols).sum(value_col)``, bounded shuffle-partition size.

    Salt is derived from a stable row attribute (hash of the value column),
    NOT rand() — keeps the operator deterministic and retry-safe."""
    out_col = out_col or f"sum_{value_col}"
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(out_col))


def salted_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 16, out_col: str = "n"
) -> DataFrame:
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*key_cols, salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(out_col))


def explode_salt_dim(small: DataFrame, n_salts: int = 16) -> DataFrame:
    """Replicate a small dimension across all salt values — the pair of
    :func:`salted_key` for skewed JOINs when AQE is unavailable:
    fact.withColumn('__salt', salted) ⋈ explode_salt_dim(dim) on key+__salt."""
    return small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
