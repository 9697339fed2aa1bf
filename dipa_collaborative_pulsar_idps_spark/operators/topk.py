"""Top-k operators (SURVEY.md §2 G + H5).

- global top-k: orderBy+limit → Spark plans TakeOrderedAndProject
  (per-partition heap + driver merge, NO global sort);
- per-group top-k: row_number window, rank ≤ k.
Always pass tie-breaker columns — a non-total order makes top-k
non-deterministic across runs/partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column], k: int, rank_col: str = "rk"
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
