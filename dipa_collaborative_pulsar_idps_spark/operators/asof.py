"""As-of join (SURVEY.md §2.E "absent join shapes the engine must ship").

For each left row, attach the latest right row with ``right.ts <= left.ts``
within the same key — the "nearest prior poll" lookup.

Implementation: union both sides tagged, ONE window pass with
last(ignorenulls) — a single shuffle on the key, no per-row range probe.
This is the 100 TB-friendly plan: the naive correlated-subquery or range
join is O(n·m) per key; this is O((n+m) log) via sort within partitions.

Tie policy is pinned: at identical ts, right rows sort BEFORE left rows
(a same-instant right row is visible to the left row); ties beyond that
break by the ``seq_cols``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    seq_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Columns of *left* + ``<value_col><suffix>`` carried from the latest
    prior *right* row (NULL if none). *value_cols* are right-side columns;
    *seq_cols* break remaining ties deterministically."""
    seq_cols = seq_cols or []
    lt = left.withColumn("__side", F.lit(1))
    rt = right.withColumn("__side", F.lit(0))
    carried_names = [f"{c}{suffix}" for c in value_cols]
    l_cols = [c for c in left.columns]
    combined = lt.select(
        *on,
        ts_col,
        "__side",
        *[F.col(c) for c in l_cols if c not in on and c != ts_col],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    ).unionByName(
        rt.select(
            *on,
            ts_col,
            "__side",
            *[
                F.lit(None).cast(dict(lt.dtypes)[c]).alias(c)
                for c in l_cols
                if c not in on and c != ts_col
            ],
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "__side", *seq_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c, out in zip(value_cols, carried_names):
        combined = combined.withColumn(
            out, F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return combined.where(F.col("__side") == 1).select(*l_cols, *carried_names)
