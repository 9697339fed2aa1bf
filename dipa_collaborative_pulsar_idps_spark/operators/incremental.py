"""Incremental aggregate maintenance (materialized-view refresh).

The 100 TB idiom the reference never needed but any warehouse at scale
does: a nightly/streaming summary must absorb a new partition WITHOUT
rescanning the base table. The algebra is the classic mergeable-partial
decomposition (the same one Spark's own partial→final HashAggregate
uses inside a single query, lifted to the storage layer so partials
persist BETWEEN jobs):

- sum/count:     merge by sum
- min/max:       merge by min/max
- avg:           derived at finalize time from (sum, count)
- distinct:      NOT exactly mergeable from counts — carry an HLL sketch
                 (`hll_sketch_agg`) and merge with `hll_union_agg`.

`partial_summary(new_partition)` → append/merge into the stored summary
via `merge_summaries` → `finalize_summary` for consumer-facing derived
columns. Correctness contract (oracle-certified by the
`incremental_priority_revenue` declared query and
tests/test_operators.py): merge(partials over any disjoint row split)
is IDENTICAL to the single-pass aggregate over the union.

Reference analogue: the running per-source totals the controller keeps
across polls (mean_dict accumulation, DIPA_Controller.py:479-481) are
exactly a persisted partial summary merged with each new poll's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Internal partial-summary column names for one measure.
_PARTIAL_COLS = ("n_rows", "n_notnull", "m_sum", "m_min", "m_max")


def partial_summary(df: DataFrame, keys: list[str], measure: str) -> DataFrame:
    """One grouped pass over a slice of the fact table → its mergeable
    partial summary. The measure column should already be exact-typed
    (cast doubles to DECIMAL upstream if bit-exact merges are required —
    float addition is not associative, decimals are)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(measure).alias("n_notnull"),
        F.sum(measure).alias("m_sum"),
        F.min(measure).alias("m_min"),
        F.max(measure).alias("m_max"),
    )


def merge_summaries(*parts: DataFrame) -> DataFrame:
    """Merge any number of partial summaries over disjoint row sets into
    the summary of their union — one shuffle over SUMMARY rows (corpus
    size never re-enters). Associative and commutative, so refreshes can
    cascade (day → month → year) without recomputation."""
    keys = [c for c in parts[0].columns if c not in _PARTIAL_COLS]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_notnull").alias("n_notnull"),
        F.sum("m_sum").alias("m_sum"),
        F.min("m_min").alias("m_min"),
        F.max("m_max").alias("m_max"),
    )


def finalize_summary(summary: DataFrame) -> DataFrame:
    """Consumer-facing view: derived avg (double — exact division of the
    decimal-exact sum by the count) beside the mergeable columns."""
    return summary.withColumn(
        "m_avg",
        F.when(
            F.col("n_notnull") > 0,
            F.col("m_sum").cast("double") / F.col("n_notnull"),
        ),
    )


def partial_distinct_sketch(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Mergeable distinct-count partial: an HLL sketch per group. Exact
    distinct counts do NOT merge from counts alone; the sketch is the
    scale answer (error ~1.6% default lgConfigK, constant bytes/group)."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col).alias("hll"))


def merge_distinct_sketches(*parts: DataFrame) -> DataFrame:
    """Union HLL partials; `estimate` is the merged approximate distinct."""
    keys = [c for c in parts[0].columns if c != "hll"]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = u.groupBy(*keys).agg(F.hll_union_agg("hll").alias("hll"))
    return merged.withColumn("estimate", F.hll_sketch_estimate("hll"))
