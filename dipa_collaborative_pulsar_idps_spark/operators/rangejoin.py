"""Binned interval (range) join — SURVEY.md §2.E "theta/range joins".

Join point-in-time rows to interval rows with ``start <= ts < end`` and NO
equi key. The naive plan is a broadcast-nested-loop / cartesian product —
O(|points|·|intervals|), a non-starter at 100 TB. This operator restores an
equi key by time-binning:

1. each point row gets ``bin = floor(epoch(ts) / w)``;
2. each interval row explodes to every bin it overlaps
   (``sequence(floor(start/w), floor(end_incl/w))``);
3. shuffle hash join on ``bin`` + residual range predicate.

A point's bin is unique, so each (point, interval) pair meets in exactly
one bin — no post-join dedup. Cost is O(points + intervals · span/w) with
a well-distributed shuffle key; pick ``bin_seconds`` near the typical
interval length so the explode factor stays ~1-2. Long-tail intervals fan
out linearly — cap them upstream or raise the bin width.

The reference has no range joins (its lookups are all tiny broadcast
dims, DIPA_Controller.py:441-444); this is part of the engine's extended
relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner join: rows of *points* × *intervals* with
    ``start <= ts < end`` (closed-open). Returns all columns of both
    inputs; column names must not collide (rename upstream)."""
    w = F.lit(int(bin_seconds)).cast("long")
    p = points.withColumn(
        "__bin",
        F.floor(F.unix_seconds(F.col(ts_col).cast("timestamp")) / w).cast("long"),
    )
    # end is exclusive: a bin is overlapped iff start's bin <= bin <= bin of
    # (end - 1 microsecond); guard empty intervals (start >= end) out early.
    i = (
        intervals.where(F.col(start_col) < F.col(end_col))
        .withColumn(
            "__bin_lo",
            F.floor(F.unix_seconds(F.col(start_col).cast("timestamp")) / w).cast(
                "long"
            ),
        )
        .withColumn(
            "__bin_hi",
            F.floor(
                (F.unix_micros(F.col(end_col).cast("timestamp")) - 1)
                / (w * F.lit(1_000_000).cast("long"))
            ).cast("long"),
        )
        .withColumn("__bin", F.explode(F.sequence("__bin_lo", "__bin_hi")))
        .drop("__bin_lo", "__bin_hi")
    )
    return (
        p.join(i, "__bin")
        .where((F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bin")
    )
