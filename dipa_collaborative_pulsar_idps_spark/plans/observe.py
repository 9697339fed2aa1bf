"""Inline pipeline metrics via ``df.observe`` — counters computed INSIDE
the job that already runs, not by a second pass.

At 100 TB, "how many rows / how many nulls / total tokens did this write
ship?" must not cost another full scan; Spark's Observation API
accumulates aggregate expressions on the task path while the action (a
parquet write, a sink flush) executes. This is the engine's hook for the
report tables the reference logs per poll (TestCase_5/timeStamp.py:282-323)
— counts fall out of the batch that ran anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to *df*; read ``obs.get`` AFTER the
    next action over the returned frame. Metrics must be aggregate
    expressions (count/sum/avg/...), evaluated over exactly the rows the
    action consumed — free row-accounting for writes and sinks."""
    obs = Observation()
    names = list(metrics)
    return df.observe(obs, *[metrics[n].alias(n) for n in names]), obs
