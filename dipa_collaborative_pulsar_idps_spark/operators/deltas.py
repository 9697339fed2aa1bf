"""Batch counter-delta operator (SURVEY.md §2 C1-C3, §4 custom-op #1).

The reference computes per-flow rate as delta of cumulative OpenFlow
counters vs the previous poll (DIPA_Controller.py:461-463, state arrays
:134-135). Counters reset when a flow re-installs (idle/hard timeout
:222,:225) or a switch reboots — a raw lag() would emit negative deltas.
Rule: ``delta = counter - lag(counter)``; if negative → ``counter``
(the counter restarted from zero). First sample: delta = counter (the
reference seeds req1 with zeros).

Streaming form: streaming/state.counter_delta_stream (same semantics,
applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def counter_delta(
    df: DataFrame,
    key_cols: list[str],
    counter_col: str,
    order_cols: list[str],
    out_col: str = "delta",
) -> DataFrame:
    """Append *out_col*: per-key counter delta with reset detection.

    Scale: one shuffle on *key_cols* (window partition); no global sort.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    raw = F.col(counter_col) - F.coalesce(F.lag(counter_col).over(w), F.lit(0))
    delta = F.when(raw < 0, F.col(counter_col)).otherwise(raw)
    return df.withColumn(out_col, delta)


def rate(delta: Column, interval_s: float) -> Column:
    """C4/C5: per-second rate from a per-poll delta."""
    return delta / F.lit(float(interval_s))
