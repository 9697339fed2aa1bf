"""Side-effect sinks (SURVEY.md §2 A9/A10, I12).

The reference applies mitigations imperatively (flow-rule writes + ovs-vsctl
QoS, DIPA_Controller.py:213-226,376-413) with at-least-once Pulsar delivery
(ack after action :416). The engine's contract: **effective exactly-once**
— checkpointing gives at-least-once micro-batches, and the action sink
deduplicates on an idempotency key, so replays are no-ops.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: An action application function: receives ONLY actions not yet applied.
ActionFn = Callable[[list], None]


class MitigationSink:
    """foreachBatch sink with idempotency-key dedup.

    Applied keys persist as parquet under ``ledger_path`` (the analogue of
    the switch's installed-rule table); a replayed micro-batch joins
    anti-style against the ledger, so each (action, target) fires once.
    """

    def __init__(self, ledger_path: str, key_cols: list[str], apply_fn: ActionFn | None = None):
        self.ledger_path = ledger_path
        self.key_cols = key_cols
        self.apply_fn = apply_fn
        self.applied_batches: list[int] = []

    def _ledger(self, spark):
        if os.path.isdir(self.ledger_path) and any(
            f.endswith(".parquet") for f in os.listdir(self.ledger_path)
        ):
            return spark.read.parquet(self.ledger_path)
        return None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        key = F.concat_ws("§", *self.key_cols).alias("__key")
        actions = batch_df.withColumn("__key", key)
        ledger = self._ledger(spark)
        if ledger is not None:
            actions = actions.join(ledger, "__key", "left_anti")
        new_rows = actions.collect()
        if not new_rows:
            return
        if self.apply_fn is not None:
            self.apply_fn(new_rows)  # side effect: rule install / QoS call
        spark.createDataFrame(
            [(r["__key"],) for r in new_rows], "__key string"
        ).write.mode("append").parquet(self.ledger_path)
        self.applied_batches.append(batch_id)


def console_report(df: DataFrame, title: str, n: int = 20) -> None:
    """A9: formatted console report sink (TestCase_5/timeStamp.py:282-323)."""
    print(f"==== {title} ====")
    df.show(n, truncate=False)
