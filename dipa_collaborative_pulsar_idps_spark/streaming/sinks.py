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


#: Sentinel for NULL key fields — concat_ws silently DROPS nulls, so without
#: it two actions differing only in a NULL column would collide on one
#: idempotency key and one would be skipped.
_NULL = "\x00∅"


class MitigationSink:
    """foreachBatch sink with idempotency-key dedup.

    Applied keys persist as parquet under ``ledger_path`` (the analogue of
    the switch's installed-rule table); a replayed micro-batch joins
    anti-style against the ledger, so each (action, target) fires once.

    Ledger hygiene at scale:
    - keys are null-safe (every key column coalesced to a sentinel before
      concat — concat_ws drops nulls);
    - the ledger is hive-partitioned by a key-hash BUCKET: each batch reads
      only the buckets its actions touch (partition-pruned scan), not the
      whole history;
    - every ``compact_every`` appends per bucket, that bucket is rewritten
      to one file (dynamic partition overwrite — other buckets untouched),
      so file count stays O(n_buckets), not O(batches).
    """

    def __init__(
        self,
        ledger_path: str,
        key_cols: list[str],
        apply_fn: ActionFn | None = None,
        n_buckets: int = 16,
        compact_every: int = 8,
    ):
        self.ledger_path = ledger_path
        self.key_cols = key_cols
        self.apply_fn = apply_fn
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        self.applied_batches: list[int] = []
        self._appends_per_bucket: dict[int, int] = {}

    def _key(self):
        return F.concat_ws(
            "§", *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in self.key_cols]
        )

    def _bucket_dir(self, b: int) -> str:
        return os.path.join(self.ledger_path, f"bucket={b}")

    def _ledger_buckets(self, spark, buckets: list[int]):
        """Read only the touched buckets (pruned by the hive layout)."""
        present = [b for b in buckets if os.path.isdir(self._bucket_dir(b))]
        if not present:
            return None
        return spark.read.option("basePath", self.ledger_path).parquet(
            *[self._bucket_dir(b) for b in present]
        )

    def _compact(self, spark, bucket: int) -> None:
        bdir = self._bucket_dir(bucket)
        keys = spark.read.option("basePath", self.ledger_path).parquet(bdir)
        (
            keys.select("__key", "bucket")
            .distinct()
            .repartition(1)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.ledger_path)
        )
        self._appends_per_bucket[bucket] = 1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        actions = batch_df.withColumn("__key", self._key()).withColumn(
            "bucket", F.pmod(F.xxhash64(F.col("__key")), F.lit(self.n_buckets)).cast("int")
        )
        touched = [int(r[0]) for r in actions.select("bucket").distinct().collect()]
        ledger = self._ledger_buckets(spark, touched)
        if ledger is not None:
            actions = actions.join(
                ledger.select("__key"), "__key", "left_anti"
            )
        new_rows = actions.collect()
        if not new_rows:
            return
        if self.apply_fn is not None:
            self.apply_fn(new_rows)  # side effect: rule install / QoS call
        spark.createDataFrame(
            [(r["__key"], r["bucket"]) for r in new_rows], "__key string, bucket int"
        ).write.mode("append").partitionBy("bucket").parquet(self.ledger_path)
        self.applied_batches.append(batch_id)
        for b in {r["bucket"] for r in new_rows}:
            self._appends_per_bucket[b] = self._appends_per_bucket.get(b, 0) + 1
            if self._appends_per_bucket[b] >= self.compact_every:
                self._compact(spark, b)


def console_report(df: DataFrame, title: str, n: int = 20) -> None:
    """A9: formatted console report sink (TestCase_5/timeStamp.py:282-323)."""
    print(f"==== {title} ====")
    df.show(n, truncate=False)
