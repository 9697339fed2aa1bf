"""Replay source: turn a batch fixture into a Structured Streaming source
(SURVEY.md §2 A11 — the pcap/tcpreplay analogue).

A fixture DataFrame is written as N time-ordered parquet chunks; a file
stream with ``maxFilesPerTrigger=1`` then replays one chunk per micro-batch
— reproducing the reference's 2 s poll cadence deterministically
(DIPA_Controller.py:308-320) without wall-clock coupling.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def write_replay_chunks(
    df: DataFrame, path: str, n_chunks: int, order_col: str = "poll_ts"
) -> None:
    """Split *df* into *n_chunks* files ordered by *order_col* (one file per
    future micro-batch). File mtimes increase with chunk index so the file
    source replays them oldest-first."""
    w = Window.orderBy(order_col)
    chunked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__chunk", ((F.col("__rn") - 1) * n_chunks / F.lit(df.count())).cast("int")
    )
    os.makedirs(path, exist_ok=True)
    for i in range(n_chunks):
        part = chunked.where(F.col("__chunk") == i).drop("__rn", "__chunk")
        part.coalesce(1).write.mode("append").parquet(path)
        time.sleep(0.05)  # distinct mtimes → deterministic replay order


def replay_stream(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """File stream over a replay directory, one chunk per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drain a streaming DataFrame into an in-memory table (test sink).

    Returns the started query after processing everything available."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
