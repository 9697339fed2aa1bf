"""Deterministic telemetry fixture generators for streaming tests
(FIXTURES.md §A generator knobs: planted bots, counter resets, cadence).

Ground truth is planted: callers know exactly which hosts are bots, so
golden assertions mirror the thesis's accuracy checks (SURVEY.md §5:
alert count == planted bot count).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FLOW_STATS, HOSTS, PACKET_IN

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

HOSTS_ROWS = [
    (f"10.0.0.{i}", f"0a:0a:0a:0a:0a:0{i:x}", f"s{(i - 1) // 2 + 1}", (i - 1) % 2 + 1, i <= 2)
    for i in range(1, 9)
]


def hosts_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(HOSTS_ROWS, HOSTS)


def flow_stats_attack(
    spark: SparkSession,
    bots: tuple[str, ...] = ("10.0.0.2", "10.0.0.5"),
    n_polls: int = 10,
    poll_interval_s: float = 3.0,
    bot_rate: int = 150,  # pkts/poll → 50 pkt/s ≫ 25 threshold
    benign_rate: int = 9,  # 3 pkt/s ≪ threshold
    reset_at_poll: int = 6,  # plant a counter reset (flow re-install)
    reset_flow_src: str = "10.0.0.5",
) -> DataFrame:
    """One telnet flow per host toward the CNC, cumulative counters, with a
    planted mid-run counter reset for *reset_flow_src*."""
    rows = []
    counters = {f"10.0.0.{i}": 0 for i in range(1, 9)}
    for poll in range(n_polls):
        ts = T0 + dt.timedelta(seconds=poll * poll_interval_s)
        for i in range(1, 9):
            src = f"10.0.0.{i}"
            inc = bot_rate if src in bots else benign_rate
            if poll == reset_at_poll and src == reset_flow_src:
                counters[src] = inc  # reset: counter restarts
            else:
                counters[src] += inc
            rows.append(
                (
                    ts,
                    1,
                    "s1",
                    10,
                    (i - 1) % 2 + 1,
                    f"0a:0a:0a:0a:0a:0{i:x}",
                    "0a:0a:0a:0a:0a:09",
                    0x0800,
                    src,
                    "10.0.0.9",
                    6,
                    40000 + i,
                    23,
                    None,
                    None,
                    3,
                    counters[src],
                    counters[src] * 64,
                    poll * int(poll_interval_s),
                )
            )
    return spark.createDataFrame(rows, FLOW_STATS)


def packet_in_sample(spark: SparkSession) -> DataFrame:
    rows = [
        (T0, 1, 1, "aa:01", "aa:02", 0x0800, "10.0.0.1", "10.0.0.2", 6, 51000, 80, 1),
        (T0, 1, 2, "aa:03", "aa:04", 0x0800, "10.0.0.3", "10.0.0.4", 6, 51001, 23, 2),
        (T0, 1, 3, "aa:05", "aa:06", 0x0800, "10.0.0.5", "10.0.0.6", 17, 48101, 48101, 3),
        (T0, 1, 4, "aa:07", "aa:08", 0x88CC, None, None, None, None, None, 4),  # LLDP
        (T0, 1, 5, "aa:09", "aa:0a", 0x0800, "10.0.0.7", "10.0.0.8", 1, None, None, 5),
        (T0, 1, 6, "aa:0b", "aa:0c", 0x0800, "10.0.0.8", "10.0.0.7", 17, 5353, 53, 6),
    ]
    return spark.createDataFrame(rows, PACKET_IN)
