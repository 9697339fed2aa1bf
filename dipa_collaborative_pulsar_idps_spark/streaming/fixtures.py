"""Deterministic telemetry fixture generators for streaming tests
(FIXTURES.md §A generator knobs: planted bots, counter resets, cadence).

Ground truth is planted: callers know exactly which hosts are bots, so
golden assertions mirror the thesis's accuracy checks (SURVEY.md §5:
alert count == planted bot count).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def flow_stats_load(
    spark: SparkSession,
    n_hosts: int,
    n_bots: int,
    n_polls: int = 8,
    poll_interval_s: float = 3.0,
    bot_rate: int = 150,
    benign_rate: int = 9,
) -> DataFrame:
    """Scaled EP1 load fixture for the thesis-style accuracy matrix
    (BASELINE.md §4: benign-flows × bots grid, Tables 30-34): one telnet
    flow per host per poll with cumulative counters; hosts 0..n_bots-1 are
    the planted bots. Generated DISTRIBUTED (spark.range + expressions,
    no driver-side row list) so the 7500-flow saturation point is cheap.
    Ground-truth bot IPs via :func:`load_fixture_bot_ips`."""
    t0_us = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    step_us = int(poll_interval_s * 1_000_000)
    base = spark.range(n_hosts * n_polls).selectExpr(
        f"id % {n_hosts} AS h", f"id DIV {n_hosts} AS poll"
    )
    ip = F.expr("concat('10.', h DIV 65536, '.', (h DIV 256) % 256, '.', h % 256)")
    rate = F.when(F.col("h") < n_bots, F.lit(bot_rate)).otherwise(F.lit(benign_rate))
    counter = (F.col("poll") + 1) * rate
    return base.select(
        F.timestamp_micros(F.lit(t0_us) + F.col("poll") * F.lit(step_us)).alias("poll_ts"),
        F.lit(1).cast("long").alias("dpid"),
        F.lit("s1").alias("switch"),
        F.lit(10).alias("priority"),
        (F.col("h") % 48 + 1).cast("int").alias("in_port"),
        F.format_string("02:%010x", F.col("h")).alias("eth_src"),
        F.lit("0a:0a:0a:0a:0a:09").alias("eth_dst"),
        F.lit(0x0800).alias("eth_type"),
        ip.alias("ipv4_src"),
        F.lit("10.255.255.254").alias("ipv4_dst"),
        F.lit(6).alias("ip_proto"),
        (F.col("h") % 20000 + 40000).cast("int").alias("tcp_src"),
        F.lit(23).alias("tcp_dst"),
        F.lit(None).cast("int").alias("udp_src"),
        F.lit(None).cast("int").alias("udp_dst"),
        F.lit(3).alias("out_port"),
        counter.cast("long").alias("packet_count"),
        (counter * 64).cast("long").alias("byte_count"),
        (F.col("poll") * F.lit(int(poll_interval_s))).cast("long").alias("duration_sec"),
    )


def load_fixture_bot_ips(n_bots: int) -> set[str]:
    """Ground-truth bot IPs planted by :func:`flow_stats_load`."""
    return {f"10.{h // 65536}.{(h // 256) % 256}.{h % 256}" for h in range(n_bots)}


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
