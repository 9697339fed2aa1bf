"""Declared StructType schemas for the telemetry stream fixtures
(FIXTURES.md §A; field unions cited there into the reference controllers).

The reference's schema system is implicit/positional (OFPMatch key probing
with try/except KeyError, `@`-split Pulsar strings — DIPA_Controller.py:
371-373,468-473). The engine declares fixed nullable schemas instead: absent
match fields are NULL, and null-safe predicates reproduce the try/except
semantics (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: A1 — polled flow-table snapshots (cumulative counters).
FLOW_STATS = StructType(
    [
        _f("poll_ts", TimestampType(), False),
        _f("dpid", LongType(), False),
        _f("switch", StringType()),
        _f("priority", IntegerType(), False),
        _f("in_port", IntegerType()),
        _f("eth_src", StringType()),
        _f("eth_dst", StringType()),
        _f("eth_type", IntegerType()),
        _f("ipv4_src", StringType()),
        _f("ipv4_dst", StringType()),
        _f("ip_proto", IntegerType()),
        _f("tcp_src", IntegerType()),
        _f("tcp_dst", IntegerType()),
        _f("udp_src", IntegerType()),
        _f("udp_dst", IntegerType()),
        _f("out_port", IntegerType()),
        _f("packet_count", LongType(), False),
        _f("byte_count", LongType(), False),
        _f("duration_sec", LongType()),
    ]
)

#: A2 — polled per-port counters.
PORT_STATS = StructType(
    [
        _f("poll_ts", TimestampType(), False),
        _f("dpid", LongType(), False),
        _f("port_no", IntegerType(), False),
        _f("rx_packets", LongType()),
        _f("rx_bytes", LongType()),
        _f("rx_errors", LongType()),
        _f("tx_packets", LongType()),
        _f("tx_bytes", LongType()),
        _f("tx_errors", LongType()),
    ]
)

#: A3 — table-miss packet events.
PACKET_IN = StructType(
    [
        _f("event_ts", TimestampType(), False),
        _f("dpid", LongType(), False),
        _f("in_port", IntegerType()),
        _f("eth_src", StringType()),
        _f("eth_dst", StringType()),
        _f("eth_type", IntegerType()),
        _f("ipv4_src", StringType()),
        _f("ipv4_dst", StringType()),
        _f("ip_proto", IntegerType()),
        _f("l4_src_port", IntegerType()),
        _f("l4_dst_port", IntegerType()),
        _f("buffer_id", LongType()),
    ]
)

#: A4 — raw Pulsar alert-topic messages ("<ip>@BOT" / "<ip>@CNC" / "<cnc>@<pct>").
ALERTS = StructType(
    [
        _f("msg_ts", TimestampType(), False),
        _f("topic", StringType()),
        _f("value", StringType(), False),
        _f("producer", StringType()),
    ]
)

#: A7 — static dimensions (broadcast).
TOPOLOGY = StructType(
    [
        _f("switch", StringType(), False),
        _f("port_no", IntegerType(), False),
        _f("attached", StringType()),
    ]
)

HOSTS = StructType(
    [
        _f("host_ip", StringType(), False),
        _f("host_mac", StringType()),
        _f("switch", StringType()),
        _f("port_no", IntegerType()),
        _f("protected", BooleanType()),
    ]
)

#: Parsed update-topic rows (A5): "<src>@<dst_port>@<rate>".
UPDATES = StructType(
    [
        _f("msg_ts", TimestampType(), False),
        _f("subnet", IntegerType()),
        _f("src", StringType()),
        _f("dst_port", IntegerType()),
        _f("rate", DoubleType()),
    ]
)
