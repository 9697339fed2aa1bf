"""Raw-packet header parsing (SURVEY.md §2 K1 — the one genuine UDF
candidate: Ryu's packet parse, DIPA_Controller.py:245-247).

A vectorized Arrow-batched parser for a concrete wire layout (ethernet +
IPv4 + L4 ports), so raw `binary` packet columns can enter the same typed
pipelines as pre-parsed fixtures. This is REAL parsing — only upstream
capture is out of scope.

Layout parsed (minimal ethernet/IPv4):
  bytes 0-5   eth_dst  (6 B MAC)
  bytes 6-11  eth_src  (6 B MAC)
  bytes 12-13 eth_type (u16 BE)
  if eth_type == 0x0800 (IPv4), from byte 14 (no options assumed: IHL=5):
    byte 23        ip_proto
    bytes 26-29    ipv4_src
    bytes 30-33    ipv4_dst
    bytes 34-35/36-37  l4 src/dst port (TCP or UDP)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PARSED_SCHEMA = (
    "eth_dst string, eth_src string, eth_type int, ip_proto int, "
    "ipv4_src string, ipv4_dst string, l4_src_port int, l4_dst_port int"
)


def _mac(b: bytes) -> str:
    return ":".join(f"{x:02x}" for x in b)


def _ip(b: bytes) -> str:
    return ".".join(str(x) for x in b)


def parse_packet_bytes(pkt: bytes) -> tuple:
    if pkt is None or len(pkt) < 14:
        return (None, None, None, None, None, None, None, None)
    eth_dst, eth_src = _mac(pkt[0:6]), _mac(pkt[6:12])
    (eth_type,) = struct.unpack(">H", pkt[12:14])
    if eth_type != 0x0800 or len(pkt) < 34:
        return (eth_dst, eth_src, eth_type, None, None, None, None, None)
    ip_proto = pkt[23]
    ipv4_src, ipv4_dst = _ip(pkt[26:30]), _ip(pkt[30:34])
    sport = dport = None
    if ip_proto in (6, 17) and len(pkt) >= 38:
        sport, dport = struct.unpack(">HH", pkt[34:38])
    return (eth_dst, eth_src, eth_type, ip_proto, ipv4_src, ipv4_dst, sport, dport)


def build_packet(
    eth_dst: str,
    eth_src: str,
    ipv4_src: str | None = None,
    ipv4_dst: str | None = None,
    ip_proto: int = 6,
    sport: int = 0,
    dport: int = 0,
    eth_type: int = 0x0800,
) -> bytes:
    """Inverse of :func:`parse_packet_bytes` (test fixture generator)."""
    out = bytes(int(x, 16) for x in eth_dst.split(":"))
    out += bytes(int(x, 16) for x in eth_src.split(":"))
    out += struct.pack(">H", eth_type)
    if eth_type != 0x0800 or ipv4_src is None:
        return out
    ihl_etc = bytes(9)  # ver/ihl..ttl placeholder (IHL=5 assumed by parser)
    out += ihl_etc + bytes([ip_proto]) + bytes(2)
    out += bytes(int(x) for x in ipv4_src.split("."))
    out += bytes(int(x) for x in ipv4_dst.split("."))
    out += struct.pack(">HH", sport, dport)
    return out


def parse_packets(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched header parse: (original cols…) → parsed header columns.

    mapInPandas, not a row-at-a-time UDF: one Python invocation per Arrow
    batch, amortizing serialization over thousands of packets."""
    passthrough = [c for c, _ in df.dtypes if c != payload_col]
    pass_schema = ", ".join(f"{c} {t}" for c, t in df.dtypes if c != payload_col)
    out_schema = (pass_schema + ", " if pass_schema else "") + PARSED_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "eth_dst", "eth_src", "eth_type", "ip_proto",
            "ipv4_src", "ipv4_dst", "l4_src_port", "l4_dst_port",
        ]
        for pdf in batches:
            parsed = pd.DataFrame(
                [parse_packet_bytes(bytes(p)) for p in pdf[payload_col]], columns=cols
            )
            yield pd.concat(
                [pdf[passthrough].reset_index(drop=True), parsed], axis=1
            )

    return df.mapInPandas(fn, out_schema)
