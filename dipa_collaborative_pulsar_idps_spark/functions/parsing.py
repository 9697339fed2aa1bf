"""Column-expression library: protocol classification and the `@`-delimited
Pulsar message conventions (SURVEY.md §2 B3, J1-J7).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Protocol numbers / ports per DIPA_Controller.py:149-195 getProtocol.
_ICMP, _TCP, _UDP = 1, 6, 17


def protocol_classifier(
    ip_proto: Column, l4_dst: Column, l4_src: Column | None = None
) -> Column:
    """proto×port → label CASE chain (DIPA_Controller.py:149-195).

    Labels: ICMP, HTTP, HTTPS, Telnet, DNS, DHCP, Loader, TCP, UDP, Unknown.
    Null-safe: absent ports (NULL) fall through — same semantics as the
    reference's try/except KeyError (:468-473).
    """
    l4_src = l4_src if l4_src is not None else F.lit(None).cast("int")
    return (
        F.when(ip_proto == _ICMP, "ICMP")
        .when((ip_proto == _TCP) & (l4_dst == 80), "HTTP")
        .when((ip_proto == _TCP) & (l4_dst == 443), "HTTPS")
        .when((ip_proto == _TCP) & l4_dst.isin(23, 2323), "Telnet")
        .when((ip_proto == _TCP) & (l4_dst == 48101), "Loader")
        .when((ip_proto == _UDP) & ((l4_dst == 53) | (l4_src == 53)), "DNS")
        .when((ip_proto == _UDP) & l4_dst.isin(67, 68), "DHCP")
        .when((ip_proto == _UDP) & (l4_dst == 48101) & (l4_src == 48101), "Loader")
        .when(ip_proto == _TCP, "TCP")
        .when(ip_proto == _UDP, "UDP")
        .otherwise("Unknown")
    )


def parse_alert(value: Column) -> Column:
    """"<ip>@BOT" / "<ip>@CNC" / "<cnc_ip>@<percent>" → struct(ip, kind, pct)
    (producer DIPA_Controller.py:333-342,352; consumer :367-373)."""
    # F.get (not getItem/element_at): returns NULL for a missing index under
    # ANSI mode — a delimiter-less or truncated message must parse to NULL
    # fields and fall out of the kind-branch filters, never kill the stream.
    parts = F.split(value, "@")
    head = F.trim(F.get(parts, 0))
    tail = F.trim(F.get(parts, 1))
    is_pct = tail.rlike(r"^[0-9]+(\.[0-9]+)?$")
    return F.struct(
        head.alias("ip"),
        F.when(is_pct, F.lit("COMPROMISE")).otherwise(tail).alias("kind"),
        F.when(is_pct, tail.cast("double")).alias("pct"),
    )


def format_alert(ip: Column, kind: Column) -> Column:
    """Inverse of :func:`parse_alert` (DIPA_Controller.py:333 '{}@{}')."""
    return F.concat_ws("@", ip, kind)


def parse_update(value: Column) -> Column:
    """"<src>@<dst_port>@<rate>" → struct (demo4.py:360-361)."""
    parts = F.split(value, "@")
    return F.struct(
        F.trim(F.get(parts, 0)).alias("src"),
        F.get(parts, 1).try_cast("int").alias("dst_port"),
        F.get(parts, 2).try_cast("double").alias("rate"),
    )


def parse_timer(value: Column) -> Column:
    """"<elapsed_s>@<iso ts>" → struct (DIPA_Controller.py:499-501,
    consumed threaded_consumer.py:54-59)."""
    parts = F.split(value, "@")
    return F.struct(
        F.get(parts, 0).try_cast("double").alias("control_plane_s"),
        F.to_timestamp(F.get(parts, 1), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("sent_ts"),
    )
