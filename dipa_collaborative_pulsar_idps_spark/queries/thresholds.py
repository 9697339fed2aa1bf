"""Threshold/classification queries closing the remaining §2.B/C/D rows:
bitrate conversion + three-level thresholds (B8/C4), port-flood flags (B9),
null-safe predicates (B5), and the reference's fixed-8 global rolling mean
(D7/H2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import Tables
from .registry import query

# ---------------------------------------------------------------------------
# B8 + C4: bytes → Kbit/s conversion and the attack/attacker/peace bands
# (Controller1.py:83-97,516-518: rate = bytes*8/(QUERY_INTERVAL*1000);
# >4000 victim, >1000 attacker, <=10 calm).
# ---------------------------------------------------------------------------


@query(
    "bitrate_classification",
    survey="B8,C4,J12",
    oracle="""
WITH rates AS (
    SELECT user_id, ts, value * 8.0 / (2 * 1000.0) * 1000 AS kbps
    FROM events
)
SELECT user_id, ts, kbps,
       CASE WHEN kbps > 4000 THEN 'ATTACK'
            WHEN kbps > 1000 THEN 'ATTACKER'
            WHEN kbps <= 10 THEN 'PEACE'
            ELSE 'NORMAL' END AS band
FROM rates
""",
)
def bitrate_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    kbps = (F.col("value") * 8.0 / (2 * 1000.0) * 1000).alias("kbps")
    band = (
        F.when(F.col("kbps") > 4000, "ATTACK")
        .when(F.col("kbps") > 1000, "ATTACKER")
        .when(F.col("kbps") <= 10, "PEACE")
        .otherwise("NORMAL")
    )
    return t.events.select("user_id", "ts", kbps).withColumn("band", band)


# ---------------------------------------------------------------------------
# B9 + D14: port-level flood predicate — rx/tx totals per key, flag when
# either exceeds 1000 (TestCase_3/TesCase2.py:95-98).
# ---------------------------------------------------------------------------


@query(
    "port_flood_flags",
    survey="B9,D14,A2",
    oracle="""
SELECT user_id,
       SUM(CASE WHEN event_type IN ('view', 'click') THEN value ELSE 0 END) AS rx_total,
       SUM(CASE WHEN event_type IN ('purchase', 'signup') THEN value ELSE 0 END) AS tx_total,
       (SUM(CASE WHEN event_type IN ('view', 'click') THEN value ELSE 0 END) > 1000
        OR SUM(CASE WHEN event_type IN ('purchase', 'signup') THEN value ELSE 0 END) > 1000)
           AS flood
FROM events
GROUP BY user_id
""",
)
def port_flood_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    rx = F.sum(
        F.when(F.col("event_type").isin("view", "click"), F.col("value")).otherwise(0.0)
    )
    tx = F.sum(
        F.when(F.col("event_type").isin("purchase", "signup"), F.col("value")).otherwise(0.0)
    )
    return t.events.groupBy("user_id").agg(
        rx.alias("rx_total"),
        tx.alias("tx_total"),
        ((rx > 1000) | (tx > 1000)).alias("flood"),
    )


# ---------------------------------------------------------------------------
# B5: null-safe predicate semantics — the reference's try/except KeyError
# (DIPA_Controller.py:468-473). A predicate over a nullable derived field
# must silently skip NULL rows (NULL → false), never error.
# ---------------------------------------------------------------------------


@query(
    "nullsafe_predicate_counts",
    survey="B5",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.missing') AS INTEGER) = 42)
           AS n_match,
       COUNT(*) FILTER (WHERE json_extract_string(props, '$.missing') IS NULL) AS n_null,
       COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50)
           AS n_k_gt_50
FROM events
""",
)
def nullsafe_predicate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    missing = F.get_json_object("props", "$.missing").cast("int")
    k = F.get_json_object("props", "$.k").cast("int")
    return t.events.agg(
        F.count("*").alias("n_rows"),
        F.count_if(missing == 42).alias("n_match"),  # NULL = 42 → false, 0 rows
        F.count_if(missing.isNull()).alias("n_null"),
        F.count_if(k > 50).alias("n_k_gt_50"),
    )


# ---------------------------------------------------------------------------
# D7/H2: the telnetStack fixed-8 rolling mean (TestCase_7/timeStamp2.py:348,
# deque([],8)). The reference keeps ONE global deque; partitioned here by
# event_type — the scale-sane reading (a truly global ordered window is a
# single-partition bottleneck; the per-class window preserves the semantics
# per traffic class).
# ---------------------------------------------------------------------------


@query(
    "rolling_mean_8_alert",
    survey="D7,H2,B7",
    oracle="""
SELECT event_id, event_type,
       AVG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mean8,
       AVG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) >= 100 AS over_threshold
FROM events
""",
)
def rolling_mean_8_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-7, 0)
    m = F.avg("value").over(w)
    return t.events.select(
        "event_id",
        "event_type",
        m.alias("mean8"),
        (m >= 100).alias("over_threshold"),
    )
