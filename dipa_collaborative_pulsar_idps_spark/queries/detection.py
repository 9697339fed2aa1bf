"""Detection-shaped declared queries (SURVEY.md §2 B/C/D/F/I rows).

The driver's `events` table stands in for the reference's telemetry streams
(TESTDATA.md / FIXTURES.md §B): ``user_id`` ≈ source host, ``value`` ≈
packet counter sample, ``ts`` ≈ poll instant, ``event_type`` ≈ traffic class.

Reference semantics are cited per query (paths relative to /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import Tables
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: the Mirai-detection spine
# filter → groupBy sum → argmax (CNC) → ratio-of-total bias → threshold.
# Mirrors DIPA_Controller.py:452-497 (telnet agg :479-481, argmax :483-485,
# bias :487-489, threshold 0.6 :497).
# ---------------------------------------------------------------------------


@query(
    "suspected_bots",
    survey="B6,D1,D2,D3,B10",
    oracle="""
WITH telnet AS (
    SELECT user_id AS src, SUM(value) AS total_traffic
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id
), cnc AS (
    SELECT MAX(total_traffic) AS cnc_total FROM telnet
)
SELECT src,
       total_traffic,
       1.0 - total_traffic / (total_traffic + cnc_total) AS bias
FROM telnet CROSS JOIN cnc
WHERE 1.0 - total_traffic / (total_traffic + cnc_total) >= 0.6
""",
)
def suspected_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source traffic sum → global argmax (CNC) → bias = 1 - pc/(pc+cnc)
    → bias ≥ 0.6. The single-row CNC aggregate is broadcast (no second
    shuffle, no single-partition window) — scale-safe at 100 TB."""
    t = Tables(spark, sf_dir)
    telnet = (
        t.events.where(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("src"))
        .agg(F.sum("value").alias("total_traffic"))
    )
    cnc = telnet.agg(F.max("total_traffic").alias("cnc_total"))
    bias = F.lit(1.0) - F.col("total_traffic") / (F.col("total_traffic") + F.col("cnc_total"))
    return (
        telnet.join(F.broadcast(cnc))
        .withColumn("bias", bias)
        .where(F.col("bias") >= 0.6)
        .select("src", "total_traffic", "bias")
    )


# ---------------------------------------------------------------------------
# C1: cumulative-counter delta with reset detection.
# DIPA_Controller.py:461-463 (req1/diff arrays; reset → negative delta fixed
# per SURVEY §4 custom-op #1). First sample: req1 initialized 0 → delta=value.
# ---------------------------------------------------------------------------

_DELTA_SQL = """
SELECT event_id, user_id,
       CASE WHEN value - COALESCE(LAG(value) OVER w, 0) < 0 THEN value
            ELSE value - COALESCE(LAG(value) OVER w, 0) END AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def _delta_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    raw = F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))
    delta = F.when(raw < 0, F.col("value")).otherwise(raw)
    return t.events.select("event_id", "user_id", delta.alias("delta"))


@query("counter_delta", survey="C1,C2,C3,H1", oracle=_DELTA_SQL)
def counter_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key counter delta vs previous poll (lag), negative → reset."""
    return _delta_df(spark, sf_dir)


@query(
    "pkt_rate_alert",
    survey="C5,B7",
    oracle=f"""
SELECT event_id, user_id, delta / 3.0 AS pkt_rate
FROM ({_DELTA_SQL})
WHERE delta / 3.0 > 25.0
""",
)
def pkt_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta/poll_interval > 25 pkt/s alert (TestCase_5/timeStamp.py:300-308)."""
    d = _delta_df(spark, sf_dir)
    return d.select(
        "event_id", "user_id", (F.col("delta") / 3.0).alias("pkt_rate")
    ).where(F.col("pkt_rate") > 25.0)


# ---------------------------------------------------------------------------
# B3: protocol CASE classifier (DIPA_Controller.py:149-195) mapped onto
# event_type, aggregated per label (exercises CASE + hash agg).
# ---------------------------------------------------------------------------


@query(
    "protocol_classify",
    survey="B3,D1",
    oracle="""
SELECT CASE event_type
         WHEN 'click' THEN 'HTTP'
         WHEN 'view' THEN 'HTTPS'
         WHEN 'signup' THEN 'Telnet'
         WHEN 'purchase' THEN 'DNS'
         WHEN 'error' THEN 'ICMP'
         ELSE 'Unknown'
       END AS protocol,
       COUNT(*) AS n_events,
       SUM(value) AS total_value
FROM events
GROUP BY 1
""",
)
def protocol_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    proto = (
        F.when(F.col("event_type") == "click", "HTTP")
        .when(F.col("event_type") == "view", "HTTPS")
        .when(F.col("event_type") == "signup", "Telnet")
        .when(F.col("event_type") == "purchase", "DNS")
        .when(F.col("event_type") == "error", "ICMP")
        .otherwise("Unknown")
    )
    return (
        t.events.groupBy(proto.alias("protocol"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# C6: MAC-learning last-write upsert (DIPA_Controller.py:257-263) →
# last event_type per key by (ts, event_id).
# ---------------------------------------------------------------------------


@query(
    "last_write_upsert",
    survey="C6",
    oracle="""
SELECT user_id, event_type AS last_event_type
FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
""",
)
def last_write_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by(event_type, (ts,event_id)) — single shuffle, no sort of the
    whole table (vs row_number which sorts every partition group)."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts", "event_id")).alias("last_event_type")
    )


@query(
    "first_seen",
    survey="C7",
    oracle="SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id",
)
def first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen registration (DIPA_Controller.py:470-471)."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))


# ---------------------------------------------------------------------------
# D2/G3: global argmax — CNC pick (DIPA_Controller.py:483-485).
# ---------------------------------------------------------------------------


@query(
    "cnc_pick",
    survey="D2,G3",
    oracle="""
SELECT user_id AS cnc, total_traffic
FROM (
    SELECT user_id, SUM(value) AS total_traffic
    FROM events WHERE event_type = 'click' GROUP BY user_id
)
ORDER BY total_traffic DESC, user_id ASC
LIMIT 1
""",
)
def cnc_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    agg = (
        t.events.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total_traffic"))
    )
    # argmax with deterministic tie-break (lowest user_id) via struct ordering
    return agg.agg(
        F.max_by("user_id", F.struct(F.col("total_traffic"), (-F.col("user_id")).alias("tb"))).alias("cnc"),
        F.max("total_traffic").alias("total_traffic"),
    )


# ---------------------------------------------------------------------------
# D4/D5/B11: compromise percentage (DIPA_Controller.py:348-351).
# ---------------------------------------------------------------------------


@query(
    "compromise_pct",
    survey="D4,D5,B11",
    oracle="""
WITH telnet AS (
    SELECT user_id AS src, SUM(value) AS total_traffic
    FROM events WHERE event_type = 'click' GROUP BY user_id
), cnc AS (
    SELECT MAX(total_traffic) AS cnc_total FROM telnet
), bots AS (
    SELECT src FROM telnet CROSS JOIN cnc
    WHERE 1.0 - total_traffic / (total_traffic + cnc_total) >= 0.6
), hosts AS (
    SELECT COUNT(DISTINCT user_id) AS n_hosts FROM events
)
SELECT (SELECT COUNT(*) FROM bots) AS n_bots,
       n_hosts,
       100.0 * (SELECT COUNT(*) FROM bots) / n_hosts AS pct
FROM hosts
""",
)
def compromise_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bots = suspected_bots(spark, sf_dir).agg(F.count("*").alias("n_bots"))
    hosts = t.events.agg(F.countDistinct("user_id").alias("n_hosts"))
    return (
        bots.crossJoin(F.broadcast(hosts))
        .withColumn("pct", 100.0 * F.col("n_bots") / F.col("n_hosts"))
    )


# ---------------------------------------------------------------------------
# F1-F3: set algebra over host sets (DIPA_Controller.py:327,331,346;
# Controller1.py:345).
# ---------------------------------------------------------------------------


@query(
    "set_except_new_bots",
    survey="F1",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_except_new_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """suspected − known (set difference, DIPA_Controller.py:327)."""
    t = Tables(spark, sf_dir)
    a = t.events.where(F.col("event_type") == "error").select("user_id").distinct()
    b = t.events.where(F.col("event_type") == "purchase").select("user_id").distinct()
    return a.exceptAll(b)


@query(
    "set_union_full_bots",
    survey="F2",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
UNION
SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
""",
)
def set_union_full_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.events.where(F.col("event_type") == "error").select("user_id")
    b = t.events.where(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@query(
    "set_intersect_protected",
    survey="F3",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
""",
)
def set_intersect_protected(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.events.where(F.col("event_type") == "error").select("user_id").distinct()
    b = t.events.where(F.col("event_type") == "view").select("user_id").distinct()
    return a.intersect(b)


# ---------------------------------------------------------------------------
# I3 (batch form): sustained-count hysteresis — alert only after ≥3
# consecutive hot samples (Controller1.py:93,419-429). Gaps-and-islands.
# ---------------------------------------------------------------------------


@query(
    "sustained_hot_streaks",
    survey="I3,I5",
    oracle="""
WITH seq AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS hot,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
), isl AS (
    SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, hot ORDER BY rn) AS grp
    FROM seq
)
SELECT user_id, MIN(ts) AS streak_start, COUNT(*) AS streak_len
FROM isl WHERE hot = 1
GROUP BY user_id, grp
HAVING COUNT(*) >= 3
""",
)
def sustained_hot_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") > 100.0, 1).otherwise(0).alias("hot"),
        F.row_number().over(w).alias("rn"),
    )
    w2 = Window.partitionBy("user_id", "hot").orderBy("rn")
    isl = seq.withColumn("grp", F.col("rn") - F.row_number().over(w2))
    return (
        isl.where(F.col("hot") == 1)
        .groupBy("user_id", "grp")
        .agg(F.min("ts").alias("streak_start"), F.count("*").alias("streak_len"))
        .where(F.col("streak_len") >= 3)
        .drop("grp")
    )
