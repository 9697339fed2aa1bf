"""Window-function and time-window surface (SURVEY.md §2 D7-D13, H1-H5,
I14-I15 batch equivalents, E as-of join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import Tables
from .registry import query

# ---------------------------------------------------------------------------
# H3/D8: per-key rolling mean, frame of 5 rows
# (threaded_consumer.py:77-93 deque([],5) per (vm,src,port)).
# ---------------------------------------------------------------------------


@query(
    "rolling_mean_per_key",
    survey="D8,H3,D7,H2",
    oracle="""
SELECT event_id, user_id,
       AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rolling_mean
FROM events
""",
)
def rolling_mean_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return t.events.select(
        "event_id", "user_id", F.avg("value").over(w).alias("rolling_mean")
    )


# ---------------------------------------------------------------------------
# H4/D12: running mean, unbounded preceding (captcha_server.py:33).
# ---------------------------------------------------------------------------


@query(
    "running_mean_per_key",
    survey="D12,H4",
    oracle="""
SELECT event_id, user_id,
       AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_mean,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM events
""",
)
def running_mean_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.avg("value").over(w).alias("running_mean"),
        F.count("*").over(w).alias("n_so_far"),
    )


# ---------------------------------------------------------------------------
# Ranking/analytic family (H5 + SURVEY §2.H "engine declares the full family").
# ---------------------------------------------------------------------------


@query(
    "rank_family",
    survey="H5,H1",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


# ---------------------------------------------------------------------------
# D11/I14: tumbling time window — hourly event counts.
# Batch oracle uses date_trunc (same bucketing as Spark window(ts,'1 hour')
# for hour-aligned windows; streaming path uses F.window, see streaming/).
# ---------------------------------------------------------------------------


@query(
    "tumbling_hourly_counts",
    survey="D11,I14",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS bucket,
       event_type,
       COUNT(*) AS n_events,
       SUM(value) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# D9: cross-population mean + stddev (threaded_consumer.py:94-98 anomaly
# baseline) + D13 confidence bound (captcha_server.py:36-41).
# ---------------------------------------------------------------------------


@query(
    "population_baseline",
    survey="D9,D13",
    oracle="""
SELECT event_type,
       AVG(value) AS mean_value,
       STDDEV_POP(value) AS std_value,
       COUNT(*) AS n,
       AVG(value) * (1.96 / (2 * SQRT(COUNT(*)))) AS bound
FROM events
GROUP BY event_type
""",
)
def population_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.avg("value").alias("mean_value"),
        F.stddev_pop("value").alias("std_value"),
        F.count("*").alias("n"),
        (F.avg("value") * (F.lit(1.96) / (2 * F.sqrt(F.count("*"))))).alias("bound"),
    )


# ---------------------------------------------------------------------------
# D10: min/max/mean of row-sums (threaded_consumer.py:63-72 latency merge).
# ---------------------------------------------------------------------------


@query(
    "latency_merge_stats",
    survey="D10",
    oracle="""
SELECT MIN(total) AS min_total, MAX(total) AS max_total, AVG(total) AS mean_total
FROM (SELECT value + COALESCE(user_id, 0) AS total FROM events)
""",
)
def latency_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    total = (F.col("value") + F.coalesce(F.col("user_id"), F.lit(0))).alias("total")
    return t.events.select(total).agg(
        F.min("total").alias("min_total"),
        F.max("total").alias("max_total"),
        F.avg("total").alias("mean_total"),
    )


# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.E "absent join shapes the engine must ship"):
# for each purchase, the most recent prior click by the same user.
# Implemented shuffle-once: union both sides tagged, single window pass with
# last(ignorenulls) — no per-row subquery, scales to 100 TB.
# ---------------------------------------------------------------------------


@query(
    "asof_join_last_click_before_purchase",
    survey="E-asof",
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
    FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
    SELECT *,
           LAST_VALUE(CASE WHEN is_click = 1 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value,
           LAST_VALUE(CASE WHEN is_click = 1 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
    FROM tagged
)
SELECT event_id AS purchase_event_id, user_id,
       value AS purchase_value, last_click_value, last_click_ts
FROM carried WHERE is_purchase = 1
""",
)
def asof_join_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    # clicks sort before purchases at identical ts (is_purchase asc) so a
    # same-instant click is visible to the purchase — pinned, documented.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_val = F.when(F.col("is_click") == 1, F.col("value"))
    click_ts = F.when(F.col("is_click") == 1, F.col("ts"))
    carried = ev.select(
        "*",
        F.last(click_val, ignorenulls=True).over(w).alias("last_click_value"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    return carried.where(F.col("is_purchase") == 1).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("value").alias("purchase_value"),
        "last_click_value",
        "last_click_ts",
    )
