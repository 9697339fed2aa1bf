"""Advanced analytic surface: subquery shapes, collection aggregates,
statistical aggregates, date arithmetic, time-range/sliding/session windows,
and the EP4 global-view merge (SURVEY.md §2 D8-D13, I9/I10/I14/I15, §3 EP4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import Tables
from .registry import query

# ---------------------------------------------------------------------------
# Subquery shapes (Catalyst decorrelates; SQL uses the subquery forms).
# ---------------------------------------------------------------------------


@query(
    "exists_big_order_customers",
    survey="E7,B14",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
""",
)
def exists_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 150000)
    return t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "parts_above_avg_price",
    survey="D3,D5",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
""",
)
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery as broadcast single-row aggregate."""
    t = Tables(spark, sf_dir)
    avg = t.part.agg(F.avg("p_retailprice").alias("__avg"))
    return (
        t.part.join(F.broadcast(avg))
        .where(F.col("p_retailprice") > F.col("__avg"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Collection aggregates (the engine's ArrayType surface, SURVEY §1.2).
# ---------------------------------------------------------------------------


@query(
    "array_agg_customers_per_nation",
    survey="D-ext,F4",
    oracle="""
SELECT n_name,
       ARRAY_TO_STRING(LIST_SORT(ARRAY_AGG(c_name)), ',') AS names_csv,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def array_agg_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/ARRAY_AGG surface. Declared output is scalar-only (the
    sorted list serialized to CSV + cardinality): the driver's canonicalizer
    cannot hash list cells. The raw-array variant lives in
    :func:`array_agg_customers_per_nation_arrays` (local tests only)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names_csv"),
            F.count("*").alias("n_customers"),
        )
    )


def array_agg_customers_per_nation_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed form of the above (ArrayType output surface) — exercised
    by local tests; not driver-declared because list cells are unhashable
    in the driver's canonicalizer."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sort_array(F.collect_list("c_name")).alias("customer_names"))
    )


# ---------------------------------------------------------------------------
# Statistical aggregates (D9 extended): corr/covar.
# ---------------------------------------------------------------------------


@query(
    "corr_quantity_price",
    survey="D9,D13",
    oracle="""
SELECT l_returnflag,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounded to absorb float-summation-order differences between engines."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
    )


# ---------------------------------------------------------------------------
# Date arithmetic (J5-J7 extended).
# ---------------------------------------------------------------------------


@query(
    "order_date_arithmetic",
    survey="J5,J6,J7",
    oracle="""
SELECT o_orderkey,
       EXTRACT(YEAR FROM o_orderdate) AS order_year,
       EXTRACT(MONTH FROM o_orderdate) AS order_month,
       EXTRACT(DAY FROM o_orderdate) AS order_day,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS due_date,
       DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy
FROM orders
""",
)
def order_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
    )


# ---------------------------------------------------------------------------
# Time-range window frame (RANGE BETWEEN — I15 time-based analogue).
# ---------------------------------------------------------------------------


@query(
    "spend_last_30d_range_frame",
    survey="H-ext,I15",
    oracle="""
SELECT o_orderkey, o_custkey,
       SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
           AS spend_30d
FROM orders
""",
)
def spend_last_30d_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_seconds(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-2592000, 0)
    )
    return t.orders.select(
        "o_orderkey", "o_custkey", F.sum("o_totalprice").over(w).alias("spend_30d")
    )


# ---------------------------------------------------------------------------
# Sliding time window (I15): 2 h windows sliding 1 h, batch form.
# Oracle expands each event into its two covering windows.
# ---------------------------------------------------------------------------


@query(
    "sliding_2h_window_counts",
    survey="I15,I14,D11",
    oracle="""
SELECT bucket, COUNT(*) AS n_events, SUM(value) AS total_value
FROM (
    SELECT DATE_TRUNC('hour', ts) AS bucket, value FROM events
    UNION ALL
    SELECT DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR AS bucket, value FROM events
)
GROUP BY bucket
""",
)
def sliding_2h_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window(ts, '2 hours', '1 hour') — each event lands in 2 buckets;
    bucket label = window start."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("bucket"), "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# Session windows (gap-based), batch form with gaps-and-islands oracle.
# ---------------------------------------------------------------------------


@query(
    "session_windows_30m",
    survey="I16,I2",
    oracle="""
WITH ev AS (
    -- CAST(ts AS TIMESTAMP) pins the oracle to µs precision: the engine
    -- loads the TIMESTAMP_NS parquet column truncated to µs (tables.py),
    -- so session bounds/ordering must be computed on µs values here too.
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
    FROM events
), seq AS (
    SELECT user_id, ts,
           CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                  OR LAG(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session,
           event_id
    FROM ev
), sess AS (
    SELECT user_id, ts,
           -- CAST: DuckDB widens windowed SUM(INTEGER) to HUGEINT, which
           -- pandas converts to float64 and breaks the value hash vs Spark's
           -- bigint even when every row is identical.
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
               AS session_id
    FROM seq
)
SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_last,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — batch twin of streaming
    session_window; islands via cumulative new-session flags."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_seconds(F.col("ts").cast("timestamp")) - F.unix_seconds(
        F.lag("ts").over(w).cast("timestamp")
    )
    seq = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
    )
    sess = seq.withColumn("session_id", F.sum("new_session").over(w))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_last"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# I9: arrival-latency stats vs a fixed observation instant.
# ---------------------------------------------------------------------------


@query(
    "arrival_latency_stats",
    survey="I9,D10",
    oracle="""
SELECT event_type,
       MIN(age_us) / 1000000.0 AS min_age_s,
       MAX(age_us) / 1000000.0 AS max_age_s,
       CAST(CAST(SUM(age_us) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_age_s
FROM (
    -- ages in exact integer µs (ts cast to µs = the engine's load precision);
    -- the mean divides an exact bigint sum, so it is summation-order-free
    -- and bit-identical across engines.
    SELECT event_type,
           epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(CAST(ts AS TIMESTAMP)) AS age_us
    FROM events
)
GROUP BY event_type
""",
)
def arrival_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ages vs a fixed observation instant, computed in exact integer µs;
    min/max/mean divide int64 values so both engines produce the identical
    IEEE double (no float-summation order sensitivity)."""
    t = Tables(spark, sf_dir)
    ref = F.lit("2024-02-01 00:00:00").cast("timestamp_ntz")
    age_us = F.unix_micros(ref.cast("timestamp")) - F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        t.events.select("event_type", age_us.alias("age_us"))
        .groupBy("event_type")
        .agg(
            (F.min("age_us") / F.lit(1000000.0)).alias("min_age_s"),
            (F.max("age_us") / F.lit(1000000.0)).alias("max_age_s"),
            (F.sum("age_us").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)).alias(
                "mean_age_s"
            ),
        )
    )


# ---------------------------------------------------------------------------
# I10: barrier on completeness — process only hours where every subnet
# (event_type here) reported.
# ---------------------------------------------------------------------------


@query(
    "complete_hours_barrier",
    survey="I10,D11",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS bucket,
       COUNT(DISTINCT event_type) AS n_types,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
HAVING COUNT(DISTINCT event_type) = 5
""",
)
def complete_hours_barrier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"))
        .agg(
            F.countDistinct("event_type").alias("n_types"),
            F.count("*").alias("n_events"),
        )
        .where(F.col("n_types") == 5)
    )


# ---------------------------------------------------------------------------
# EP4 global-view merge: per-key rolling mean (D8) → cross-population
# baseline (D9) → anomaly flag (threaded_consumer.py:77-100).
# ---------------------------------------------------------------------------


@query(
    "global_view_anomalies",
    survey="D8,D9,EP4",
    oracle="""
WITH rolled AS (
    SELECT event_id, user_id, event_type, value,
           AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_mean
    FROM events
), baseline AS (
    SELECT event_type, AVG(roll_mean) AS pop_mean, STDDEV_POP(roll_mean) AS pop_std
    FROM rolled GROUP BY event_type
)
SELECT r.event_id, r.user_id, r.event_type,
       ROUND(r.roll_mean, 6) AS roll_mean,
       ROUND((r.roll_mean - b.pop_mean) / b.pop_std, 6) AS zscore
FROM rolled r JOIN baseline b ON r.event_type = b.event_type
WHERE (r.roll_mean - b.pop_mean) / b.pop_std > 2.0
""",
)
def global_view_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The collaborative anomaly baseline: per-source rolling mean compared
    to the cross-domain population mean/σ; flag z > 2. Baseline is a tiny
    per-type aggregate → broadcast."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    rolled = t.events.select(
        "event_id",
        "user_id",
        "event_type",
        F.avg("value").over(w).alias("roll_mean"),
    )
    baseline = rolled.groupBy("event_type").agg(
        F.avg("roll_mean").alias("pop_mean"), F.stddev_pop("roll_mean").alias("pop_std")
    )
    z = (F.col("roll_mean") - F.col("pop_mean")) / F.col("pop_std")
    return (
        rolled.join(F.broadcast(baseline), "event_type")
        .where(z > 2.0)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("roll_mean", 6).alias("roll_mean"),
            F.round(z, 6).alias("zscore"),
        )
    )
