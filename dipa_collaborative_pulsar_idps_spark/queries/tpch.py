"""TPC-H-style composite queries + pivot + array surface — the relational
stress shapes the engine ships beyond the reference's own repertoire
(SURVEY.md §2 "absent join shapes / extended surface").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import Tables
from .registry import query


@query(
    "tpch_q6_forecast_revenue",
    survey="B7,D1,A3",
    oracle="""
SELECT SUM(l_extendedprice * l_discount) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-aggregate: every predicate must reach the parquet
    scan (asserted for this family in test_plans.py)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    survey="E1,G1,G3,D1",
    oracle="""
SELECT o_orderkey, o_orderdate, o_orderpriority, revenue FROM (
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           SUM(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
)
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim filter → broadcast semi-ish join → large join → top-k.
    customer(BUILDING) is broadcast; lineitem⋈orders shuffles on orderkey."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    survey="E1,E2,E5,D1",
    oracle="""
SELECT n_name,
       SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join with a cross-table equality (customer and supplier in the
    same nation) — join-order work Catalyst+AQE handles."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "pivot_status_by_segment",
    survey="D-ext",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@query(
    "explode_top_tokens",
    survey="J-array,D1,G3",
    oracle="""
SELECT token, n FROM (
    SELECT token, COUNT(*) AS n
    FROM (SELECT UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS token
          FROM documents)
    GROUP BY token
)
ORDER BY n DESC, token ASC
LIMIT 20
""",
)
def explode_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → count → top-k: the classic vocabulary scan."""
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return (
        t.documents.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@query(
    "array_functions_surface",
    survey="J-array",
    oracle="""
WITH tok AS (
    SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS tokens
    FROM documents
)
SELECT doc_id,
       tokens[1] AS first_token,
       tokens[LEN(tokens)] AS last_token,
       LIST_SLICE(tokens, 1, 5) AS first5,
       LEN(tokens) AS n_tokens,
       LIST_CONTAINS(tokens, 'spark') AS has_spark
FROM tok WHERE LEN(tokens) > 0
""",
)
def array_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = t.documents.select("doc_id", toks.alias("tokens")).where(F.size("tokens") > 0)
    return d.select(
        "doc_id",
        F.element_at("tokens", 1).alias("first_token"),
        F.element_at("tokens", -1).alias("last_token"),
        F.slice("tokens", 1, 5).alias("first5"),
        F.size("tokens").alias("n_tokens"),
        F.array_contains("tokens", "spark").alias("has_spark"),
    )
