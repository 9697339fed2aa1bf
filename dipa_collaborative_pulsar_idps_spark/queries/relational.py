"""Relational operator surface over the TPC-H-ish tables (SURVEY.md §2 D/E/F/G
rows + the extended shapes §2 lists as "absent but must ship": semi/anti/theta
joins, grouping sets, top-k).

Scale notes per query are in docstrings — every join states its intended
physical strategy (broadcast vs sort-merge) for the 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import Tables
from .registry import query

# ---------------------------------------------------------------------------
# D1 family: grouped aggregation — TPC-H Q1 pricing summary.
# Spark: partial+final HashAggregate, whole-stage codegen; one shuffle on
# (returnflag, linestatus) — 6 groups, trivially skew-free.
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    survey="D1,D14,A3",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice) AS sum_base_price,
       SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       AVG(l_quantity) AS avg_qty,
       AVG(l_extendedprice) AS avg_price,
       AVG(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# E1/E2: dimension lookups — broadcast hash joins (nation/region are tiny,
# like the reference's portMaps/dpid maps, DIPA_Controller.py:138-144).
# orders⋈customer is the large side; customer→nation→region broadcast.
# ---------------------------------------------------------------------------


@query(
    "revenue_by_nation_region",
    survey="E1,E2,A8,D1",
    oracle="""
SELECT r_name AS region, n_name AS nation,
       SUM(o_totalprice) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def revenue_by_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dims: customer/nation/region broadcast (reference's topology
    lookup E1 is exactly this shape)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("revenue"), F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Large-large join: orders⋈lineitem — sort-merge/shuffled-hash territory at
# 100 TB (both sides partitioned on orderkey; AQE picks strategy).
# ---------------------------------------------------------------------------


@query(
    "order_lineitem_rollup",
    survey="E-large,D1",
    oracle="""
SELECT o_orderpriority,
       SUM(l_extendedprice * (1 - l_discount)) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def order_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.where(F.col("o_orderstatus") == "F")
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# E7 / anti: semi & anti joins (reference F1 uses set difference = anti join).
# ---------------------------------------------------------------------------


@query(
    "semi_join_active_customers",
    survey="E7,B14",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
""",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 100000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_idle_customers",
    survey="F1,E7",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.join(
        t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Theta join (E4 shape: equi key + range predicate).
# ---------------------------------------------------------------------------


@query(
    "theta_join_big_spenders",
    survey="E4,B8",
    oracle="""
SELECT c_custkey, o_orderkey, c_acctbal, o_totalprice
FROM orders JOIN customer
  ON o_custkey = c_custkey AND o_totalprice > c_acctbal * 100
""",
)
def theta_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on custkey with theta residual (o_totalprice > bal*100):
    Spark plans the equi part as the join key and the theta as a post-filter
    — no nested-loop blowup."""
    t = Tables(spark, sf_dir)
    return t.orders.join(
        F.broadcast(t.customer),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_totalprice") > F.col("c_acctbal") * 100),
    ).select("c_custkey", "o_orderkey", "c_acctbal", "o_totalprice")


# ---------------------------------------------------------------------------
# G: top-k with deterministic tie-break.
# ---------------------------------------------------------------------------


@query(
    "top10_customers_by_spend",
    survey="G1,G3,D1",
    oracle="""
SELECT c_custkey, c_name, spend FROM (
    SELECT c_custkey, c_name, SUM(o_totalprice) AS spend
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
)
ORDER BY spend DESC, c_custkey ASC
LIMIT 10
""",
)
def top10_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → Spark TakeOrderedAndProject (no global sort)."""
    t = Tables(spark, sf_dir)
    spend = (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    return spend.orderBy(F.desc("spend"), F.asc("c_custkey")).limit(10)


@query(
    "topk_per_group_rank",
    survey="G3,H5",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
    FROM orders
) WHERE rk <= 3
""",
)
def topk_per_group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t.orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup (SURVEY §2.D "absent in reference, engine ships").
# ---------------------------------------------------------------------------


@query(
    "rollup_nation_segment",
    survey="D-ext",
    oracle="""
SELECT n_name, c_mktsegment,
       SUM(c_acctbal) AS total_bal,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""",
)
def rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(F.sum("c_acctbal").alias("total_bal"), F.count("*").alias("n_customers"))
    )


@query(
    "cube_region_status",
    survey="D-ext",
    oracle="""
SELECT r_name, o_orderstatus,
       SUM(o_totalprice) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, o_orderstatus)
""",
)
def cube_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .cube("r_name", "o_orderstatus")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# D6: universal quantifier per group (Controller1.py:340 all-calm check).
# ---------------------------------------------------------------------------


@query(
    "every_low_discount_supplier",
    survey="D6",
    oracle="""
SELECT l_suppkey, BOOL_AND(l_discount <= 0.05) AS all_low_discount,
       MAX(l_discount) AS max_discount
FROM lineitem GROUP BY l_suppkey
""",
)
def every_low_discount_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_suppkey").agg(
        F.every(F.col("l_discount") <= 0.05).alias("all_low_discount"),
        F.max("l_discount").alias("max_discount"),
    )
