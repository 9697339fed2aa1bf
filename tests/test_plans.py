"""Physical-plan quality gates: the 100 TB contract, asserted.

A query that silently reads all columns, fails to push filters, or drops a
Python UDF into the hot path would pass value checks and still be wrong at
scale — these tests fail it."""

from __future__ import annotations

from pyspark.sql import functions as F

from dipa_collaborative_pulsar_idps_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_python_udf,
    assert_pushed_filters,
    plan_text,
)
from dipa_collaborative_pulsar_idps_spark.queries import REGISTRY
from dipa_collaborative_pulsar_idps_spark.queries.registry import _load_all
from dipa_collaborative_pulsar_idps_spark.tables import load_table

_load_all()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_quantity"
    )
    assert_pushed_filters(df, "GreaterThan(l_quantity,30.0)")


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    txt = plan_text(df)
    assert "l_extendedprice" not in txt.split("ReadSchema")[-1], "scan reads unused columns"


def test_dimension_joins_broadcast(spark, sf_dir):
    df = REGISTRY["revenue_by_nation_region"].fn(spark, sf_dir)
    assert_broadcast_join(df, at_least=3)  # customer, nation, region


def test_detection_spine_has_no_python_udf(spark, sf_dir):
    for name in ("suspected_bots", "counter_delta", "tpch_q1_pricing_summary",
                 "lang_id_heuristic", "minhash_lsh_near_dups"):
        assert_no_python_udf(REGISTRY[name].fn(spark, sf_dir))


def test_suspected_bots_broadcasts_global_aggregate(spark, sf_dir):
    """The ratio-of-total must not use a single-partition window."""
    df = REGISTRY["suspected_bots"].fn(spark, sf_dir)
    txt = plan_text(df)
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastHashJoin" in txt
    assert "Window" not in txt, "bias should come from broadcast agg, not a global window"


def test_topk_uses_take_ordered(spark, sf_dir):
    df = REGISTRY["top10_customers_by_spend"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_text(df), "global top-k should not global-sort"


def test_events_scan_prunes_and_pushes(spark, sf_dir):
    df = REGISTRY["suspected_bots"].fn(spark, sf_dir)
    txt = plan_text(df)
    assert "EqualTo(event_type,click)" in txt, "event_type filter not pushed"
