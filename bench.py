"""BENCH harness: runs the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink (measures execution, not
driver-side collect/serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dipa_collaborative_pulsar_idps_spark.queries import all_queries  # noqa: E402
from dipa_collaborative_pulsar_idps_spark.session import get_spark  # noqa: E402

#: Headline set: the detection spine + one representative per operator family.
HEADLINE = [
    "suspected_bots",
    "counter_delta",
    "sustained_hot_streaks",
    "tpch_q1_pricing_summary",
    "revenue_by_nation_region",
    "order_lineitem_rollup",
    "top10_customers_by_spend",
    "topk_per_group_rank",
    "rolling_mean_per_key",
    "asof_join_last_click_before_purchase",
    "cube_region_status",
    "tpch_q8_market_share",
    "tpch_q18_large_volume_customers",
    "interval_join_error_burst",
    "dedup_exact_groups",
    "text_quality_score",
    "embedding_norms",
    "minhash_lsh_near_dups",
    "cosine_topk_neighbors",
    "global_view_anomalies",
    "session_windows_30m",
    "spend_last_30d_range_frame",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("dipa-bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM/catalog once so per-query numbers measure the queries
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
