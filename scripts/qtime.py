"""Per-query measurement tool for the optimization rounds.

Times selected declared queries exactly the way bench.py does (build split
from noop-sink execution, median of N on a warm session) and can capture
`.explain("formatted")` snapshots into plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/qtime.py q1 q2 ...            # time queries
  python scripts/qtime.py --reps 5 q1 ...
  python scripts/qtime.py --explain before q1  # also write plans/r13/q1_before.txt
  python scripts/qtime.py --all                # every declared query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dipa_collaborative_pulsar_idps_spark.queries import all_queries, clear_all_caches  # noqa: E402
from dipa_collaborative_pulsar_idps_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--explain", default=None, metavar="SUFFIX",
                    help="write plans/r13/<q>_<SUFFIX>.txt explain snapshots")
    ap.add_argument("--plans-dir", default="plans/r13")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dipa-qtime")
    qs = all_queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    if not args.no_warm:
        # same warmups as bench.py: JVM/catalog, Arrow-UDF workers, cogroup
        from pyspark.sql import functions as F

        qs["suspected_bots"](spark, sf_dir).write.format("noop").mode("overwrite").save()
        _warm = F.pandas_udf(lambda v: v * 1.0, "double")
        n_workers = spark.sparkContext.defaultParallelism
        spark.range(256).repartition(n_workers).select(
            _warm(F.col("id").cast("double"))
        ).write.format("noop").mode("overwrite").save()
        _a = spark.range(64).select(F.pmod("id", F.lit(8)).alias("k"), F.col("id").alias("v"))
        (
            _a.groupBy("k").cogroup(_a.groupBy("k"))
            .applyInPandas(lambda left, right: left, "k bigint, v bigint")
            .write.format("noop").mode("overwrite").save()
        )

    out: dict[str, dict] = {}
    for name in names:
        builds, runs = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            runs.append(t2 - t1)
        out[name] = {
            "total_median": round(statistics.median(b + r for b, r in zip(builds, runs)), 3),
            "build_median": round(statistics.median(builds), 3),
            "exec_median": round(statistics.median(runs), 3),
            "samples": [round(b + r, 3) for b, r in zip(builds, runs)],
        }
        if args.explain:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.explain}.txt"), "w") as f:
                f.write(plan)
        print(name, json.dumps(out[name]), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    clear_all_caches()
    spark.stop()


if __name__ == "__main__":
    main()
