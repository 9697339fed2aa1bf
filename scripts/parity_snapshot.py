"""Full-surface driver-style correctness gate → PARITY_r{N}.json.

Runs EVERY declared query on a VANILLA SparkSession (the driver's
environment — no engine conf factory) against the DuckDB oracle at sf0.01,
with the same canonicalization the driver uses (row count + column set +
order-insensitive value hash via testing.compare_query), and records the
machine-readable result at the repo root. Queries without an oracle get a
rows-only check (runs, returns a count).

This is the release gate that protects the ~100 queries the driver's
50-row CORRECTNESS sample never draws.

Usage:  python scripts/parity_snapshot.py <round-number> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .getOrCreate()
    )  # vanilla, like the driver
    from dipa_collaborative_pulsar_idps_spark.queries import REGISTRY
    from dipa_collaborative_pulsar_idps_spark.queries.registry import _load_all
    from dipa_collaborative_pulsar_idps_spark.testing import (
        compare_query,
        duckdb_connection,
    )

    _load_all()
    con = duckdb_connection(sf_dir)
    out, n_ok, n_fail = {}, 0, 0
    t0 = time.time()
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                out[name] = {"status": "rows_only", "rows": df.count()}
                n_ok += 1
            else:
                r = compare_query(name, df, con, spec.oracle)
                out[name] = {"status": "ok" if r.ok else "FAIL", "detail": r.detail}
                n_ok += r.ok
                n_fail += not r.ok
        except Exception as e:  # noqa: BLE001 - gate reports, not raises
            out[name] = {"status": "FAIL", "detail": f"EXCEPTION: {e}"}
            n_fail += 1
        print(name, out[name]["status"], flush=True)
    artifact = {
        "round": rnd,
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "n_oracles": sum(1 for s in REGISTRY.values() if s.oracle is not None),
        "n_pass": n_ok,
        "n_fail": n_fail,
        "elapsed_sec": round(time.time() - t0, 1),
        "results": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"PARITY_r{rnd}.json",
    )
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(out)} pass, {n_fail} fail -> {path}")
    from dipa_collaborative_pulsar_idps_spark.queries import clear_all_caches

    clear_all_caches()  # release memoized persisted frames for this sf_dir
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
