"""Local oracle-parity harness — mirrors the driver's t2 check.

For each declared query: run the Spark DataFrame and the DuckDB oracle SQL on
the same parquet tables, then compare row count, column-name set, and an
order-insensitive, round-off-tolerant canonical form of the values.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's pre-registered table views."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v) -> str:
    """Canonical string for one value: floats → 9 significant digits,
    timestamps → ISO (µs), NULL/NaN → '∅'."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0:
            return "0"
        return f"{v:.9e}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle: str,
) -> ParityResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    o_rel = con.sql(oracle)
    o_cols = list(o_rel.columns)
    o_rows = o_rel.fetchall()

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
        return ParityResult(name, False, f"columns differ: spark={s_cols} oracle={o_cols}")
    if len(s_rows) != len(o_rows):
        return ParityResult(name, False, f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
    sc = _canon_rows([c.lower() for c in s_cols], s_rows)
    oc = _canon_rows([c.lower() for c in o_cols], o_rows)
    if sc != oc:
        diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        return ParityResult(name, False, f"value mismatch, first diffs: {diff}")
    return ParityResult(name, True, f"{len(s_rows)} rows")


def run_parity(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[ParityResult]:
    from .queries import REGISTRY
    from .queries.registry import _load_all

    _load_all()
    con = duckdb_connection(sf_dir)
    results = []
    for qname, spec in REGISTRY.items():
        if names and qname not in names:
            continue
        if spec.oracle is None:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            results.append(compare_query(qname, df, con, spec.oracle))
        except Exception as e:  # noqa: BLE001 - harness reports, not raises
            results.append(ParityResult(qname, False, f"EXCEPTION: {e}"))
    return results
