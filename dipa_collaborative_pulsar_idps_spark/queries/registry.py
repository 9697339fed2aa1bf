"""Declared-query registry.

Every engine capability from SURVEY.md §2 is declared here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent ANSI-SQL oracle string for DuckDB. The driver's correctness
harness hash-compares the two at sf0.01; ``tests/test_parity.py`` does the
same locally at sf0.001.

Contract reminders:
- alias every computed column identically in Spark and SQL;
- column ORDER doesn't matter (harness sorts by name), row order doesn't
  matter (order-insensitive hash) — so no ORDER BY needed except for LIMIT
  determinism;
- any LIMIT/top-k must have a total deterministic ordering (tie-break).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    survey: str  # SURVEY.md §2 row ids this query certifies (e.g. "D1,D2")
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, *, oracle: str | None = None, survey: str = "", doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a declared query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey=survey, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {k: v.fn for k, v in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {k: v.oracle for k, v in REGISTRY.items() if v.oracle is not None}


_loaded = False


def _load_all() -> None:
    """Import every query-defining module exactly once."""
    global _loaded
    if _loaded:
        return
    from . import (  # noqa: F401
        analytic,
        analytic2,
        datapipe,
        datapipe2,
        datapipe3,
        datapipe4,
        datapipe5,
        datapipe6,
        datapipe7,
        datapipe8,
        detection,
        media,
        relational,
        relational_ext,
        relational_ext2,
        scalars,
        thresholds,
        tpch,
        tpch2,
        warehouse,
        windows,
    )

    _loaded = True
