"""Every declared query with an oracle must hash-match DuckDB at sf0.001 —
the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from dipa_collaborative_pulsar_idps_spark.queries import REGISTRY
from dipa_collaborative_pulsar_idps_spark.queries.registry import _load_all
from dipa_collaborative_pulsar_idps_spark.testing import compare_query, duckdb_connection

_load_all()
_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_parity(name, spark, sf_dir, con):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    res = compare_query(name, df, con, spec.oracle)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert rows is not None
    assert set(df.columns) == {"src", "total_traffic", "bias"}


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q, "no queries declared"
    assert set(o) <= set(q), "oracle for undeclared query"
