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


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_no_hugeint(name, con):
    """No oracle may return a HUGEINT-typed column (Arrow decimal128(38,0)).

    The driver fetches oracle results via pandas, where DuckDB HUGEINT —
    the result type of SUM over any integer input, plain or windowed —
    degrades to float64 and hash-mismatches Spark's bigint even when every
    value is identical (round-2 `session_windows_30m` failure). The local
    canonicalizer sees Python ints either way, so this dtype guard is the
    only local signal for that class of driver failure.
    """
    import pyarrow as pa

    tbl = con.sql(REGISTRY[name].oracle).arrow()
    offenders = [
        f.name
        for f in tbl.schema
        if pa.types.is_decimal(f.type) and f.type.precision == 38 and f.type.scale == 0
    ]
    assert not offenders, (
        f"{name}: HUGEINT column(s) {offenders} — wrap the SUM in CAST(... AS BIGINT)"
    )


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
