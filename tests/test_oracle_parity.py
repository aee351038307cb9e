"""One parametrized test per registered operator: Spark vs DuckDB oracle
at sf0.01 — the exact gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from assignment4_spark import registry

from .oracle_harness import assert_match, duckdb_connect

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_connect(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, sf_oracle, con):
    df = registry.QUERIES[name](spark, sf_oracle)
    assert_match(name, df, con, registry.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_oracle):
    df = registry.QUERIES[name](spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
