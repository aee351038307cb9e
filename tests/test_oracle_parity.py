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


# The handful of multi-second parity rows (heavy protocol/dedup ops)
# run in the slow tier so the driver-budget pytest fits (pytest.ini);
# they remain verified by the driver's own oracle gate and by the
# in-repo full-contract verify, and `-m slow` runs them here too.
_SLOW_PARITY = {
    "dedup_pipeline_survivors", "dedup_minhash_lsh",
    "dedup_incremental_index", "stream_index_admission",
    "dedup_cluster_representative", "dedup_connected_components",
    "ts_interpolate_linear", "scan_manifest_history",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow)
        if n in _SLOW_PARITY
        else n
        for n in ORACLE_NAMES
    ],
)
def test_oracle_parity(name, spark, sf_oracle, con):
    df = registry.QUERIES[name](spark, sf_oracle)
    assert_match(name, df, con, registry.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_oracle):
    df = registry.QUERIES[name](spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
