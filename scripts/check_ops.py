"""Spot-check oracle parity for a subset of registered ops.

Usage: python scripts/check_ops.py <op_name> [<op_name> ...]
Runs each op's Spark plan and DuckDB oracle at sf0.01 through the same
assert_match the test suite uses. Faster than a full pytest run while
iterating on a new operator.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import assert_match, duckdb_connect  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    registry.load_all()
    names = sys.argv[1:] or sorted(registry.QUERIES)
    spark = get_spark("check-ops")
    con = duckdb_connect(SF)
    failed = []
    for name in names:
        try:
            df = registry.QUERIES[name](spark, SF)
            if name in registry.ORACLES:
                assert_match(name, df, con, registry.ORACLES[name])
                print(f"PASS  {name}")
            else:
                n = df.count()
                print(f"ROWS  {name}: {n} rows")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:500]}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
