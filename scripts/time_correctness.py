"""Time a driver-style correctness pass (Spark collect + DuckDB oracle)
for every registered query at sf0.01, printing per-query seconds.

Usage: python scripts/time_correctness.py [start_name]
Writes /tmp/correctness_timing.json as it goes (crash-resilient).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import duckdb_connect, fetch_duckdb, fetch_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = "/tmp/correctness_timing.json"


def main() -> None:
    registry.load_all()
    spark = get_spark("time-correctness")
    con = duckdb_connect(SF_DIR)
    results: dict[str, dict] = {}
    start_at = sys.argv[1] if len(sys.argv) > 1 else None
    started = start_at is None
    for name, fn in registry.QUERIES.items():
        if not started:
            if name == start_at:
                started = True
            else:
                continue
        t0 = time.perf_counter()
        rec: dict = {}
        try:
            s_cols, s_rows = fetch_spark(fn(spark, SF_DIR))
            rec["spark_s"] = round(time.perf_counter() - t0, 2)
            t1 = time.perf_counter()
            sql = registry.ORACLES.get(name)
            if sql is None:
                rec["oracle_s"] = 0.0
                rec["match"] = None
            else:
                d_cols, d_rows = fetch_duckdb(con, sql)
                rec["oracle_s"] = round(time.perf_counter() - t1, 2)
                rec["match"] = bool(s_cols == d_cols and s_rows == d_rows)
        except Exception as e:
            rec["err"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        rec["total_s"] = round(time.perf_counter() - t0, 2)
        results[name] = rec
        print(f"{name}: {rec}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    tot = sum(r.get("total_s", 0) for r in results.values())
    bad = [n for n, r in results.items() if r.get("match") is False or "err" in r]
    print(f"TOTAL {tot:.1f}s over {len(results)} queries; mismatches/errors: {bad}")


if __name__ == "__main__":
    main()
