"""Benchmark harness (driver contract: one JSON line on stdout).

Times every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is fully
materialized via a count of the result (the driver's smoke does
collect(); count() forces the same plan without shipping rows through
Arrow, keeping the number an engine-time, not serialization-time).

Prints: {"metric": "total_query_sec", "value": N, "unit": "sec",
         "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from assignment4_spark import registry
from assignment4_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    registry.load_all()
    spark = get_spark("assignment4_spark-bench")

    # Warm up the JVM + parquet footers, plus each Python-worker pool the
    # suite touches (plain UDF, Arrow/pandas, Python DataSource planning)
    # so per-query numbers measure execution, not first-touch process
    # spawning (~5-7 s the first time a pool is used in a fresh session).
    warm_sf = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    for warm in (
        ("agg_groupby_basic", sf_dir),
        ("udf_python_scalar", warm_sf),
        ("udf_pandas_scalar", warm_sf),
        ("scan_python_datasource", warm_sf),
    ):
        try:
            registry.QUERIES[warm[0]](spark, warm[1]).count()
        except Exception as e:
            print(f"bench: warm-up {warm[0]} failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query must not kill the bench
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
