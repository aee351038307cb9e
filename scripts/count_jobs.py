"""Exact Spark-job count per registered op (deterministic evidence the
shared box's timing noise cannot fake): each op runs once warm inside
its own job group; the group's job-id list length IS the op's job
count.

Usage: python scripts/count_jobs.py <op> [<op> ...]
Prints one JSON line: {"op": n_jobs, ...}
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ops = sys.argv[1:]
    registry.load_all()
    spark = get_spark("count-jobs")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, int] = {}
    for op in ops:
        registry.QUERIES[op](spark, SF).count()  # warm (first-touch pools)
        spark.catalog.clearCache()
        group = f"count-{op}"
        sc.setJobGroup(group, op)
        try:
            registry.QUERIES[op](spark, SF).count()
        finally:
            sc.setJobGroup(None, None)
        out[op] = len(tracker.getJobIdsForGroup(group))
        spark.catalog.clearCache()
    print("JOBS " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
