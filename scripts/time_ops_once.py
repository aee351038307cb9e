"""Time a list of registered ops in one fresh session: warm once, then
N timed rounds per op, print per-op MIN as one JSON line (guide §1 —
used subprocess-paired against a second tree by ab_two_trees.sh-style
drivers; each tree's suite runs in its own process so neither inherits
the other's JVM/file-status caches).

Usage: python scripts/time_ops_once.py <rounds> <op> [<op> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1])
    ops = sys.argv[2:]
    registry.load_all()
    spark = get_spark("time-ops-once")
    best: dict[str, float] = {}
    for op in ops:
        registry.QUERIES[op](spark, SF).count()  # warm
        spark.catalog.clearCache()
    for _ in range(rounds):
        for op in ops:
            t0 = time.perf_counter()
            registry.QUERIES[op](spark, SF).count()
            dt = time.perf_counter() - t0
            best[op] = min(best.get(op, 1e9), dt)
            spark.catalog.clearCache()
    print("RESULT " + json.dumps({k: round(v, 3) for k, v in best.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
