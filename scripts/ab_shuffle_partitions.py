"""Paired A/B of spark.sql.shuffle.partitions values (guide §1: the
only trustworthy comparison on this shared box is alternating variants
inside ONE loop in ONE session and comparing medians).

Usage: python scripts/ab_shuffle_partitions.py A B op [op ...]
Runs each op alternately under partitions=A and partitions=B for
N_ROUNDS rounds; prints per-op medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402

N_ROUNDS = 5
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    ops = sys.argv[3:]
    registry.load_all()
    spark = get_spark("ab-shuffle-partitions")
    # first table() call applies ensure_confs once; afterwards our
    # manual sets stick for the rest of the session
    for op in ops:
        registry.QUERIES[op](spark, SF).count()  # warm (applies confs)
    results: dict[str, dict[str, list[float]]] = {
        op: {a: [], b: []} for op in ops
    }
    for r in range(N_ROUNDS):
        for op in ops:
            # alternate the within-pair order every round: the first
            # run after clearCache pays cold file/status caches that
            # the second inherits — a fixed order silently biases the
            # comparison toward whichever variant runs second
            order = (a, b) if r % 2 == 0 else (b, a)
            for val in order:
                spark.conf.set("spark.sql.shuffle.partitions", val)
                t0 = time.perf_counter()
                registry.QUERIES[op](spark, SF).count()
                results[op][val].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    for op in ops:
        ma = statistics.median(results[op][a])
        mb = statistics.median(results[op][b])
        print(
            f"{op:35s} p={a}: {ma:6.2f}s  p={b}: {mb:6.2f}s  "
            f"ratio {ma / mb:5.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
