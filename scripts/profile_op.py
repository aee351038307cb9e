"""Per-function profile of one registered op (guide §1: measure first).

Runs the op once warm, then profiles a second execution with cProfile
and prints the top functions by cumulative time, plus wall-clock.

Usage::

    python scripts/profile_op.py <op_name> [sf_dir] [top_n]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 35
    registry.load_all()
    spark = get_spark(f"profile-{name}")
    fn = registry.QUERIES[name]

    # warm: JVM, python worker pools, parquet footers
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    print(f"warm run: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    fn(spark, sf_dir).count()
    prof.disable()
    wall = time.perf_counter() - t0
    print(f"profiled run: {wall:.2f}s", file=sys.stderr)

    st = pstats.Stats(prof, stream=sys.stdout)
    st.sort_stats("cumulative")
    # restrict to this repo's frames so py4j noise doesn't drown signal
    st.print_stats("assignment4_spark", top_n)
    spark.stop()


if __name__ == "__main__":
    main()
