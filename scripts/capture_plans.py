"""Capture .explain("formatted") for named queries (guide §7.2).

Writes one file per query to the given output directory. Used to
produce the plans/r{N}/<query>_{before,after}.txt optimization-round
artifacts (run once from a pre-change worktree, once from the working
tree).

Usage::

    python scripts/capture_plans.py OUT_DIR SUFFIX name [name ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark("capture-plans")
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture what we can, note the rest
            plan = f"ERROR capturing plan: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}_{suffix}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
