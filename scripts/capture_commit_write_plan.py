"""Capture the INTERIOR commit-write plan (fused vs two-step) —
the declared queries' returned frames cannot show the staging write's
plan, so this script materializes both forms over a real table's merge
input shape and writes them to plans/r{N}/.

Usage::

    python scripts/capture_commit_write_plan.py plans/r12
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from assignment4_spark.operators import lakehouse as lh  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-commit-write", cpus=8)
    # AQE off exactly as the commit write runs (lakehouse._aqe_off_*)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # the merge input shape: base snapshot union update batch, real
    # duplicate keys so latest-wins has work in every group
    df = (
        spark.range(20000)
        .select(
            (F.col("id") % 3000).alias("k"),
            (F.col("id") % 7).alias("ver"),
            F.col("id").alias("tb"),
            (F.col("id") * 2).alias("val"),
        )
        .withColumn("bucket", lh._bucket_of("k", 16))
    )

    def fmt(frame):
        return frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )

    w = Window.partitionBy("k").orderBy(F.col("ver").desc(), F.col("tb"))
    two_step = (
        df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .repartition(16, F.col("bucket"))
    )
    fused = lh._fused_latest_wins(
        df.repartition(16, F.col("bucket")),
        [F.col("bucket"), F.col("k")],
        ("ver", "tb"),
    )
    with open(
        os.path.join(out_dir, "interior_commit_write_before.txt"), "w"
    ) as f:
        f.write(
            "# merge commit write, r11 form: window PARTITION BY key,\n"
            "# then repartition by bucket - TWO Exchanges of the\n"
            "# commit's bytes\n" + fmt(two_step)
        )
    with open(
        os.path.join(out_dir, "interior_commit_write_after.txt"), "w"
    ) as f:
        f.write(
            "# merge commit write, r12 fused form: latest-wins window\n"
            "# PARTITION BY (bucket, key) rides the write's own bucket\n"
            "# exchange - ONE Exchange (HashPartitioning([bucket])\n"
            "# satisfies ClusteredDistribution([bucket, key]))\n"
            + fmt(fused)
        )
    print("captured interior commit write plans", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
