"""Partition-count invariance probe — the environment class the local
suite can't see.

The driver builds its OWN SparkSession, so its parallelism, input-split
sizing, and timezone are out of our control; any operator whose result
depends on partitioning (partition-local RNG, first()-per-partition,
unstable reduce order surfacing through a float compare) would pass the
local harness and still hash-mismatch in CORRECTNESS_r{N}.json. This
probe runs EVERY oracled query against a deliberately hostile session —
3 cores, 1 MB input splits (dozens of scan partitions per fixture
table), default.parallelism=3, non-UTC timezone (ensure_confs must
override it) — and asserts exact oracle parity for each.

Too slow for pytest (full contract at sf0.01 on local[3] takes ~20 min);
run ad-hoc after touching anything partition-shaped:

    python scripts/partition_invariance_probe.py [sf_dir] [name ...]

Round-5 result (final re-run at the full 245-query surface, after the
cluster-holdout / variant-shred / profile-enrich / streaming-rest-feed
wave AND the shared-edge-helper refactor landed): 236/236 oracled pass
exact, 9/9 rows-only run clean — zero mismatches, one session.

Round-6 result (full re-run at the 247-query surface, after
merge_upsert, the scan_permissive_corrupt single-aggregate rewrite and
the review-fix wave landed): 238/238 oracled exact, 9/9 rows-only
clean — zero mismatches, one hostile session.

Round-7 result (full re-run at the 249-query surface, after the
HUGEINT/BIGINT oracle repairs, the rag_embed_hash flattening, schema
evolution + tombstones, and the clustered staging writes landed):
240/240 oracled exact, 9/9 rows-only clean — zero mismatches, one
hostile session. The late-round additions (merge_changes_feed,
stream_merge_sink + the two review-fix waves over the merge family)
re-probed as hostile-session subsets: 5/5 exact.

A path-looking first arg (contains a separator) that is not a directory
is an error, and so is a name that matches no queries() key — without
those checks a typo'd sf_dir or op name silently probes NOTHING and
exits 0, turning the gate into a rubber stamp.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.sep in args[0]:
        if not os.path.isdir(args[0]):
            raise SystemExit(f"sf_dir does not exist: {args[0]}")
        sf_dir = args.pop(0)
    elif args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    only = set(args)  # optional queries() keys: probe just these
    spark = (
        SparkSession.builder.master("local[3]")
        .appName("partition-invariance-probe")
        .config("spark.sql.session.timeZone", "Asia/Kolkata")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.default.parallelism", "3")
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod
    from tests.oracle_harness import duckdb_connect, assert_match

    con = duckdb_connect(sf_dir)
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    fails = []
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries() keys: {sorted(unknown)}")
        qs = {n: f for n, f in qs.items() if n in only}
    if not qs:
        raise SystemExit("nothing to probe")
    for name, fn in sorted(qs.items()):
        try:
            if name in osql:
                assert_match(name, fn(spark, sf_dir), con, osql[name])
            else:
                # rows-only ops: a crash here would be a driver `err` row
                assert fn(spark, sf_dir).count() >= 0
        except Exception as ex:  # noqa: BLE001 - collect, report, exit nonzero
            fails.append(name)
            print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
    print(f"DONE: {len(fails)} failures / {len(qs)} queries ({len(osql)} oracled)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
