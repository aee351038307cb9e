"""Per-job timeline of one registered op (guide §1: measure first).

Runs the op once warm, then re-runs it with the Spark event log enabled
and prints every job's wall time, stage count/task count and the call
site (job description / callsite), so the per-job floor of a
multi-action protocol face is attributable line by line.

Usage::

    python scripts/job_timeline.py <op_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment4_spark import registry  # noqa: E402
from assignment4_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    log_dir = tempfile.mkdtemp(prefix="evlog_")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    registry.load_all()
    from pyspark.sql import SparkSession

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"timeline-{name}")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    fn = registry.QUERIES[name]

    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    warm = time.perf_counter() - t0
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    marker = time.time() * 1000
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    spark.stop()
    print(f"warm {warm:.2f}s   measured {wall:.2f}s", file=sys.stderr)

    # parse the single event log file
    files = []
    for root, _dirs, fs in os.walk(log_dir):
        for f in fs:
            if f.startswith("events_") or f.startswith("local-"):
                files.append(os.path.join(root, f))
    assert len(files) == 1, files
    jobs = {}
    stage_tasks = {}
    with open(files[0]) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description")
                    or props.get("callSite.short", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(s.get("Number of Tasks", 0)
                                  for s in ev.get("Stage Infos", [])),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_tasks[si["Stage ID"]] = si.get("Number of Tasks", 0)

    rows = []
    prev_end = None
    gap_total = 0.0
    for jid, j in sorted(jobs.items()):
        if "end" not in j or j["start"] < marker:
            continue
        gap = 0.0
        if prev_end is not None:
            gap = max(0.0, (j["start"] - prev_end) / 1000.0)
        gap_total += gap
        prev_end = j["end"]
        rows.append((jid, gap, (j["end"] - j["start"]) / 1000.0,
                     len(j["stages"]), j["ntasks"], j["desc"][:90]))
    total = sum(r[2] for r in rows)
    print(f"{'job':>4} {'gap':>7} {'sec':>7} {'stg':>3} {'tsk':>4}  desc")
    for r in rows:
        print(f"{r[0]:>4} {r[1]:>7.3f} {r[2]:>7.3f} {r[3]:>3} {r[4]:>4}  {r[5]}")
    print(f"jobs={len(rows)} job_sec={total:.2f} inter_job_gap={gap_total:.2f} "
          f"wall={wall:.2f} (driver-only = wall - job_sec - gaps overlaps)")


if __name__ == "__main__":
    main()
