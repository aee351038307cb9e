"""Fill BASELINE.md §2: DuckDB oracle vs Spark wall-clock at sf0.1.

Protocol (BASELINE.md): both engines read the same local parquet; Spark
timed after session warm-up; MIN of 3 runs per query, applied
symmetrically to both engines (this box's CPU allocation is shared —
identical suites have measured 2-3x apart an hour apart; min reports
each engine's capability, the same rationale bench.py documents for
its min-of-2). Full materialization on both sides (fetchall / count).
Rows-only queries (no oracle SQL) get a Spark time and '—' for DuckDB.

Usage: python scripts/make_baseline.py [sf_dir]  (default sf0.1)
Writes the markdown table between the BASELINE_TABLE markers in
BASELINE.md (appends markers if absent) and prints a summary.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from assignment4_spark import registry
from assignment4_spark.schemas import TABLES
from assignment4_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_RUNS = 3


def best_time(fn, always_full: bool = False) -> float:
    """MIN of N_RUNS (both engines — symmetric; see module docstring).
    Unless always_full, a first run over 5 s is reported from that
    single run — that early-out exists for the brute-force O(N²)
    DuckDB oracles (minutes at sf0.1), but it must NOT apply to the
    Spark side: a one-off cold first touch (worker spawn, code cache)
    would then be recorded as the steady state."""
    ts = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
        if not always_full and ts[0] > 5.0:
            break
    return min(ts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark("baseline")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # warm-up both engines, incl. each Python-worker pool (same set as
    # bench.py: plain UDF, Arrow/pandas, Python DataSource planning) so
    # first-touch process spawning doesn't land on one query's median
    warm_sf = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    for wname, wsf in (
        ("agg_groupby_basic", sf_dir),
        ("udf_python_scalar", warm_sf),
        ("udf_pandas_scalar", warm_sf),
        ("scan_python_datasource", warm_sf),
    ):
        registry.QUERIES[wname](spark, wsf).count()
    con.execute(registry.ORACLES["agg_groupby_basic"]).fetchall()

    # Oracles that are O(N²) brute-force SQL (the honest correctness twin
    # of an LSH/matmul operator, not a sane way to execute it): DuckDB
    # runs them for MINUTES at sf0.1. Timed once via SLOW_ORACLE_SECONDS
    # (scripts/time_slow_oracles.py), injected here instead of re-run.
    from scripts.time_slow_oracles import SLOW as slow_names
    from scripts.time_slow_oracles import WRITE_PATH_PROTOCOL as wp_names

    slow = {n: None for n in slow_names}
    slow_path = os.path.join(REPO, "scripts", "slow_oracle_seconds.txt")
    if os.path.exists(slow_path):
        with open(slow_path) as f:
            for line in f:
                k, v = line.split()
                slow[k] = float(v)

    # Tripwire inputs: a single sf0.001 Spark timing per query separates
    # DATA-PROPORTIONAL queries (sf0.1 >= 3x sf0.001 — real compute) from
    # queries sitting on Spark's fixed ~0.1-0.3 s scheduling floor, where
    # a big DuckDB ratio is meaningless (BASELINE.md §3).
    tiny_sf = "/root/testdata/sf0.001"
    tiny_ok = os.path.isdir(tiny_sf)
    tripped: list[str] = []

    rows = []
    spark_total = duck_total = 0.0
    sane_spark = sane_duck = 0.0
    rp_spark = rp_duck = 0.0
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        # one untimed warm run per query: the first execution pays plan
        # compilation + codegen (and, mid-sweep, code-cache churn) that
        # is not the steady state the table claims to report
        fn(spark, sf_dir).count()
        s = best_time(lambda: fn(spark, sf_dir).count(), always_full=True)
        spark_total += s
        s_tiny = None
        if tiny_ok:
            try:
                fn(spark, tiny_sf).count()  # warm: plan compile/codegen
                t0 = time.perf_counter()
                fn(spark, tiny_sf).count()
                s_tiny = time.perf_counter() - t0
            except Exception:
                s_tiny = None
        if name in slow:
            d = slow[name]
            if d is None:
                rows.append((name, "(pending)", f"{s:.3f}", "—",
                             "DuckDB O(N²) brute-force oracle still being timed"))
            else:
                duck_total += d
                rows.append(
                    (name, f"{d:.1f}", f"{s:.3f}", f"{s / d:.3f}×",
                     "DuckDB side is the O(N²) brute-force oracle, timed once")
                )
        elif name in registry.ORACLES:
            sql = registry.ORACLES[name]
            d = best_time(lambda: con.execute(sql).fetchall())
            duck_total += d
            sane_spark += s
            sane_duck += d
            if name not in wp_names:
                rp_spark += s
                rp_duck += d
            ratio = f"{s / d:.1f}×" if d > 0 else "—"
            note = ""
            # >2x tripwire, but only for data-proportional queries — a
            # scheduling-floor query at sf0.1 has ratio noise, not a
            # compute regression
            if (
                d > 0
                and s / d > 2.0
                and s_tiny is not None
                and s_tiny > 0
                and s >= 3.0 * s_tiny
            ):
                tripped.append(name)
                note = f"TRIPWIRE: data-proportional (sf0.1 = {s / s_tiny:.1f}x sf0.001) and >2x DuckDB"
            rows.append((name, f"{d:.3f}", f"{s:.3f}", ratio, note))
        else:
            rows.append((name, "—", f"{s:.3f}", "—", "rows-only (no oracle)"))
        print(f"{name:28s} duck={rows[-1][1]:>7s} spark={rows[-1][2]:>7s}", flush=True)

    ratio_total = spark_total / duck_total if duck_total else float("nan")
    header = (
        "| Query (queries() key) | DuckDB sf0.1 (s) | Spark sf0.1 (s) | Ratio | Notes |\n"
        "|---|---|---|---|---|\n"
    )
    body = "\n".join(f"| `{n}` | {d} | {s} | {r} | {note} |" for n, d, s, r, note in rows)
    sane_ratio = sane_spark / sane_duck if sane_duck else float("nan")
    rp_ratio = rp_spark / rp_duck if rp_duck else float("nan")
    totals = (
        f"\n| **total (oracled queries)** | **{duck_total:.2f}** | "
        f"**{spark_total:.2f}** | **{ratio_total:.3g}×** | per-query min of {N_RUNS} "
        f"(symmetric); Spark includes ~0.1-0.3 s/query fixed driver+scheduling overhead |"
        f"\n| **total (sane-oracle subset — excludes the O(N²) brute-force-oracle rows)** | "
        f"**{sane_duck:.2f}** | **{sane_spark:.2f}** | **{sane_ratio:.3g}×** | "
        f"grows with every write-path protocol face added (family growth, not regression); see the read-path row for the committed headline |"
        f"\n| **total (read-path subset — additionally excludes the {len(wp_names)} write-path protocol rows)** | "
        f"**{rp_duck:.2f}** | **{rp_spark:.2f}** | **{rp_ratio:.3g}×** | "
        f"THE COMMITTED PLAN-QUALITY HEADLINE vs the 2× bar (BASELINE.md §2): "
        "every op whose oracle measures the same work; the excluded protocol faces "
        "run 3-5 real table commits against one-SELECT replay oracles "
        "(adjudicated category mismatch, VERDICT r7; flat across the 100× sweep) |"
    )
    table = header + body + totals

    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    block = f"<!-- BASELINE_TABLE -->\n{table}\n<!-- /BASELINE_TABLE -->"
    if "<!-- BASELINE_TABLE -->" in text:
        text = re.sub(
            r"<!-- BASELINE_TABLE -->.*?<!-- /BASELINE_TABLE -->",
            block,
            text,
            flags=re.S,
        )
    else:
        text = re.sub(
            r"\| Query \(queries\(\) key\).*?\n\|---.*?\n\|.*?\n",
            block + "\n",
            text,
            flags=re.S,
        )
    with open(path, "w") as f:
        f.write(text)
    print(f"\nTOTAL duckdb={duck_total:.2f}s spark={spark_total:.2f}s ratio={ratio_total:.2f}x")
    print(f"SANE-SUBSET duckdb={sane_duck:.2f}s spark={sane_spark:.2f}s ratio={sane_ratio:.2f}x")
    if tripped:
        print("TRIPWIRE (>2x DuckDB on data-proportional queries):", ", ".join(tripped))
    else:
        print("TRIPWIRE: none — no data-proportional query exceeds 2x DuckDB")
    spark.stop()


if __name__ == "__main__":
    main()
