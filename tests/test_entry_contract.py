"""Driver-contract drift guards: __spark_entry__ is the single surface
the external driver sees, so registry/priority drift (a renamed op, an
unregistered priority name, a rows-only op leaking into the hash-check
window) must fail CI here rather than surface as a driver ERR."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from assignment4_spark import registry

registry.load_all()


def test_queries_and_oracles_align():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(registry.QUERIES)
    assert set(qs) == set(registry.QUERIES)


def test_priority_names_all_registered():
    unknown = [n for n in entry._PRIORITY if n not in registry.QUERIES]
    assert unknown == [], f"stale _PRIORITY names: {unknown}"
    assert len(set(entry._PRIORITY)) == len(entry._PRIORITY), "duplicates"


def test_verification_window_is_oracled():
    """The driver hash-checks the first 50 queries() keys; a slot spent
    on a rows-only op earns only the weaker rows-only row, so one is
    allowed in the window ONLY if it has never received a SUCCESSFUL
    driver row (spark_rows non-null — an ERR row like rag_embed_hash's
    r6 canonicalizer crash counted nothing and re-checking it is the
    point, per VERDICT r6). Every other window entry must have a DuckDB
    oracle."""
    import glob
    import json
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        with open(path) as f:
            d = json.load(f)
        checked |= {
            k
            for k, v in d.items()
            if isinstance(v, dict) and v.get("spark_rows") is not None
        }

    qs, osql = entry.queries(), entry.oracle_sql()
    window = list(qs)[:50]
    wasted = [n for n in window if n not in osql and n in checked]
    assert wasted == [], f"already-checked rows-only ops in window: {wasted}"


def test_entry_query_registered():
    assert "agg_groupby_basic" in registry.QUERIES


@pytest.mark.slow
def test_oracled_outputs_are_driver_canonicalizable(spark):
    """The driver's value-hash canonicalizer sorts collected rows via
    pandas, which dies on unhashable cells: an ORACLED query emitting an
    array/map/struct column passes local parity (the local harness
    tuple-izes) and still ERRs the driver gate — exactly the round-4
    `array_funcs` failure (array<string> output → 'unhashable type:
    numpy.ndarray'). Reading .schema needs only analysis for most
    queries, but the CC-family ops (connected components and its
    consumers) and iterative trainers execute eagerly at CONSTRUCTION
    (localCheckpoint/count per round), so this sweep runs real jobs for
    those — acceptable at sf0.001, but not the free pass the name
    'schema check' suggests. The sweep covers ALL registered queries,
    rows-only included: CORRECTNESS_r06 falsified the old 'the driver
    only counts rows for rows-only ops' carve-out — the driver's pandas
    canonicalizer ran on rag_embed_hash's array<float> and ERR'd the
    row ('unhashable type: numpy.ndarray'), so every registered face
    must be flat; array-returning forms live in the composable API."""
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in registry.QUERIES.items():
        for f in fn(spark, sf).schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "map", "struct")):
                offenders.append((name, f.name, t))
    assert offenders == [], f"driver-hostile oracled outputs: {offenders}"


def test_cited_artifacts_are_tracked():
    """Driver-written evidence files (CORRECTNESS_r*.json, BENCH_*.json,
    SCALING/SHUFFLE probes) are cited by VERDICT/SURVEY/BASELINE; an
    untracked one silently vanishes from the judged history — the same
    finding recurred in the r5 AND r6 ADVICE. Fail loudly instead:
    every artifact present on disk must be in git (staged or
    committed). Runs only inside a git checkout."""
    import glob
    import pathlib
    import subprocess

    repo = pathlib.Path(__file__).resolve().parent.parent
    try:
        tracked = set(
            subprocess.run(
                ["git", "ls-files"],
                cwd=repo,
                capture_output=True,
                text=True,
                check=True,
                timeout=30,
            ).stdout.splitlines()
        )
    except (subprocess.SubprocessError, FileNotFoundError):
        import pytest

        pytest.skip("not a git checkout")
    patterns = (
        "CORRECTNESS_r*.json",
        "BENCH_r*.json",
        "BENCH_FULL*.json",
        "BENCH_LINE*.json",
        "SCALING.json",
        "SHUFFLE.json",
        "COPYCHECK.json",
        "LEAKCHECK.json",
    )
    on_disk = {
        pathlib.Path(p).name
        for pat in patterns
        for p in glob.glob(str(repo / pat))
    }
    # deliberately-ignored scratch artifacts (BENCH_*_sf*, per-round
    # regenerated COPYCHECK/LEAKCHECK) are exempt — the gate is about
    # citable evidence silently missing from history, not .gitignore
    ignored = subprocess.run(
        ["git", "check-ignore", "--stdin"],
        cwd=repo,
        input="\n".join(sorted(on_disk)),
        capture_output=True,
        text=True,
        timeout=30,
    ).stdout.splitlines()
    untracked = sorted(on_disk - tracked - set(ignored))
    assert untracked == [], (
        f"evidence artifacts on disk but not in git: {untracked} — "
        "commit them (they are cited by VERDICT/SURVEY/BASELINE)"
    )
