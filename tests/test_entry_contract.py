"""Driver-contract drift guards: __spark_entry__ is the single surface
the external driver sees, so registry/priority drift (a renamed op, an
unregistered priority name, a rows-only op leaking into the hash-check
window) must fail CI here rather than surface as a driver ERR."""

from __future__ import annotations

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
    allowed in the window ONLY if it has never received a driver row at
    all (a first-ever rows-only row is still evidence; a repeat one is
    a wasted slot). Every other window entry must have a DuckDB oracle."""
    import glob
    import json
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        with open(path) as f:
            d = json.load(f)
        checked |= {k for k, v in d.items() if isinstance(v, dict)}

    qs, osql = entry.queries(), entry.oracle_sql()
    window = list(qs)[:50]
    wasted = [n for n in window if n not in osql and n in checked]
    assert wasted == [], f"already-checked rows-only ops in window: {wasted}"


def test_entry_query_registered():
    assert "agg_groupby_basic" in registry.QUERIES


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
    'schema check' suggests. Rows-only ops may emit complex types — the
    driver only counts their rows (rag_embed_hash's array<float>
    embedding IS its output contract)."""
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in registry.QUERIES.items():
        if name not in registry.ORACLES:
            continue
        for f in fn(spark, sf).schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "map", "struct")):
                offenders.append((name, f.name, t))
    assert offenders == [], f"driver-hostile oracled outputs: {offenders}"
