"""Operator registry — the queries()/oracle_sql() contract surface.

Every operator module registers its public queries here via the
``@register`` decorator; ``__spark_entry__.py`` re-exports QUERIES and
ORACLES to the driver. Keys follow SURVEY.md §2 Part B naming
(`<category>_<op>`).

Determinism rules (FIXTURES.md §5) enforced by convention at each site:
  * float aggregates rounded on BOTH sides (Spark + DuckDB SQL);
  * every sort/top-k carries a full tie-breaking key;
  * aliases identical between the Spark plan and the oracle SQL;
  * UTC session timezone (session.ensure_confs).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "assignment4_spark.operators.scans",
    "assignment4_spark.operators.filters",
    "assignment4_spark.operators.joins",
    "assignment4_spark.operators.aggregates",
    "assignment4_spark.operators.windows",
    "assignment4_spark.operators.setops",
    "assignment4_spark.operators.scale_idioms",
    "assignment4_spark.operators.sql_suite",
    "assignment4_spark.functions.scalar",
    "assignment4_spark.operators.rag",
    "assignment4_spark.operators.vectors",
    "assignment4_spark.operators.dedup",
    "assignment4_spark.operators.sampling",
    "assignment4_spark.operators.timeseries",
    "assignment4_spark.operators.textstats",
    "assignment4_spark.operators.multimodal",
    "assignment4_spark.operators.graphs",
    "assignment4_spark.operators.sketches",
    "assignment4_spark.operators.drift",
    "assignment4_spark.operators.lakehouse",
    "assignment4_spark.streaming.batch_decl",
    "assignment4_spark.functions.udfs",
]

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB-SQL twin.

    oracle=None → the driver runs a rows-only check (SURVEY §2 legend
    "oracle:rows"); keep those rare and unit-test them instead.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
