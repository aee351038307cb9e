"""Local replica of the driver's oracle-differential check.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet fixtures and asserts: equal row count, equal column-name sets,
and equal values under an order-insensitive comparison (columns sorted
by name, rows sorted by their full stringified tuple — the same
normalization a value-hash needs). Value equality is EXACT (floats
included): the registered queries are responsible for rounding
(FIXTURES.md §5), so any partial-aggregation jitter shows up here
before the driver sees it.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from assignment4_spark.schemas import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Canonicalize a cell to a hashable, engine-independent value."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    # numpy scalars → python
    if hasattr(v, "item"):
        return _canon(v.item())
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def fetch_spark(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return _normalize(rows, cols)


def fetch_duckdb(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return _normalize(rows, cols)


def assert_match(name, spark_df, con, sql):
    s_cols, s_rows = fetch_spark(spark_df)
    d_cols, d_rows = fetch_duckdb(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, (
            f"{name}: first differing row #{i} (cols {s_cols}):\n  spark : {a}\n  duckdb: {b}"
        )
