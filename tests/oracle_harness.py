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


_SPARK_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def pandas_dtype_hazards(name, spark_df, spark_rows, spark_cols, con, sql):
    """Predict driver-side pandas-dtype splits WITHOUT extra query runs.

    The r6 driver window failed 5 value-correct ops because the driver
    canonicalizes through pandas: DuckDB's SUM over any integer type
    returns HUGEINT, which `.df()` renders float64, while Spark's
    non-null long collects as int64 — same values, different hash. This
    replica's fetchall() path saw Python ints on both sides and stayed
    green, so local green failed to predict driver red. This check
    closes that gap from the TYPE level: DuckDB relation types bind
    lazily (con.sql(sql).types — no execution), and the Spark side is
    schema + observed NULLs from the already-collected rows.

    Flags (each a measured driver-hash killer):
      * duck HUGEINT/DECIMAL/DOUBLE vs non-null Spark integral
        (float64 vs int64 — the r6 signature);
      * Spark DECIMAL output at all (toPandas renders object[Decimal]
        vs DuckDB's float64 — the r01/r02 agg_decimal_money lesson:
        finish decimal pipelines with a lossless cast to DOUBLE);
      * duck integral vs Spark float (int64 vs float64, reverse split).
    NULL-bearing integral columns are exempt: NaN forces float64 on
    BOTH sides, which is exactly why r6's ts_attribution_lasttouch
    stayed green with a float64 oracle frame.
    """
    rel = con.sql(sql)
    duck_types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    nulls = {
        c: any(r[i] is None for r in spark_rows)
        for i, c in enumerate(spark_cols)
    }
    hazards = []
    for c, stype in spark_df.dtypes:
        dtype = duck_types.get(c)
        if dtype is None:
            continue
        duck_floaty = (
            dtype in ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT")
            or dtype.startswith("DECIMAL")
        )
        duck_int = dtype in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")
        if stype.startswith("decimal"):
            hazards.append(
                f"{name}.{c}: Spark {stype} → pandas object[Decimal] vs "
                f"DuckDB {dtype} → float64 (cast the output to DOUBLE)"
            )
        elif stype in _SPARK_INTEGRAL and duck_floaty and not nulls[c]:
            hazards.append(
                f"{name}.{c}: non-null Spark {stype} → int64 vs DuckDB "
                f"{dtype} → float64 (CAST the oracle column AS BIGINT)"
            )
        elif stype in ("float", "double") and duck_int and not nulls[c]:
            # NULL exemption mirrors rule 2's: NaN forces the DuckDB
            # int column to float64 too, so both frames agree
            hazards.append(
                f"{name}.{c}: Spark {stype} → float64 vs DuckDB {dtype} "
                f"→ int64 (align the oracle cast)"
            )
    return hazards


def assert_match(name, spark_df, con, sql):
    raw_cols = spark_df.columns
    raw_rows = [tuple(r) for r in spark_df.collect()]
    s_cols, s_rows = _normalize(raw_rows, raw_cols)
    d_cols, d_rows = fetch_duckdb(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, (
            f"{name}: first differing row #{i} (cols {s_cols}):\n  spark : {a}\n  duckdb: {b}"
        )
    hazards = pandas_dtype_hazards(name, spark_df, raw_rows, raw_cols, con, sql)
    assert hazards == [], (
        f"{name}: values match but the driver's pandas canonicalizer would "
        f"see split dtypes:\n  " + "\n  ".join(hazards)
    )
