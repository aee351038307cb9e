"""Source loading helpers (SURVEY.md §2 B.1 substrate).

``table()`` is the single entry point every operator uses to read a
fixture table: explicit schema (no inference — SURVEY §1.3), UTC session
timezone applied first (FIXTURES.md §5). Explicit schemas keep column
pruning + predicate pushdown effective and make the engine portable to a
cluster where the catalog, not inference, defines types.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import SCHEMAS
from .session import ensure_confs

# events.ts physical unit per parquet file path ('ns' or 'us'), sniffed
# once from the footer. The fixture generator has shipped both
# TIMESTAMP(NANOS) (round 1) and TIMESTAMP(MICROS) (round 3) footers, so
# the loader adapts instead of hard-coding a unit. One footer read per
# path per process — negligible even with thousands of files, since only
# the first file's footer is consulted (the generator writes one unit per
# dataset).
_TS_UNIT_CACHE: dict[str, str] = {}


def _events_ts_unit(path: str) -> str:
    unit = _TS_UNIT_CACHE.get(path)
    if unit is None:
        import pyarrow.parquet as pq

        unit = pq.read_schema(path).field("ts").type.unit  # 'ns' | 'us' | 'ms'
        _TS_UNIT_CACHE[path] = unit
    return unit


# Analyzed-plan cache per live session: the fixture files are immutable
# (read-only /root/testdata), so the DataFrame built for a (sf_dir, table)
# pair can be handed out again instead of re-running file listing + py4j
# relation setup on every operator call. At 200+ queries × 2-4 tables each
# this shaves seconds of pure fixed overhead off a bench suite without
# changing any plan (DataFrames are immutable; derived layouts under
# spark-warehouse never go through table()).
#
# Keyed by id(session) with a strong ref held alongside (so the id can't
# be recycled while the entry lives), and entries for STOPPED sessions are
# evicted on every access. A WeakKeyDictionary cannot do this job: the
# cached DataFrames strongly reference their session, so the value→key
# cycle keeps the weakref alive forever and stopped sessions' plans would
# be pinned for process lifetime.
_TABLE_CACHE: dict[int, tuple[SparkSession, dict]] = {}


def _session_stopped(spark: SparkSession) -> bool:
    try:
        return spark.sparkContext._jsc is None
    except Exception:
        return True


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_confs(spark)
    for sid in [s for s, (sess, _) in _TABLE_CACHE.items() if _session_stopped(sess)]:
        del _TABLE_CACHE[sid]
    _, cache = _TABLE_CACHE.setdefault(id(spark), (spark, {}))
    key = (sf_dir, name)
    cached = cache.get(key)
    if cached is None:
        cached = _load_table(spark, sf_dir, name)
        cache[key] = cached
    return cached


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        path = os.path.join(sf_dir, "events.parquet")
        if _events_ts_unit(path) == "ns":
            # TIMESTAMP(NANOS) is illegal for Spark's parquet reader. Read
            # nanos as long, truncate to µs (identical to DuckDB's view).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            raw = spark.read.schema(SCHEMAS[name]).parquet(path)
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        # MICROS (NTZ) reads natively; cast NTZ→TIMESTAMP under the UTC
        # session timezone (ensure_confs) is value-identical to DuckDB's
        # naive reading, and keeps one ts type across both fixture eras.
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType())
                for f in SCHEMAS[name]
            ]
        )
        raw = spark.read.schema(schema).parquet(path)
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return spark.read.schema(SCHEMAS[name]).parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Create temp views for SQL-expressed operators."""
    for name in names or SCHEMAS:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
