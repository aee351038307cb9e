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

from .schemas import SCHEMAS
from .session import ensure_confs


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_confs(spark)
    if name == "events":
        # ts is TIMESTAMP(NANOS) — illegal for Spark's parquet reader.
        # Read nanos as long, truncate to µs (identical to DuckDB's view).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(SCHEMAS[name]).parquet(
            os.path.join(sf_dir, "events.parquet")
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.schema(SCHEMAS[name]).parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Create temp views for SQL-expressed operators."""
    for name in names or SCHEMAS:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
