"""Custom Python DataSources (Spark 4 DataSource API)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_once(spark: SparkSession, ds_cls) -> None:
    """Register a Python DataSource, tolerating re-registration.

    Spark raises on duplicate short-name registration and the error
    message wording is version-dependent; every call site used to carry
    its own copy of this string-matching guard — one definition keeps
    the matching logic in one place. Anything that is NOT a duplicate
    registration (API change, bad class) still raises."""
    try:
        spark.dataSource.register(ds_cls)
    except Exception as ex:
        if "exists" not in str(ex).lower() and "registered" not in str(ex).lower():
            raise
