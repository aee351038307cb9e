"""Custom Python DataSources (Spark 4 DataSource API)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_once(spark: SparkSession, ds_cls) -> None:
    """Register a Python DataSource, tolerating re-registration.

    Spark 4.1 does not raise on a duplicate short name at all (it WARNs
    and replaces — verified live), but versions that do raise tag the
    error with the DATA_SOURCE_ALREADY_EXISTS condition. Only THAT
    condition is swallowed; everything else (API change, bad class, a
    failure whose message merely contains 'exists'/'registered' — the
    hole the old substring match left open) propagates."""
    try:
        spark.dataSource.register(ds_cls)
    except Exception as ex:
        get_cond = getattr(ex, "getCondition", None) or getattr(
            ex, "getErrorClass", None
        )
        cond = get_cond() if callable(get_cond) else None
        if cond != "DATA_SOURCE_ALREADY_EXISTS":
            raise
