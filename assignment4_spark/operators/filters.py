"""Projection / filter / predicate operators (SURVEY.md §2 B.2).

Generalizes the reference's client-side `.pdf` suffix filter
(parser_pinecone_storage.py:44) and metadata truncation projection
(parser_pinecone_storage.py:149-153) to the full predicate surface.

Scale notes: every predicate here is a Catalyst expression, so it is
pushed into the parquet scan (PushedFilters) and evaluated inside
whole-stage codegen — at 100 TB these queries read only the row groups
whose min/max stats can match. Per-row arithmetic is NOT rounded:
IEEE-double expressions are bit-identical across engines, and rounding
is only needed where partial-aggregation order varies (aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register


@register(
    "proj_select_alias",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity * 2.5 + 1               AS scaled_qty,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    WHERE l_orderkey <= 1000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def proj_select_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns + aliasing (reference metadata projection A12)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            (F.col("l_quantity") * 2.5 + 1).alias("scaled_qty"),
            # concat, not concat_ws: || yields NULL when a side is NULL
            # while concat_ws silently skips it — a NULL flag would
            # diverge from the oracle's || semantics
            F.concat(
                F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")
            ).alias("flag_status"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_conjunct",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08)
      AND NOT (l_returnflag = 'A' OR l_linestatus = 'O')
    ORDER BY l_orderkey, l_linenumber
    """,
)
def filter_conjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-predicate AND/OR/NOT — all pushed to the scan."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 30)
            & F.col("l_discount").between(0.02, 0.08)
            & ~((F.col("l_returnflag") == "A") | (F.col("l_linestatus") == "O"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#3', 'Brand#5')
      AND p_size BETWEEN 10 AND 40
      AND p_name LIKE '%a%'
      AND p_type NOT LIKE 'SMALL%'
    ORDER BY p_partkey
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_brand").isin("Brand#1", "Brand#3", "Brand#5")
            & F.col("p_size").between(10, 40)
            & F.col("p_name").like("%a%")
            & ~F.col("p_type").like("SMALL%")
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


@register(
    "filter_null_semantics",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN value < 50 THEN NULL ELSE value END  AS v,
             CASE WHEN value < 40 THEN NULL ELSE value END  AS w
      FROM events
    )
    SELECT
      COUNT(*)                                        AS n_total,
      COUNT(*) FILTER (WHERE v IS NULL)               AS n_null,
      COUNT(*) FILTER (WHERE v IS NOT NULL)           AS n_not_null,
      COUNT(*) FILTER (WHERE v IS NOT DISTINCT FROM w) AS n_nullsafe_eq,
      COUNT(v)                                        AS n_count_skips_null
    FROM e
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (<=>) — the reference's
    permissive error-isolation (A28: failed parses become nulls, not
    crashes) demands exact three-valued-logic semantics."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        F.when(F.col("value") < 50, None).otherwise(F.col("value")).alias("v"),
        F.when(F.col("value") < 40, None).otherwise(F.col("value")).alias("w"),
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_null"),
        F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_not_null"),
        F.count(F.when(F.col("v").eqNullSafe(F.col("w")), 1)).alias("n_nullsafe_eq"),
        F.count("v").alias("n_count_skips_null"),
    )
