"""Sorts, limits, set operations (SURVEY.md §2 B.6).

Generalizes the reference's score-ordered result lists (A18), top-5 web
results (A21) and result-set concatenation (A23).

Scale notes: a global ORDER BY is a range-partitioned sort (sampled
boundaries, fully parallel); ORDER BY + LIMIT k is planned as TakeOrdered
— each task keeps its local top-k, the driver merges k×tasks rows, so a
global top-10 never sorts the full table. Set ops are aggregates
(distinct = hash agg; intersect/except = anti/semi shapes), shuffling
only the distinct keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register


@register(
    "sort_multikey_nulls",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN value < 25 THEN NULL ELSE value END AS v
    FROM events
    WHERE user_id < 10
    ORDER BY event_type DESC, v ASC NULLS LAST, event_id
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with mixed direction and explicit null placement;
    event_id makes the total order fully deterministic."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return ev.select(
        "event_id",
        "event_type",
        F.when(F.col("value") < 25, None).otherwise(F.col("value")).alias("v"),
    ).orderBy(F.col("event_type").desc(), F.col("v").asc_nulls_last(), F.col("event_id"))


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (ties broken by key) — planned as
    TakeOrderedAndProject, not a full sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
    ORDER BY c_custkey, c_mktsegment
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping segments (duplicates preserved) —
    the reference's result concatenation (A23)."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b).orderBy("c_custkey", "c_mktsegment")


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
    ORDER BY c_custkey
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b).distinct().orderBy("c_custkey")


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 2000
    ORDER BY c_custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 2000).select("c_custkey")
    return a.intersect(b).orderBy("c_custkey")


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 2000
    ORDER BY c_custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 2000).select("c_custkey")
    return a.subtract(b).orderBy("c_custkey")  # subtract = EXCEPT DISTINCT


@register(
    "set_unpivot",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part WHERE p_partkey < 50
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE)
    FROM part WHERE p_partkey < 50
    ORDER BY p_partkey, metric
    """,
)
def set_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long, a.k.a. melt): per-part metrics become
    (metric, value) rows. Narrow per-row fan-out — no shuffle; the
    orderBy here is only for the deterministic comparison."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 50)
        .select("p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size"))
    )
    return p.unpivot(
        "p_partkey", ["p_retailprice", "p_size"], "metric", "value"
    ).orderBy("p_partkey", "metric")
