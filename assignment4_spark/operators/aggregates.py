"""Aggregation operators (SURVEY.md §2 B.4).

Generalizes the reference's only aggregation-like behaviors — distinct
title enumeration (ra/agent.py:69-77), first-occurrence dedup
(ra/server.py:30-50) and list-append accumulation (ra/agent.py:33-41) —
to a full groupBy/rollup/cube/grouping-sets surface.

Scale notes: every agg here is a hash aggregate with map-side partial
aggregation (Spark does this automatically for all built-in aggregates),
so the shuffle carries one row per (partition × group), not per input
row. Group cardinalities are tiny relative to input (returnflag ×
linestatus = 6 groups; event_type ~ a handful), which is exactly the
shape that scales to 100 TB: the shuffle is O(groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register

# Money-scale sums (magnitude ~1e9 at sf0.1) are rounded to 2dp: a double
# holds ~15-16 significant digits, so partial-aggregation order noise
# (~1e-6 absolute at that magnitude) sits safely below the rounding
# boundary. Ratios/averages (magnitude ~1e0-1e5) get 6dp.
SUM_DP = 2
AVG_DP = 6


@register(
    "agg_groupby_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the flagship query (SURVEY §7 M0).

    Plan shape: parquet scan (only 7 of 11 columns read; shipdate filter
    pushed to the scan) → partial hash agg → shuffle on 6 groups → final
    agg → sort. At 100 TB the shuffle is 6 rows × partitions.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), SUM_DP).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), SUM_DP).alias("sum_base_price"),
            F.round(F.sum(disc_price), SUM_DP).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), SUM_DP).alias("sum_charge"),
            F.round(F.avg("l_quantity"), AVG_DP).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), AVG_DP).alias("avg_price"),
            F.round(F.avg("l_discount"), AVG_DP).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*)                AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type (reference A16/A17 dedup intent).

    Spark expands count(distinct) into a two-phase aggregate (expand +
    partial) — no driver-side set(). Scales with #distinct keys.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


_KMV_K = 256


@register(
    "agg_approx_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
        FROM events
        WHERE user_id IS NOT NULL
    ), r AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
               COUNT(*)    OVER (PARTITION BY event_type)              AS n
        FROM h
    )
    SELECT event_type,
           CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
                ELSE ROUND(({_KMV_K - 1} * 4294967296.0) / hv, 2)
           END AS approx_users
    FROM r
    WHERE rn = CASE WHEN n < {_KMV_K} THEN n ELSE {_KMV_K} END
    ORDER BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) approximate distinct users per event_type.

    The estimator keeps only the k=256 smallest 32-bit hashes per group —
    constant memory per group at 100 TB, same shape as HLL — and estimates
    |D| = (k-1) / h_(k) with h_(k) normalized to [0,1). Unlike HLL++
    (whose sketch bytes are engine-specific), KMV over md5 is bit-for-bit
    reproducible in any engine, so the DuckDB oracle checks the exact
    estimate, not just an error band. Groups with fewer than k distinct
    hashes fall back to the exact count (standard KMV behavior).

    Scale shape: distinct on (event_type, hv) is map-side combinable;
    the k-smallest selection is a row_number window with a LITERAL
    rank <= k filter, which InferWindowGroupLimit turns into a
    per-map-task top-k BEFORE the exchange (plan-gated) — the reducer
    sees at most k rows per (group, map task), never the full distinct
    set, so per-group memory is bounded at any cardinality. Count and
    k-th value then come from a plain aggregation over the kept rows
    (cnt<k ⇒ the group had fewer than k distinct values ⇒ exact count).
    See also agg_hll_distinct for Spark's native HLL++ path. The
    estimator branch (n ≥ k) IS live at sf0.1 (1500 distinct users per
    event_type ≥ k=256 — the earlier "dead at fixture cardinalities"
    note was only true of sf0.01) and is additionally pinned by a
    pure-Python replay unit test
    (tests/test_properties.py::test_kmv_estimator_branch_matches_replay).
    """
    ev = table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    return kmv_estimate(h, "event_type", "hv").orderBy("event_type")


def kmv_estimate(h: DataFrame, group_col: str, hash_col: str, k: int = _KMV_K) -> DataFrame:
    """(group, distinct 32-bit hash) → (group, approx_users) via KMV.
    Literal rank<=k filter so the window prunes map-side (WindowGroupLimit).
    NULL hashes are dropped first — countDistinct semantics (a NULL key
    is no distinct value), and Spark's NULLS-FIRST window order would
    otherwise hand a NULL one of the k slots while DuckDB's NULLS-LAST
    keeps the true k-th: a silent cross-engine overestimate."""
    w = Window.partitionBy(group_col).orderBy(hash_col)
    kept = (
        h.filter(F.col(hash_col).isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(k))
    )
    return (
        kept.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("cnt"), F.max(hash_col).alias("kth"))
        .select(
            group_col,
            F.when(F.col("cnt") < F.lit(k), F.col("cnt").cast("double"))
            .otherwise(F.round(F.lit(float((k - 1) * 4294967296)) / F.col("kth"), 2))
            .alias("approx_users"),
        )
    )


@register(
    "agg_having_filterclause",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                                              AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F')           AS n_finished,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2) AS big_revenue
    FROM orders
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 50
    ORDER BY o_orderpriority
    """,
)
def agg_having_filterclause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + FILTER(WHERE) conditional aggregates via when/otherwise."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.round(
                F.sum(F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))), SUM_DP
            ).alias("big_revenue"),
        )
        .filter(F.col("n_orders") > 50)
        .orderBy("o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(c_custkey) AS n_customers
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region → nation → grand total."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    # region/nation are tiny dims: broadcast them, stream customer.
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), SUM_DP).alias("total"))
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(), F.col("o_orderstatus").asc_nulls_first()
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (same Catalyst Expand)."""
    from ..io_util import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
           ROUND(VAR_SAMP(l_discount), 6)         AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates; rounded per FIXTURES §5 (4dp for stddev of
    money-scale values — its sampling noise across partial-agg orders is
    larger than a sum's)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.var_samp("l_discount"), AVG_DP).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), AVG_DP).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), SUM_DP).alias(
                "covar_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           ROUND(MEDIAN(o_totalprice), 6) AS median_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 6) AS p90_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Spark 4 `percentile`; interpolating, matches
    DuckDB QUANTILE_CONT/MEDIAN). Exact percentile shuffles whole groups —
    at 100 TB swap for approx_percentile; exact kept for oracle parity."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), AVG_DP).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), AVG_DP).alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_collect_ordered",
    oracle="""
    SELECT l_orderkey,
           STRING_AGG(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS line_ids
    FROM lineitem
    WHERE l_orderkey <= 100
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered accumulation (reference A22 intermediate_steps
    append semantics): collect_list over a sorted array, joined to a string.
    array_sort makes the result order-independent of partial-agg order."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("l_linenumber"))).cast("array<string>"), ","
            ).alias("line_ids")
        )
        .orderBy("l_orderkey")
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT DATE_TRUNC('day', ts) AS day,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events
    GROUP BY day
    ORDER BY day
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): daily counts per event_type as columns.

    The value list is EXPLICIT — with it, Spark pivots in a single
    aggregation pass; without it, it must first run a distinct() job to
    discover the columns (a full extra scan at 100 TB). Missing cells
    coalesce to 0 to match SQL's COUNT(CASE...) semantics."""
    ev = table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = (
        # cast to DATE: DuckDB's DATE_TRUNC('day', ts) yields DATE, Spark's a timestamp
        ev.withColumn("day", F.date_trunc("day", F.col("ts")).cast("date"))
        .groupBy("day")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    ).orderBy("day")


@register(
    "agg_argminmax",
    oracle="""
    WITH j AS (SELECT c_mktsegment, o_orderkey, o_totalprice
               FROM orders JOIN customer ON o_custkey = c_custkey),
    r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
          FROM j)
    SELECT c_mktsegment,
           MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS top_orderkey,
           ROUND(MAX(o_totalprice), 2) AS top_price,
           MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS bottom_orderkey,
           ROUND(MIN(o_totalprice), 2) AS bottom_price
    FROM r
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argument-extremes per group via max_by/min_by with a STRUCT
    ordering key — the struct's second field is the tie-break, so the
    result is deterministic even on duplicate prices (DuckDB 1.0's
    arg_max has no tie-break, hence the oracle's row_number form)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias(
                "top_orderkey"
            ),
            F.round(F.max("o_totalprice"), 2).alias("top_price"),
            F.min_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias(
                "bottom_orderkey"
            ),
            F.round(F.min("o_totalprice"), 2).alias("bottom_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_histogram",
    oracle="""
    WITH b AS (SELECT CASE WHEN o_totalprice < 0 THEN 0
                           WHEN o_totalprice >= 500000 THEN 21
                           ELSE CAST(FLOOR((o_totalprice - 0) / (500000.0 / 20)) AS INT) + 1
                      END AS bucket,
                      o_totalprice
               FROM orders)
    SELECT bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM b
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram via width_bucket (20 equal bins over
    [0, 500000), bucket 0/21 = under/overflow) — the single-pass
    distributed histogram shape: one narrow bucket projection + one
    partial-aggregated groupBy; no sorting, no per-bin scans. (DuckDB
    1.0 has no width_bucket; the oracle emulates it with the same
    floor arithmetic.)"""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(20))
            .cast("int")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "agg_decimal_money",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DECIMAL(38,2)) AS DOUBLE)        AS gross,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 AS DECIMAL(5,2))
               - CAST(l_discount AS DECIMAL(18,2)))
                     AS DECIMAL(38,4)) AS DOUBLE)        AS adj,
           COUNT(*)                                     AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-DECIMAL money aggregation — the financial-correctness twin
    of the double-typed aggregates everywhere else in the suite: cast to
    DECIMAL(18,2) BEFORE summing, so the result is exact and
    ASSOCIATIVE — no partial-aggregation-order jitter across executors.
    At 100 TB this is the difference between a ledger that reconciles
    and one that drifts: double partial sums differ by reduction order;
    decimal sums cannot. The reference has no decimal semantics at all
    (SURVEY §1.2); this pins the engine's.

    The aggregation is decimal end-to-end; only the OUTPUT is cast
    decimal → DOUBLE. Round 1 pinned both engines to a common decimal
    scale and the driver hash still mismatched in r01 AND r02 — a
    value-hash that stringifies through pandas/Arrow can legally render
    the same decimal at different scales ('…​.55' vs '…​.5500') or as a
    float. A 2/4-dp decimal of money magnitude is ≤ 14 significant
    digits, far inside double's 53-bit exact-integer range, so the
    final cast is LOSSLESS and both engines emit the identical float64
    bit pattern — the only representation every collection path hashes
    identically.

    Plan: identical to any hash aggregate — map-side partial decimal
    sums, one shuffle of (flag, partial), Spark's Decimal128 codegen
    path throughout; the final cast is a free projection."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("decimal(38,2)").cast("double").alias("gross"),
            F.sum(price * F.lit(1).cast("decimal(5,2)") - disc)
            .cast("decimal(38,4)")
            .cast("double")
            .alias("adj"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_hll_distinct")  # engine-specific sketch → rows-only check
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native HLL++ distinct users per event_type (rsd=1%).

    The production 100 TB cardinality path: constant ~KB sketch per
    group, map-side mergeable, no shuffle of raw keys. HLL sketch bytes
    are engine-specific so there is no exact cross-engine oracle — the
    deterministic twin (same semantics, checkable estimate) is
    agg_approx_distinct's KMV; the error band vs exact count is
    asserted in tests/test_rag_ops.py::test_hll_distinct_error_bound
    (the SURVEY §5.2.6 independent pin for this rows-only op).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .orderBy("event_type")
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      FROM lineitem
      GROUP BY l_returnflag, l_quantity
    ), r AS (
      SELECT l_returnflag, l_quantity, cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity) AS rn
      FROM c
    )
    SELECT l_returnflag,
           l_quantity AS modal_qty,
           cnt        AS modal_cnt
    FROM r WHERE rn = 1
    ORDER BY l_returnflag
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (most frequent l_quantity per return
    flag) via the two-level count + argmax idiom — deterministic where
    the built-in `mode()` aggregate leaves ties unspecified (lowest
    value wins here, on both engines).

    Scale shape: shuffle 1 carries one row per (group, value) — the
    partial counts combine map-side — and the argmax window runs over
    the tiny distinct-value set per group, pruned by WindowGroupLimit
    before its exchange. Never a per-row window over raw data.
    Reference provenance: none (the reference computes no statistics);
    SURVEY §2 Part B aggregation family (round 3).
    """
    c = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("modal_qty"),
            F.col("cnt").alias("modal_cnt"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH v AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(l_quantity AS DOUBLE) AS w
      FROM lineitem
    ), cum AS (
      SELECT l_returnflag, price, w,
             SUM(w) OVER (PARTITION BY l_returnflag
                          ORDER BY price, w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM v
    )
    SELECT l_returnflag,
           ROUND(MIN(price), 2) AS weighted_median,
           ROUND(MAX(tw), 2)    AS total_weight
    FROM cum
    WHERE ROUND(cw, 9) >= ROUND(tw / 2, 9)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median price per return flag (weight = quantity): the
    smallest price whose cumulative weight reaches half the group total
    — the robust center the plain median misses when rows carry very
    different weights (a core training-mix statistic: "the median
    token-weighted document quality", not the median document).
    Registered face of `weighted_median` (api.py), on its binned path.

    Engine shape (bin_width=1000): the full data is reduced by ONE
    map-side-combinable agg to a per-(group, bin) weight sketch; the
    cumulative window runs over the SKETCH (~105 rows), never the
    data; a broadcast join then slices out only each group's crossing
    bin (~1/bins of the group) for the exact in-bin window. With 3
    groups holding all rows, the naive single-window form would sort
    600 k rows in 3 tasks — the low-cardinality window smell — while
    here the only per-group sort touches one bin's slice. Exact, not
    approximate: bin membership is a pure function of the value, and
    the deterministic (price, weight) in-bin order key makes the
    crossing row unique so both engines agree exactly (the oracle
    keeps the textbook full-window form as the independent twin).
    Reference provenance: none (the reference computes no statistics);
    SURVEY §2 Part B aggregation family (round 4).
    """
    v = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    return (
        weighted_median(v, ["l_returnflag"], "price", "w", bin_width=1000.0)
        .select(
            "l_returnflag",
            F.round("weighted_median", SUM_DP).alias("weighted_median"),
            F.round("total_weight", SUM_DP).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    bin_width: float | None = None,
) -> DataFrame:
    """Composable weighted median: per group, the smallest value whose
    cumulative weight reaches half the group's total weight. Returns
    one row per group: group cols + `weighted_median` + `total_weight`
    (both unrounded — callers choose presentation rounding).

    Crossing contract: the "reaches half" test compares cumulative
    weight to tw/2 on 9-dp-ROUNDED values. The two paths (and the two
    engines) accumulate weights in different orders, so an unrounded
    `cw >= tw/2` can flip at a knife-edge crossing for fractional
    weights (e.g. ten 0.1 weights: Σ=0.999… one way, 1.000…2 the
    other) — the rounded test makes both paths agree for any weights
    unambiguous at 9 decimals (integers, currency, per-mille rates).
    Exact on BOTH paths under that contract:

    * ``bin_width=None`` — one running-weight window per group. Correct
      everywhere, but each group's rows sort inside ONE task (the
      low-cardinality-partition window smell): fine for many groups /
      modest rows-per-group, the bottleneck when a handful of groups
      hold 100 TB.
    * ``bin_width=w`` — sketch-to-narrow, then exact inside the bin:
      (1) ONE map-side-combinable agg of weight per (group, value bin)
      — the same O(bins) sketch as agg_binned_quantile_sketch; (2) the
      cumulative window runs over the SKETCH (rows = bins, trivially
      small) to find each group's crossing bin, its preceding-bins
      offset, and the group total; (3) a broadcast join filters the
      raw rows to the crossing bin only (~rows/bins of each group) and
      a window over that small slice finds the exact crossing value.
      Bin membership is a pure function of the value — deterministic,
      no sampling, no checkpoint — so this is the selection-by-partial-
      sums plan: the full data is scanned and pre-aggregated, but only
      one bin's slice per group is ever sorted.
    """
    if bin_width is not None and bin_width <= 0:
        raise ValueError(
            f"bin_width must be positive, got {bin_width}: floor(value/0) "
            "NULLs every bin and the sketch silently degenerates"
        )

    def _crossed(cum_col: str, tw_col: str):
        # THE crossing predicate, one definition for all three paths
        # (plain, bin-level, in-bin): cumulative weight has reached half
        # the total, compared at 9dp on both sides so a knife-edge
        # fractional-weight crossing cannot split the paths again
        # (commit 0f1c1a6 fixed exactly that divergence once)
        return F.round(F.col(cum_col), 9) >= F.round(F.col(tw_col) / 2, 9)

    if bin_width is None:
        wp = Window.partitionBy(*group_cols)
        cum = df.select(
            *group_cols,
            F.col(value_col).alias("_v"),
            F.sum(weight_col)
            .over(
                wp.orderBy(value_col, weight_col).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("_cw"),
            F.sum(weight_col).over(wp).alias("_tw"),
        )
        return (
            cum.filter(_crossed("_cw", "_tw"))
            .groupBy(*group_cols)
            .agg(
                F.min("_v").alias("weighted_median"),
                F.max("_tw").alias("total_weight"),
            )
        )

    binned = F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint")
    sketch = df.groupBy(*group_cols, binned.alias("_bin")).agg(
        F.sum(weight_col).alias("_bw")
    )
    wp = Window.partitionBy(*group_cols)
    sk = sketch.select(
        *group_cols,
        "_bin",
        F.sum("_bw")
        .over(wp.orderBy("_bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("_cum"),
        F.col("_bw"),
        F.sum("_bw").over(wp).alias("_tw"),
    )
    crossing = (
        sk.filter(_crossed("_cum", "_tw"))
        .groupBy(*group_cols)
        .agg(F.min(F.struct("_bin", "_cum", "_bw", "_tw")).alias("_s"))
        .select(
            *group_cols,
            F.col("_s._bin").alias("_bin"),
            (F.col("_s._cum") - F.col("_s._bw")).alias("_before"),
            F.col("_s._tw").alias("_tw"),
        )
    )
    slice_ = (
        df.select(
            *group_cols, F.col(value_col).alias("_v"), F.col(weight_col).alias("_w")
        )
        .join(F.broadcast(crossing), group_cols)
        .filter(
            F.floor(F.col("_v") / F.lit(bin_width)).cast("bigint") == F.col("_bin")
        )
    )
    cum2 = slice_.select(
        *group_cols,
        "_v",
        "_tw",
        (
            F.col("_before")
            + F.sum("_w").over(
                wp.orderBy("_v", "_w").rowsBetween(Window.unboundedPreceding, 0)
            )
        ).alias("_cw"),
    )
    return (
        cum2.filter(_crossed("_cw", "_tw"))
        .groupBy(*group_cols)
        .agg(
            F.min("_v").alias("weighted_median"),
            F.max("_tw").alias("total_weight"),
        )
    )


@register(
    "agg_binned_quantile_sketch",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1
    ), w AS (
      SELECT bin, c,
             SUM(c) OVER (ORDER BY bin) AS cum,
             SUM(c) OVER () AS total
      FROM b
    ), q AS (
      SELECT CAST(x AS DOUBLE) AS q
      FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) t(x)
    ), hit AS (
      SELECT q.q, w.bin, w.c, w.cum, w.total,
             ROW_NUMBER() OVER (PARTITION BY q.q ORDER BY w.bin) AS rn
      FROM q JOIN w ON w.cum >= q.q * w.total
    )
    SELECT q, bin, CAST(total AS BIGINT) AS total,
           ROUND(bin * 1000 + 1000 * (q * total - (cum - c)) / c, 6)
             AS est_price
    FROM hit WHERE rn = 1
    ORDER BY q
    """,
)
def agg_binned_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from a fixed-width histogram sketch (bin =
    1000 currency units), the mergeable-sketch pattern behind every
    distributed percentile system: the sketch is ONE map-side-
    combinable count per bin, so the shuffle carries O(bins) rows —
    ~105 here, invariant in row count — and sketches from different
    partitions / days / clusters merge by adding counts. Estimates
    are linear interpolation inside the crossing bin (error ≤ bin
    width), against agg_percentile's exact-but-full-sort twin.

    Plan shape: hash agg collapses 100 TB to ~105 rows BEFORE the
    single-partition cumulative window (safe by construction — the
    windowed frame is the sketch, not the data) and the 5 quantile
    probes ride one broadcast join; the crossing bin per probe is a
    min(struct) argmin, no second window. Both engines compute the
    identical integer-count arithmetic, so parity is exact at 6 dp.
    Reference provenance: none (the reference computes no statistics);
    SURVEY §2 Part B aggregation family (round 4).
    """
    b = (
        table(spark, sf_dir, "lineitem")
        .groupBy(
            F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    sk = b.select(
        "bin",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("total"),
    )
    q = spark.sql(
        "SELECT CAST(x AS DOUBLE) AS q FROM VALUES (0.25), (0.5), (0.75), (0.9), (0.99) t(x)"
    )
    hit = (
        sk.crossJoin(F.broadcast(q))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy("q")
        .agg(F.min(F.struct("bin", "c", "cum", "total")).alias("s"))
        .select("q", "s.bin", "s.c", "s.cum", "s.total")
    )
    return hit.select(
        "q",
        "bin",
        F.col("total").cast("bigint").alias("total"),
        F.round(
            F.col("bin") * 1000
            + 1000
            * (F.col("q") * F.col("total") - (F.col("cum") - F.col("c")))
            / F.col("c"),
            6,
        ).alias("est_price"),
    ).orderBy("q")


@register(
    "agg_corr_matrix",
    oracle="""
    WITH c AS (
      SELECT CORR(l_quantity, l_extendedprice) AS qp,
             CORR(l_quantity, l_discount)      AS qd,
             CORR(l_quantity, l_tax)           AS qt,
             CORR(l_extendedprice, l_discount) AS pd,
             CORR(l_extendedprice, l_tax)      AS pt,
             CORR(l_discount, l_tax)           AS dt
      FROM lineitem
    )
    SELECT col_a, col_b, corr FROM (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, ROUND(qp, 6) AS corr FROM c
      UNION ALL SELECT 'l_quantity', 'l_discount', ROUND(qd, 6) FROM c
      UNION ALL SELECT 'l_quantity', 'l_tax', ROUND(qt, 6) FROM c
      UNION ALL SELECT 'l_extendedprice', 'l_discount', ROUND(pd, 6) FROM c
      UNION ALL SELECT 'l_extendedprice', 'l_tax', ROUND(pt, 6) FROM c
      UNION ALL SELECT 'l_discount', 'l_tax', ROUND(dt, 6) FROM c
    )
    ORDER BY col_a, col_b
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the four lineitem measures in
    ONE pass — the feature-redundancy screen run before any model or
    sampling-weight design (highly-correlated features double-count in
    quality scores; the matrix says what to drop).

    All six correlations are computed by a single aggregation over one
    scan: Spark's corr() is a streaming one-pass sufficient-statistics
    aggregate (count/means/co-moments) that combines map-side, so the
    shuffle is ONE row of 6 doubles regardless of input size — the
    same mergeable-statistics shape as agg_stats. The 6-row tidy
    (col_a, col_b, corr) layout comes from unpivoting that single row
    driver-side-free (stack over the aggregated frame, not a loop of
    six jobs — the naive form pays 6 scans). Co-moment merge order
    differs between engines; ~1e-12 relative noise sits far below the
    6 dp rounding.
    Reference provenance: none (the reference computes no statistics);
    SURVEY §2 Part B aggregation family (round 4).
    """
    li = table(spark, sf_dir, "lineitem")
    one = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("qp"),
        F.corr("l_quantity", "l_discount").alias("qd"),
        F.corr("l_quantity", "l_tax").alias("qt"),
        F.corr("l_extendedprice", "l_discount").alias("pd"),
        F.corr("l_extendedprice", "l_tax").alias("pt"),
        F.corr("l_discount", "l_tax").alias("dt"),
    )
    return (
        one.select(
            F.expr(
                "stack(6, "
                "'l_quantity', 'l_extendedprice', qp, "
                "'l_quantity', 'l_discount', qd, "
                "'l_quantity', 'l_tax', qt, "
                "'l_extendedprice', 'l_discount', pd, "
                "'l_extendedprice', 'l_tax', pt, "
                "'l_discount', 'l_tax', dt) AS (col_a, col_b, raw)"
            )
        )
        .select("col_a", "col_b", F.round("raw", AVG_DP).alias("corr"))
        .orderBy("col_a", "col_b")
    )


@register(
    "agg_kmv_set_ops",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM events WHERE user_id IS NOT NULL
    ), t AS (
      SELECT DISTINCT event_type FROM h
    ), p AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM t a JOIN t b ON a.event_type < b.event_type
    ), m AS (
      SELECT p.ta, p.tb, h.hv,
             MAX(CASE WHEN h.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN h.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
      FROM p JOIN h ON h.event_type IN (p.ta, p.tb)
      GROUP BY p.ta, p.tb, h.hv
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
      FROM m
    ), kept AS (
      SELECT ta, tb, MAX(hv) AS kth, COUNT(*) AS cnt,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
      FROM r WHERE rn <= {_KMV_K} GROUP BY ta, tb
    )
    SELECT ta AS etype_a, tb AS etype_b,
           CASE WHEN cnt < {_KMV_K} THEN CAST(cnt AS DOUBLE)
                ELSE ROUND(({_KMV_K - 1} * 4294967296.0) / kth, 2)
           END AS union_est,
           CASE WHEN cnt < {_KMV_K} THEN CAST(n_both AS DOUBLE)
                ELSE ROUND((n_both / CAST({_KMV_K} AS DOUBLE))
                           * (({_KMV_K - 1} * 4294967296.0) / kth), 2)
           END AS inter_est,
           ROUND(n_both / CAST(LEAST(cnt, {_KMV_K}) AS DOUBLE), 6)
             AS jaccard_est
    FROM kept ORDER BY etype_a, etype_b
    """,
)
def agg_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET OPERATIONS — union size, intersection size, and
    Jaccard estimates for every event-type audience pair (the
    "audience overlap" question a naive COUNT(DISTINCT) join answers
    at O(|A|+|B|) memory; the sketch answers at O(k)): merge the two
    groups' hash sets, keep the k smallest of the UNION, estimate
    |A∪B| = (k-1)/h_(k), and read the intersection off the same kept
    sample — |A∩B| ≈ (both-flagged fraction of the k kept) × |A∪B|,
    Jaccard ≈ n_both/k. Theta-sketch algebra, but over md5 like
    agg_approx_distinct, so every estimate is BIT-REPRODUCIBLE in any
    engine and the oracle checks exact values, not error bands. Pairs
    whose union has fewer than k distinct hashes fall back to exact
    counts (the same branch both engines CASE on).

    Scale shape: one distinct on (type, hash) (map-side combinable),
    a broadcast of the tiny type-pair relation (|types|² rows), a
    per-pair hash dedup carrying two OR-flags, then the same literal
    rank≤k window as kmv_estimate — WindowGroupLimit prunes to k rows
    per (pair, map task) BEFORE the exchange, so per-pair memory is
    bounded at any cardinality. Replication factor is |types|-1 (each
    group joins its pairs), bounded by the key space, never rows².
    Reference provenance: none; SURVEY §2 B.11 sketches family
    (round 9); public recipe = Apache DataSketches theta set ops.
    """
    ev = table(spark, sf_dir, "events")
    h = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long").alias("hv"),
        )
        .distinct()
    )
    t = h.select("event_type").distinct()
    pairs = (
        t.alias("a")
        .join(t.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
    )
    m = (
        h.join(
            F.broadcast(pairs),
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .groupBy("ta", "tb", "hv")
        .agg(
            F.max((F.col("event_type") == F.col("ta")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("tb")).cast("int")).alias("in_b"),
        )
    )
    w = Window.partitionBy("ta", "tb").orderBy("hv")
    kept = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(_KMV_K))
        .groupBy("ta", "tb")
        .agg(
            F.max("hv").alias("kth"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_both"),
        )
    )
    raw_union = F.lit(float((_KMV_K - 1) * 4294967296)) / F.col("kth")
    small = F.col("cnt") < F.lit(_KMV_K)
    return kept.select(
        F.col("ta").alias("etype_a"),
        F.col("tb").alias("etype_b"),
        F.when(small, F.col("cnt").cast("double"))
        .otherwise(F.round(raw_union, 2))
        .alias("union_est"),
        F.when(small, F.col("n_both").cast("double"))
        .otherwise(
            F.round(
                (F.col("n_both") / F.lit(float(_KMV_K))) * raw_union, 2
            )
        )
        .alias("inter_est"),
        F.round(
            F.col("n_both") / F.least(F.col("cnt"), F.lit(_KMV_K)).cast("double"),
            6,
        ).alias("jaccard_est"),
    ).orderBy("etype_a", "etype_b")


# SPRT decision boundaries for alpha = beta = 0.05: ln((1-b)/a) and
# ln(b/(1-a)) — written as literals so both engines use the identical
# double (DuckDB's ln() and the JVM's may differ in the last ulp, and
# the boundary COMPARISON is the decision)
_SPRT_UPPER = 2.9444389791664403
_SPRT_LOWER = -2.9444389791664403


@register(
    "agg_sprt_sequential",
    oracle=f"""
    -- normal-mean SPRT replay: H0 mean = global mean (rounded to 2 dp
    -- BEFORE use — kills accumulation-order ulps in every term), H1 =
    -- 1.1x, sigma = global stddev rounded the same way; LLR is the
    -- running sum over (ts, event_id) order, rounded to 6 dp BEFORE
    -- the boundary compare (round-before-compare discipline).
    WITH s AS (
      SELECT ROUND(AVG(value), 2) AS mu0, ROUND(STDDEV_SAMP(value), 2) AS sig
      FROM events
    ), walk AS (
      SELECT e.event_type, e.ts, e.event_id,
             ROUND(SUM((POWER(e.value - s.mu0, 2)
                        - POWER(e.value - 1.1 * s.mu0, 2))
                       / (2 * s.sig * s.sig))
                   OVER (PARTITION BY e.event_type
                         ORDER BY e.ts, e.event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   6) AS llr,
             ROW_NUMBER() OVER (PARTITION BY e.event_type
                                ORDER BY e.ts, e.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY e.event_type) AS n
      FROM events e CROSS JOIN s
    ), crossing AS (
      SELECT event_type, MIN(rn) AS n_at_decision
      FROM walk
      WHERE llr >= {_SPRT_UPPER} OR llr <= {_SPRT_LOWER}
      GROUP BY event_type
    ), final AS (
      SELECT w.event_type, w.n AS n_events, w.llr AS llr_final,
             c.n_at_decision,
             (SELECT llr FROM walk x
              WHERE x.event_type = w.event_type
                AND x.rn = c.n_at_decision) AS llr_at
      FROM walk w LEFT JOIN crossing c USING (event_type)
      WHERE w.rn = w.n
    )
    SELECT event_type,
           CAST(n_events AS BIGINT)                        AS n_events,
           ROUND(llr_final, 4)                             AS llr_final,
           CASE WHEN n_at_decision IS NULL THEN 'continue'
                WHEN llr_at >= {_SPRT_UPPER} THEN 'accept_h1'
                ELSE 'accept_h0' END                       AS decision,
           CAST(n_at_decision AS BIGINT)                   AS n_at_decision
    FROM final ORDER BY event_type
    """,
)
def agg_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability ratio test (Wald's SPRT) per event type —
    the A/B early-stopping walk an experimentation platform runs so a
    clearly-winning (or clearly-flat) arm stops BEFORE the fixed-horizon
    sample is spent: each event moves the cumulative log-likelihood
    ratio between H0 (type mean = global mean) and H1 (mean 10%
    higher, normal model with pooled sigma); the first crossing of the
    +/-ln(19) boundaries (alpha = beta = 0.05) is the decision, and its
    position IS the sample saved. Output per type: final LLR, the
    decision (accept_h1 / accept_h0 / continue), and how many events
    the decision took.

    Cross-engine determinism: the pooled scalars round to 2 dp BEFORE
    use (double aggregates accumulate in engine-specific order — the
    rounding makes every downstream term a pure function of identical
    inputs); the running LLR rounds to 6 dp BEFORE the boundary
    compare, and the boundaries are literal doubles (LN(19) differs in
    the last ulp between libm and the JVM). The 6-dp contract is also
    what licenses the decomposition below: every engine/plan pairing
    accumulates the prefix in a different float order, and all of them
    agree once rounded.

    Scale shape — selection by partial sums (the agg_weighted_median
    plan applied to a PREFIX walk; event_type has ~5 values, so a
    window partitioned by type alone would sort one type's ENTIRE
    100 TB history inside a single task): (1) every row's LLR term is
    bucketed by (type, hour-of-ts) and walked only WITHIN its bucket —
    the per-row window partitions on the 2-key (type, bucket), so the
    sort is bounded by bucket size, never by type size; each bucket
    reduces to (partial sum, count, running-max, running-min);
    (2) a tiny ordered window over the O(buckets) summaries per type
    computes each bucket's preceding-prefix and flags candidates —
    since max_k(round(P + w_k, 6)) = round(P + max_k(w_k), 6) (double
    addition and 6-dp rounding are both monotone and operate on the
    same operands), a bucket contains a boundary crossing IFF its
    shifted running-max/min crosses, so the FIRST candidate bucket
    provably holds the first crossing row; (3) only that one bucket's
    rows per type are re-read (broadcast semi-join on the candidate
    list) and walked exactly for the decision row. Totals (n_events,
    final LLR) come from plain map-side-combinable aggregates of the
    bucket summaries — no global sort, no unbounded window anywhere.
    Reference provenance: none; SURVEY §2 B.11 aggregates family
    (round 9; decomposed round 10 per VERDICT r9 item 3); public
    recipe = Wald SPRT, normal-mean form.
    """
    ev = table(spark, sf_dir, "events")
    s = ev.agg(
        F.round(F.avg("value"), 2).alias("mu0"),
        F.round(F.stddev_samp("value"), 2).alias("sig"),
    )
    rows = (
        ev.crossJoin(F.broadcast(s))
        .select(
            "event_type",
            "ts",
            "event_id",
            (
                (
                    F.pow(F.col("value") - F.col("mu0"), F.lit(2))
                    - F.pow(F.col("value") - 1.1 * F.col("mu0"), F.lit(2))
                )
                / (2 * F.col("sig") * F.col("sig"))
            ).alias("term"),
            F.date_trunc("hour", F.col("ts")).alias("bkt"),
        )
    )
    # (1) within-bucket walk: partitions are (type, hour) — bounded
    wb = Window.partitionBy("event_type", "bkt").orderBy("ts", "event_id")
    pref = rows.withColumn(
        "wp",
        F.sum("term").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bstats = pref.groupBy("event_type", "bkt").agg(
        F.sum("term").alias("psum"),
        F.count(F.lit(1)).alias("cnt"),
        F.max("wp").alias("maxrun"),
        F.min("wp").alias("minrun"),
    )
    # (2) ordered window over O(buckets) summaries per type
    wt = Window.partitionBy("event_type").orderBy("bkt")
    before = wt.rowsBetween(Window.unboundedPreceding, -1)
    cands = (
        bstats.withColumn(
            "prefix_before", F.coalesce(F.sum("psum").over(before), F.lit(0.0))
        )
        .withColumn(
            "rn_before",
            F.coalesce(F.sum("cnt").over(before), F.lit(0).cast("bigint")),
        )
        .filter(
            (
                F.round(F.col("prefix_before") + F.col("maxrun"), 6)
                >= F.lit(_SPRT_UPPER)
            )
            | (
                F.round(F.col("prefix_before") + F.col("minrun"), 6)
                <= F.lit(_SPRT_LOWER)
            )
        )
    )
    first_bkt = cands.groupBy("event_type").agg(
        F.min_by(
            F.struct("bkt", "prefix_before", "rn_before"), F.col("bkt")
        ).alias("fb")
    ).select(
        # disambiguated names: rows and first_bkt share lineage, so the
        # join below must not reference same-named columns on both sides
        F.col("event_type").alias("c_type"),
        F.col("fb.bkt").alias("c_bkt"),
        F.col("fb.prefix_before").alias("prefix_before"),
        F.col("fb.rn_before").alias("rn_before"),
    )
    # (3) exact walk inside ONLY the first candidate bucket per type
    wc = Window.partitionBy("event_type").orderBy("ts", "event_id")
    walk = (
        rows.join(
            F.broadcast(first_bkt),
            (F.col("event_type") == F.col("c_type"))
            & (F.col("bkt") == F.col("c_bkt")),
        )
        .select(
            "event_type",
            "ts",
            "event_id",
            "term",
            "prefix_before",
            "rn_before",
        )
        .withColumn(
            "llr",
            F.round(
                F.col("prefix_before")
                + F.sum("term").over(
                    wc.rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
                6,
            ),
        )
        .withColumn("rn", F.col("rn_before") + F.row_number().over(wc))
    )
    first_cross = walk.filter(
        (F.col("llr") >= F.lit(_SPRT_UPPER))
        | (F.col("llr") <= F.lit(_SPRT_LOWER))
    ).groupBy("event_type").agg(
        F.min_by(F.struct("rn", "llr"), F.col("rn")).alias("first_cross")
    )
    totals = bstats.groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.round(F.sum("psum"), 6).alias("llr_final"),
    )
    return (
        totals.join(first_cross, "event_type", "left")
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round("llr_final", 4).alias("llr_final"),
            F.when(F.col("first_cross").isNull(), F.lit("continue"))
            .when(
                F.col("first_cross.llr") >= F.lit(_SPRT_UPPER),
                F.lit("accept_h1"),
            )
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
            F.col("first_cross.rn").cast("bigint").alias("n_at_decision"),
        )
        .orderBy("event_type")
    )


# O'Brien-Fleming shape constant for K=5 looks at two-sided alpha=0.05
# (the tabulated C_B(5, 0.05) from the group-sequential literature,
# e.g. Jennison & Turnbull table 2.3) — a literal so both engines
# compare against the identical double.
_OBF_C = 2.04


@register(
    "agg_group_sequential",
    oracle=f"""
    -- group-sequential replay (O'Brien-Fleming, K=5 equally-spaced
    -- calendar looks): per (type, day) partial sums roll up to per-look
    -- cumulative (n, mean); Z_k = (mean_k - mu0) / (sig / sqrt(n_k)),
    -- boundary u_k = C * sqrt(K/k); both sides ROUND 6dp before the
    -- compare. Scalars round 2dp before use (accumulation-order ulps).
    WITH s AS (
      SELECT ROUND(AVG(value), 2) AS mu0, ROUND(STDDEV_SAMP(value), 2) AS sig
      FROM events
    ), m AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0,
             DATEDIFF('day', MIN(CAST(ts AS DATE)),
                      MAX(CAST(ts AS DATE))) + 1 AS span
      FROM events
    ), looks AS (
      SELECT e.event_type,
             CAST(FLOOR(DATEDIFF('day', m.d0, CAST(e.ts AS DATE))
                        * 5.0 / m.span) AS BIGINT) + 1 AS look,
             SUM(e.value) AS psum, COUNT(*) AS cnt
      FROM events e CROSS JOIN m GROUP BY 1, 2
    ), cum AS (
      SELECT l.event_type, l.look,
             SUM(psum) OVER w AS csum,
             SUM(cnt)  OVER w AS n_k
      FROM looks l
      WINDOW w AS (PARTITION BY event_type ORDER BY look
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), z AS (
      SELECT c.event_type, c.look, c.n_k,
             ROUND((c.csum / c.n_k - s.mu0) / (s.sig / SQRT(c.n_k)), 6) AS zk,
             ROUND({_OBF_C} * SQRT(5.0 / c.look), 6) AS bound
      FROM cum c CROSS JOIN s
    ), hit AS (
      SELECT event_type, MIN(look) AS look_at_decision
      FROM z WHERE ABS(zk) >= bound GROUP BY event_type
    ), last AS (
      SELECT event_type, n_k AS n_events, zk AS z_final
      FROM z WHERE look = 5
    )
    SELECT l.event_type,
           CAST(l.n_events AS BIGINT)       AS n_events,
           l.z_final                        AS z_final,
           CASE WHEN h.look_at_decision IS NULL THEN 'continue'
                ELSE 'stop' END             AS decision,
           CAST(h.look_at_decision AS BIGINT) AS look_at_decision,
           CAST((SELECT n_k FROM z x
                 WHERE x.event_type = l.event_type
                   AND x.look = h.look_at_decision) AS BIGINT)
                                            AS n_at_decision
    FROM last l LEFT JOIN hit h USING (event_type)
    ORDER BY l.event_type
    """,
)
def agg_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential test per event type (O'Brien-Fleming boundary,
    K=5 equally-spaced calendar looks) — the interim-analysis design an
    experimentation platform runs when decisions happen at scheduled
    reviews rather than per event (Wald SPRT's continuous-monitoring
    sibling, `agg_sprt_sequential`): at look k the cumulative
    z-statistic against the pooled H0 mean compares to the OBF shape
    boundary C·sqrt(K/k) — very conservative early (nearly impossible
    to stop at look 1), relaxing toward the fixed-horizon critical
    value at the final look, which is what preserves the overall alpha
    across 5 peeks. Output per type: total events, final z, stop /
    continue, the stopping look and the sample it took.

    Cross-engine determinism: pooled scalars ROUND 2dp before use;
    z_k and the boundary both ROUND 6dp before the compare; the OBF
    constant is a literal; sqrt is IEEE-correctly-rounded on both
    engines (unlike pow/ln, which differ in the last ulp).

    Scale shape — the SPRT partial-sums skeleton with the walk gone
    entirely: group-sequential only EVER evaluates at look boundaries,
    so per-(type, day) partial sums (ONE map-side-combinable agg,
    key-space bounded) roll up through a window over the O(days)
    summary rows — no per-row window anywhere, no join over events,
    nothing grows with row count past the first aggregate.
    Reference provenance: none; SURVEY §2 B.11 aggregates family
    (round 10); public recipe = O'Brien-Fleming 1979 / Jennison &
    Turnbull group-sequential boundaries.
    """
    ev = table(spark, sf_dir, "events")
    s = ev.agg(
        F.round(F.avg("value"), 2).alias("mu0"),
        F.round(F.stddev_samp("value"), 2).alias("sig"),
    )
    # look boundaries derive from the OBSERVED date span (K equal
    # slices of [min_date, max_date]), not raw dayofmonth — a day-31
    # event or multi-month data would alias calendar days across looks
    # while the fixture's exact Jan-1..30 span hid it (ADVICE r10).
    # On a 30-day span this reproduces ceil(day/6) exactly.
    m = ev.agg(
        F.min(F.to_date("ts")).alias("d0"),
        (
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1
        ).alias("span"),
    )
    looks = (
        ev.crossJoin(F.broadcast(m))
        .groupBy(
            "event_type",
            (
                F.floor(
                    F.datediff(F.to_date("ts"), F.col("d0"))
                    * 5.0
                    / F.col("span")
                )
                + 1
            )
            .cast("bigint")
            .alias("look"),
        )
        .agg(F.sum("value").alias("psum"), F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("look")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    z = (
        looks.select(
            "event_type",
            "look",
            F.sum("psum").over(w).alias("csum"),
            F.sum("cnt").over(w).alias("n_k"),
        )
        .crossJoin(F.broadcast(s))
        .select(
            "event_type",
            "look",
            "n_k",
            F.round(
                (F.col("csum") / F.col("n_k") - F.col("mu0"))
                / (F.col("sig") / F.sqrt(F.col("n_k"))),
                6,
            ).alias("zk"),
            F.round(F.lit(_OBF_C) * F.sqrt(F.lit(5.0) / F.col("look")), 6)
            .alias("bound"),
        )
    )
    hit = (
        z.filter(F.abs(F.col("zk")) >= F.col("bound"))
        .groupBy("event_type")
        .agg(
            F.min_by(F.struct("look", "n_k"), F.col("look")).alias("h")
        )
        .select(
            F.col("event_type").alias("h_type"),
            F.col("h.look").alias("look_at_decision"),
            F.col("h.n_k").alias("n_at_decision"),
        )
    )
    last = z.filter(F.col("look") == 5).select(
        "event_type",
        F.col("n_k").alias("n_events"),
        F.col("zk").alias("z_final"),
    )
    return (
        last.join(
            F.broadcast(hit),
            last["event_type"] == hit["h_type"],
            "left",
        )
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            "z_final",
            F.when(F.col("look_at_decision").isNull(), F.lit("continue"))
            .otherwise(F.lit("stop"))
            .alias("decision"),
            F.col("look_at_decision").cast("bigint").alias(
                "look_at_decision"
            ),
            F.col("n_at_decision").cast("bigint").alias("n_at_decision"),
        )
        .orderBy("event_type")
    )


# Abramowitz-Stegun 26.2.17 normal-CDF coefficients (literals so both
# engines evaluate the identical polynomial) and the posterior decision
# thresholds for the Bayesian A/B readout.
_AS_B = (0.319381530, -0.356563782, 1.781477937,
         -1.821255978, 1.330274429)
_AS_K = 0.2316419
_SQRT_2PI = 2.5066282746310002
_BAYES_SHIP = 0.95


@register(
    "agg_bayes_ab_posterior",
    oracle=f"""
    -- Bayesian A/B readout per event type (normal approximation, flat
    -- prior): P(mean_A > mean_B) = Phi(z) with z the Welch statistic;
    -- Phi via the Abramowitz-Stegun 26.2.17 polynomial — pure
    -- +,*,EXP over the SAME 4dp-rounded z on both engines. Moments
    -- round 6dp before z (CUPED precedent); prob rounds 6dp; the
    -- ship/stop/continue decision compares the ROUNDED prob.
    WITH m AS (
      SELECT event_type,
             COUNT(value) FILTER (user_id % 2 = 0)            AS n_a,
             COUNT(value) FILTER (user_id % 2 = 1)            AS n_b,
             ROUND(AVG(value) FILTER (user_id % 2 = 0), 6)    AS mean_a,
             ROUND(AVG(value) FILTER (user_id % 2 = 1), 6)    AS mean_b,
             ROUND(VAR_SAMP(value) FILTER (user_id % 2 = 0), 6) AS var_a,
             ROUND(VAR_SAMP(value) FILTER (user_id % 2 = 1), 6) AS var_b
      FROM events GROUP BY event_type
    ), z AS (
      SELECT event_type, n_a, n_b,
             ROUND(mean_a - mean_b, 6) AS mean_diff,
             ROUND((mean_a - mean_b) / SQRT(var_a / n_a + var_b / n_b),
                   4) AS z
      FROM m
    ), phi AS (
      SELECT event_type, n_a, n_b, mean_diff, z,
             1.0 / (1.0 + {_AS_K} * ABS(z)) AS t
      FROM z
    ), p AS (
      SELECT event_type, n_a, n_b, mean_diff, z,
             1.0 - EXP(-z * z / 2) / {_SQRT_2PI}
                   * (({_AS_B[0]}) * t + ({_AS_B[1]}) * t * t
                      + ({_AS_B[2]}) * t * t * t
                      + ({_AS_B[3]}) * t * t * t * t
                      + ({_AS_B[4]}) * t * t * t * t * t) AS phi_abs
      FROM phi
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           mean_diff,
           z,
           ROUND(CASE WHEN z >= 0 THEN phi_abs ELSE 1.0 - phi_abs END,
                 6) AS prob_a_wins,
           CASE
             WHEN ROUND(CASE WHEN z >= 0 THEN phi_abs
                             ELSE 1.0 - phi_abs END, 6) >= {_BAYES_SHIP}
               THEN 'ship_a'
             WHEN ROUND(CASE WHEN z >= 0 THEN phi_abs
                             ELSE 1.0 - phi_abs END, 6)
                  <= {round(1 - _BAYES_SHIP, 6)}
               THEN 'ship_b'
             ELSE 'continue'
           END AS decision
    FROM p ORDER BY event_type
    """,
)
def agg_bayes_ab_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B readout per event type — the posterior probability
    of superiority P(mean_A > mean_B) a product team actually reads
    off an experimentation dashboard (arms = user_id parity): under
    the normal approximation with a flat prior the posterior of the
    mean difference is N(d, s²) with d the mean difference and s the
    Welch standard error, so P(A wins) = Φ(d/s). Completes the
    experimentation suite's fifth lens: frequentist t (agg_ttest_ab),
    continuous SPRT, scheduled-look OBF, anytime-valid mSPRT, and now
    the posterior-decision readout with ship_a / ship_b / continue at
    the 95% threshold.

    Cross-engine determinism: Φ is the Abramowitz-Stegun 26.2.17
    polynomial — literal coefficients, pure +,*,exp over a z that is
    ROUNDED 4dp first (itself from 6dp-rounded moments), so both
    engines evaluate the identical expression on identical doubles;
    the final prob rounds 6dp before the threshold compare (the mSPRT
    ln contract: a last-ulp exp drift is absorbed except at a
    measure-zero knife edge).

    Scale shape: one map-side-combinable conditional aggregate per
    type (count/mean/variance sufficient statistics), then scalar
    arithmetic on the O(types) summary — no window, no join, nothing
    downstream grows with row count.
    Reference provenance: none; SURVEY §2 B.11 statistics family
    (round 10); public recipe = normal-approximation posterior
    probability of superiority (Stucchio, 'Bayesian A/B Testing at
    VWO', 2015) + A&S 26.2.17 Φ.
    """
    ev = table(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    m = ev.groupBy("event_type").agg(
        F.count(F.when(a, F.col("value"))).alias("n_a"),
        F.count(F.when(~a, F.col("value"))).alias("n_b"),
        F.round(F.avg(F.when(a, F.col("value"))), 6).alias("mean_a"),
        F.round(F.avg(F.when(~a, F.col("value"))), 6).alias("mean_b"),
        F.round(F.var_samp(F.when(a, F.col("value"))), 6).alias("var_a"),
        F.round(F.var_samp(F.when(~a, F.col("value"))), 6).alias("var_b"),
    )
    z = F.round(
        (F.col("mean_a") - F.col("mean_b"))
        / F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")),
        4,
    )
    zc = m.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.col("mean_a") - F.col("mean_b"), 6).alias("mean_diff"),
        z.alias("z"),
    ).withColumn("t", F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_K) * F.abs("z")))
    poly = (
        F.lit(_AS_B[0]) * F.col("t")
        + F.lit(_AS_B[1]) * F.col("t") * F.col("t")
        + F.lit(_AS_B[2]) * F.col("t") * F.col("t") * F.col("t")
        + F.lit(_AS_B[3]) * F.col("t") * F.col("t") * F.col("t") * F.col("t")
        + F.lit(_AS_B[4])
        * F.col("t") * F.col("t") * F.col("t") * F.col("t") * F.col("t")
    )
    phi_abs = (
        F.lit(1.0)
        - F.exp(-F.col("z") * F.col("z") / 2) / F.lit(_SQRT_2PI) * poly
    )
    prob = F.round(
        F.when(F.col("z") >= 0, phi_abs).otherwise(F.lit(1.0) - phi_abs), 6
    )
    return (
        zc.select(
            "event_type",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            "mean_diff",
            "z",
            prob.alias("prob_a_wins"),
            F.when(prob >= F.lit(_BAYES_SHIP), F.lit("ship_a"))
            .when(prob <= F.lit(round(1 - _BAYES_SHIP, 6)), F.lit("ship_b"))
            .otherwise(F.lit("continue"))
            .alias("decision"),
        )
        .orderBy("event_type")
    )


# mSPRT parameters: normal mixture variance tau^2 = 1 and the
# always-valid rejection threshold log(1/alpha) at alpha = 0.05 —
# literals so both engines compare against identical doubles.
_MSPRT_TAU2 = 1.0
_MSPRT_LOG_THRESH = 2.995732273553991  # ln(20)


@register(
    "agg_msprt_always_valid",
    oracle=f"""
    -- mixture-SPRT replay (normal mixture, tau^2 = {_MSPRT_TAU2}),
    -- evaluated at daily boundaries from per-(type, day) partial sums:
    -- log L_n = 0.5*ln(V/(V+n*t2)) + n^2*t2*(mean-mu0)^2/(2*V*(V+n*t2)),
    -- stop when ROUND(log L, 6) >= ln(1/alpha). Scalars round 2dp
    -- before use; the always-valid p is exp-free: min(1, e^-logL)
    -- reported as ROUND(-logL, 6) in log space.
    WITH s AS (
      SELECT ROUND(AVG(value), 2) AS mu0, ROUND(STDDEV_SAMP(value), 2) AS sig
      FROM events
    ), m AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
    ), days AS (
      SELECT e.event_type,
             DATEDIFF('day', m.d0, CAST(e.ts AS DATE)) + 1 AS d,
             SUM(e.value) AS psum, COUNT(*) AS cnt
      FROM events e CROSS JOIN m GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, d,
             SUM(psum) OVER w AS csum, SUM(cnt) OVER w AS n
      FROM days
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), ll AS (
      SELECT c.event_type, c.d, c.n,
             ROUND(
               0.5 * LN(s.sig * s.sig
                        / (s.sig * s.sig + c.n * {_MSPRT_TAU2}))
               + (c.n * c.n * {_MSPRT_TAU2}
                  * POWER(c.csum / c.n - s.mu0, 2))
                 / (2 * s.sig * s.sig
                    * (s.sig * s.sig + c.n * {_MSPRT_TAU2})),
               6) AS logl
      FROM cum c CROSS JOIN s
    ), hit AS (
      SELECT event_type, MIN(d) AS day_at_decision
      FROM ll WHERE logl >= {_MSPRT_LOG_THRESH} GROUP BY event_type
    ), fin AS (
      SELECT l.event_type, l.n AS n_events, l.logl AS logl_final
      FROM ll l
      JOIN (SELECT event_type, MAX(d) AS d FROM ll GROUP BY event_type) m
        USING (event_type, d)
    )
    SELECT f.event_type,
           CAST(f.n_events AS BIGINT)        AS n_events,
           f.logl_final                      AS logl_final,
           CASE WHEN h.day_at_decision IS NULL THEN 'continue'
                ELSE 'stop' END              AS decision,
           CAST(h.day_at_decision AS BIGINT) AS day_at_decision,
           CAST((SELECT n FROM ll x
                 WHERE x.event_type = f.event_type
                   AND x.d = h.day_at_decision) AS BIGINT)
                                             AS n_at_decision
    FROM fin f LEFT JOIN hit h USING (event_type)
    ORDER BY f.event_type
    """,
)
def agg_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture SPRT (mSPRT) per event type — the ALWAYS-VALID
    sequential test behind 'peeking-safe' A/B dashboards (Johari,
    Koomen, Pekelis, Walsh 2017): the likelihood-ratio martingale
    against H0 (type mean = pooled mean) under a normal mixture prior
    (tau² = 1) may be inspected at ANY stopping rule without alpha
    inflation; here it is evaluated at daily boundaries, stopping the
    first day ROUND(log Λ, 6) ≥ ln(1/alpha). Completes the sequential
    family: Wald SPRT (simple-vs-simple, continuous walk),
    O'Brien-Fleming (scheduled looks), mSPRT (anytime-valid).

    Cross-engine determinism: pooled scalars ROUND 2dp before use, so
    every ln/power argument is the identical double on both engines;
    log Λ rounds 6dp BEFORE the literal-threshold compare (ln may
    differ in the last ulp between libm and the JVM — a 6dp round
    absorbs it except at a measure-zero knife edge, the same contract
    agg_mutual_information ships with).

    Scale shape: the group-sequential skeleton — ONE map-side-
    combinable per-(type, day) aggregate, a window over the O(days)
    summary rows, broadcast scalars; no per-row window, no join over
    events, nothing downstream grows with row count.
    Reference provenance: none; SURVEY §2 B.11 aggregates family
    (round 10); public recipe = Johari et al., 'Peeking at A/B
    Tests' (KDD 2017), normal-mixture closed form.
    """
    ev = table(spark, sf_dir, "events")
    s = ev.agg(
        F.round(F.avg("value"), 2).alias("mu0"),
        F.round(F.stddev_samp("value"), 2).alias("sig"),
    )
    # daily boundaries as a sequential experiment-day index (days since
    # the observed min date, 1-based) — raw dayofmonth aliases across
    # months; on the single-month fixture this is identical (ADVICE r10)
    m = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    days = (
        ev.crossJoin(F.broadcast(m))
        .groupBy(
            "event_type",
            (F.datediff(F.to_date("ts"), F.col("d0")) + 1)
            .cast("bigint")
            .alias("d"),
        )
        .agg(F.sum("value").alias("psum"), F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col("sig") * F.col("sig")
    denom = v + F.col("n") * F.lit(_MSPRT_TAU2)
    ll = (
        days.select(
            "event_type",
            "d",
            F.sum("psum").over(w).alias("csum"),
            F.sum("cnt").over(w).alias("n"),
        )
        .crossJoin(F.broadcast(s))
        .select(
            "event_type",
            "d",
            "n",
            F.round(
                F.lit(0.5) * F.log(v / denom)
                + (
                    F.col("n")
                    * F.col("n")
                    * F.lit(_MSPRT_TAU2)
                    * F.pow(
                        F.col("csum") / F.col("n") - F.col("mu0"), F.lit(2)
                    )
                )
                / (F.lit(2) * v * denom),
                6,
            ).alias("logl"),
        )
    )
    hit = (
        ll.filter(F.col("logl") >= F.lit(_MSPRT_LOG_THRESH))
        .groupBy("event_type")
        .agg(F.min_by(F.struct("d", "n"), F.col("d")).alias("h"))
        .select(
            F.col("event_type").alias("h_type"),
            F.col("h.d").alias("day_at_decision"),
            F.col("h.n").alias("n_at_decision"),
        )
    )
    fin = (
        ll.groupBy("event_type")
        .agg(F.max_by(F.struct("n", "logl"), F.col("d")).alias("f"))
        .select(
            "event_type",
            F.col("f.n").alias("n_events"),
            F.col("f.logl").alias("logl_final"),
        )
    )
    return (
        fin.join(F.broadcast(hit), fin["event_type"] == hit["h_type"], "left")
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            "logl_final",
            F.when(F.col("day_at_decision").isNull(), F.lit("continue"))
            .otherwise(F.lit("stop"))
            .alias("decision"),
            F.col("day_at_decision").cast("bigint").alias("day_at_decision"),
            F.col("n_at_decision").cast("bigint").alias("n_at_decision"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_cuped_adjustment",
    oracle="""
    -- CUPED replay: per (type, user) the pre-period covariate x and
    -- post-period metric y (fixed literal split date), then per type
    -- theta = cov(x,y)/var(x) and the variance reduction 100*corr^2 —
    -- derived in closed form from the (rounded-before-use) moment
    -- aggregates, never by re-aggregating adjusted rows.
    WITH u AS (
      SELECT event_type, user_id,
             AVG(value) FILTER (WHERE ts <  TIMESTAMP '2024-01-16') AS x,
             AVG(value) FILTER (WHERE ts >= TIMESTAMP '2024-01-16') AS y
      FROM events GROUP BY event_type, user_id
    ), m AS (
      SELECT event_type,
             COUNT(*)                        AS n_users,
             ROUND(COVAR_SAMP(x, y), 6)      AS cxy,
             ROUND(VAR_SAMP(x), 6)           AS vx,
             ROUND(VAR_SAMP(y), 6)           AS vy
      FROM u WHERE x IS NOT NULL AND y IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_users AS BIGINT)                          AS n_users,
           ROUND(cxy / vx, 4)                               AS theta,
           ROUND(vy, 2)                                     AS var_raw,
           ROUND(vy - cxy * cxy / vx, 2)                    AS var_adj,
           ROUND(100 * cxy * cxy / (vx * vy), 4)            AS reduction_pct
    FROM m ORDER BY event_type
    """,
)
def agg_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction per event type (Deng et al. 2013 — the
    standard pre-experiment-covariate adjustment every experimentation
    platform applies before a t-test): per (type, user), the
    pre-period mean value is the covariate x and the post-period mean
    the metric y (fixed calendar split); theta = cov(x,y)/var(x) is
    the adjustment coefficient, and the variance of the adjusted
    metric falls by exactly 100·corr(x,y)² percent — reported per type
    so the platform knows which metrics CUPED actually helps (a
    near-zero reduction means the covariate is uninformative and the
    adjustment just adds plumbing). Pairs with agg_ttest_ab /
    agg_sprt_sequential: the reduction directly shrinks their
    required sample.

    Determinism: the three moment aggregates round to 6 dp BEFORE the
    theta / reduction arithmetic (double accumulation order is
    engine-specific); the adjusted variance comes from the closed form
    vy − cov²/varx — re-aggregating per-row adjusted values would
    accumulate a second engine-specific float pass for zero
    information.

    Scale shape: one scan → per-(type, user) conditional means
    (map-side combinable hash agg, output bounded by the key space) →
    per-type moment agg over that bounded set. No window, no join.
    Reference provenance: none; SURVEY §2 B.11 aggregates family
    (round 9); public recipe = CUPED (Deng, Xu, Kohavi, Walker 2013).
    """
    ev = table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    u = ev.groupBy("event_type", "user_id").agg(
        F.avg(F.when(F.col("ts") < split, F.col("value"))).alias("x"),
        F.avg(F.when(F.col("ts") >= split, F.col("value"))).alias("y"),
    )
    m = (
        u.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.covar_samp("x", "y"), 6).alias("cxy"),
            F.round(F.var_samp("x"), 6).alias("vx"),
            F.round(F.var_samp("y"), 6).alias("vy"),
        )
    )
    return m.select(
        "event_type",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(F.col("cxy") / F.col("vx"), 4).alias("theta"),
        F.round(F.col("vy"), 2).alias("var_raw"),
        F.round(
            F.col("vy") - F.col("cxy") * F.col("cxy") / F.col("vx"), 2
        ).alias("var_adj"),
        F.round(
            100 * F.col("cxy") * F.col("cxy") / (F.col("vx") * F.col("vy")),
            4,
        ).alias("reduction_pct"),
    ).orderBy("event_type")


@register(
    "agg_diff_in_diff",
    oracle="""
    -- 2x2 DiD replay: treated = {purchase, signup}, period split at a
    -- literal calendar date; the four cell moments round to 6 dp
    -- BEFORE the estimate/SE arithmetic (engine-specific double
    -- accumulation), the normal SE comes from the four-cell variance
    -- sum, and the decision compares the ROUNDED |did| to 1.96*se.
    WITH cells AS (
      SELECT (event_type IN ('purchase', 'signup'))        AS treated,
             (ts >= TIMESTAMP '2024-01-16')                AS post,
             COUNT(*)                                      AS n,
             ROUND(AVG(value), 6)                          AS m,
             ROUND(VAR_SAMP(value), 6)                     AS v
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT
        MAX(CASE WHEN treated AND NOT post THEN n END)     AS n_pre_t,
        MAX(CASE WHEN treated AND post     THEN n END)     AS n_post_t,
        MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_pre_c,
        MAX(CASE WHEN NOT treated AND post THEN n END)     AS n_post_c,
        MAX(CASE WHEN treated AND NOT post THEN m END)     AS pre_t,
        MAX(CASE WHEN treated AND post     THEN m END)     AS post_t,
        MAX(CASE WHEN NOT treated AND NOT post THEN m END) AS pre_c,
        MAX(CASE WHEN NOT treated AND post THEN m END)     AS post_c,
        MAX(CASE WHEN treated AND NOT post THEN v / n END)
          + MAX(CASE WHEN treated AND post THEN v / n END)
          + MAX(CASE WHEN NOT treated AND NOT post THEN v / n END)
          + MAX(CASE WHEN NOT treated AND post THEN v / n END) AS var_sum
      FROM cells
    )
    SELECT CAST(n_pre_t AS BIGINT)  AS n_pre_t,
           CAST(n_post_t AS BIGINT) AS n_post_t,
           CAST(n_pre_c AS BIGINT)  AS n_pre_c,
           CAST(n_post_c AS BIGINT) AS n_post_c,
           ROUND(pre_t, 4)  AS pre_t,
           ROUND(post_t, 4) AS post_t,
           ROUND(pre_c, 4)  AS pre_c,
           ROUND(post_c, 4) AS post_c,
           ROUND((post_t - pre_t) - (post_c - pre_c), 4) AS did,
           ROUND(SQRT(var_sum), 4)                       AS se,
           ABS(ROUND((post_t - pre_t) - (post_c - pre_c), 4))
             > 1.96 * ROUND(SQRT(var_sum), 4)            AS significant
    FROM w
    """,
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator (the quasi-experimental
    workhorse when randomization is impossible — a feature shipped to
    one cohort on a date): treated event types vs control, pre vs post
    a literal calendar cut; the estimate is the classic 2x2
    (post_T − pre_T) − (post_C − pre_C), its normal SE the four-cell
    variance sum, and `significant` the 95% z-decision. Completes the
    causal/experimentation suite (agg_ttest_ab randomized two-sample,
    agg_sprt_sequential sequential stopping, agg_cuped_adjustment
    variance reduction, this for observational rollouts).

    Determinism: the four cell moments round to 6 dp BEFORE the
    estimate/SE arithmetic; the significance compare uses the ROUNDED
    did and se on both engines (round-before-compare).

    Scale shape: ONE scan → a 4-group conditional aggregate (map-side
    combinable, output is 4 rows) pivoted to one row with conditional
    MAXes — no join, no window, no second pass.
    Reference provenance: none; SURVEY §2 B.11 aggregates family
    (round 9); public recipe = Card-Krueger 2x2 DiD with normal SE.
    """
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").isin("purchase", "signup").alias("treated"),
        (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")).alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("m"),
        F.round(F.var_samp("value"), 6).alias("v"),
    )

    def cell(t, p, col):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    w = cells.agg(
        cell(True, False, "n").alias("n_pre_t"),
        cell(True, True, "n").alias("n_post_t"),
        cell(False, False, "n").alias("n_pre_c"),
        cell(False, True, "n").alias("n_post_c"),
        cell(True, False, "m").alias("pre_t"),
        cell(True, True, "m").alias("post_t"),
        cell(False, False, "m").alias("pre_c"),
        cell(False, True, "m").alias("post_c"),
        (
            F.max(F.when((F.col("treated")) & (~F.col("post")), F.col("v") / F.col("n")))
            + F.max(F.when((F.col("treated")) & (F.col("post")), F.col("v") / F.col("n")))
            + F.max(F.when((~F.col("treated")) & (~F.col("post")), F.col("v") / F.col("n")))
            + F.max(F.when((~F.col("treated")) & (F.col("post")), F.col("v") / F.col("n")))
        ).alias("var_sum"),
    )
    did = F.round(
        (F.col("post_t") - F.col("pre_t")) - (F.col("post_c") - F.col("pre_c")), 4
    )
    se = F.round(F.sqrt(F.col("var_sum")), 4)
    return w.select(
        F.col("n_pre_t").cast("bigint").alias("n_pre_t"),
        F.col("n_post_t").cast("bigint").alias("n_post_t"),
        F.col("n_pre_c").cast("bigint").alias("n_pre_c"),
        F.col("n_post_c").cast("bigint").alias("n_post_c"),
        F.round("pre_t", 4).alias("pre_t"),
        F.round("post_t", 4).alias("post_t"),
        F.round("pre_c", 4).alias("pre_c"),
        F.round("post_c", 4).alias("post_c"),
        did.alias("did"),
        se.alias("se"),
        (F.abs(did) > 1.96 * se).alias("significant"),
    )
