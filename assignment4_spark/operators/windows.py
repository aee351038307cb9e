"""Window-function operators (SURVEY.md §2 B.5).

Window functions generalize the reference's two ranking behaviors:
first-occurrence dedup (ra/server.py:39-43 → row_number=1) and Pinecone
top-k score ordering (ra/agent.py:115-119 → rank ≤ k).

Scale notes: a window = one shuffle on partitionBy + one sort per
partition. The per-group windows here partition on high-cardinality
keys (custkey/user_id/brand) so partitions stay small. Two ops use a
global (empty) partitionBy — which serializes the sort on one task —
by declared design: win_moving_avg_range bounds its input with a
filter first, and win_ntile_cume IS the global-distribution query
(quartile/percent_rank over the whole table); its docstring carries
the two-phase plan a 100 TB run needs. Spark 4's
InferWindowGroupLimit pushes rank<=k filters below the sort (top-k per
group never materializes full partitions).
Determinism: every orderBy carries a full tie-breaking key (FIXTURES §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io_util import table
from ..registry import register


@register(
    "win_rank_dense_rownum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
)
def win_rank_dense_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn AS price_rank
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    )
    WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per brand — the per-query top-k shape of the reference's
    retrieval (A18, k=100 at ra/agent.py:117). The rn<=3 filter is pushed
    below the sort by InferWindowGroupLimit (partial top-k per map task)."""
    p = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
        .orderBy("p_brand", "price_rank")
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           value - LAG(value)  OVER w AS delta_prev,
           LEAD(value, 1, 0.0) OVER w - value AS delta_next
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event value deltas (lag/lead with a default)."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
            (F.lead("value", 1, 0.0).over(w) - F.col("value")).alias("delta_next"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_revenue
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer — the reference's append-accumulation
    state (A22) as a window frame. Running sums over a fixed ROWS frame
    are order-deterministic, but rounded anyway: Spark and DuckDB agree
    on the prefix order so the partials are identical."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "win_moving_avg_range",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           ROUND(AVG(o_totalprice) OVER (ORDER BY o_orderdate
                                         RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                                               AND CURRENT ROW), 6) AS mavg_7d
    FROM orders
    WHERE o_custkey < 50
    ORDER BY o_orderkey
    """,
)
def win_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average over a RANGE frame. Spark's rangeBetween
    needs a numeric ordering key → order by epoch seconds with a
    -6-days-in-seconds lower bound; same value window as DuckDB's
    INTERVAL frame. Global (unpartitioned) window kept deliberately small
    via the filter; at scale, partition by a coarse time bucket first."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        W.orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderdate",
            F.round(F.avg("o_totalprice").over(w), 6).alias("mavg_7d"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "win_ntile_cume",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distribution ranks (quartile / percent_rank / cume_dist)
    over the whole customer table. The empty partitionBy is the POINT of
    the query — there is no per-group form of "which quartile of all
    customers" — and it serializes the sort on one task, so this exact
    plan is only right up to one task's worth of rows. The 100 TB
    restatement is two-phase: approxQuantile (or the binned sketch of
    agg_binned_quantile_sketch) computes the 3 quartile boundaries in
    one map-side-combinable pass, then a broadcast range join assigns
    each row its quartile/percentile without any global sort. Kept in
    the single-window form here because the oracle checks EXACT
    percent_rank/cume_dist values, which the sketch path only bounds."""
    c = table(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_acctbal",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_regr_slope",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, ts, value,
             (epoch(ts) - 1704067200) / 3600.0 AS x
      FROM events
    ), w AS (
      SELECT user_id, event_id, ts,
             COUNT(*) OVER win          AS n,
             SUM(x) OVER win            AS sx,
             SUM(value) OVER win        AS sy,
             SUM(x * value) OVER win    AS sxy,
             SUM(x * x) OVER win        AS sxx
      FROM t
      WINDOW win AS (PARTITION BY user_id ORDER BY x
                     RANGE BETWEEN 24.0 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts,
           ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6)
             AS slope_24h
    FROM w
    ORDER BY user_id, ts, event_id
    """,
)
def win_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h least-squares slope of value-vs-time per user — the
    online trend detector (regr_slope over a moving RANGE frame),
    computed from the five streaming-friendly sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) so one window pass yields the slope with no
    per-row refit.

    Numerical hygiene that decides cross-engine parity: x is hours
    since 2024-01-01 (epoch seconds would put Σx² near 1e19 where
    doubles carry ~1e3 absolute error and the n·Σx²−(Σx)² cancellation
    destroys the slope); with hour units the cancellation keeps ~10
    significant digits and both engines agree to the 1e-6 ROUND. The
    n=1 denominator is exactly 0.0 in IEEE on both engines (fl(x·x) −
    fl(x·x)), so NULLIF yields NULL, not a noise slope. RANGE frames
    make timestamp ties peers — tie order cannot change the sums.
    At scale: one shuffle on user_id, one sort per partition; the
    range frame is evaluated incrementally, never re-scanned.
    Reference provenance: none; SURVEY §2 Part B window family.
    """
    x = (F.col("ts").cast("double") - F.lit(1704067200)) / F.lit(3600.0)
    t = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", x.alias("x")
    )
    win = (
        W.partitionBy("user_id").orderBy("x").rangeBetween(-24, 0)
    )
    w = t.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("value").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("value")).over(win).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return w.select(
        "user_id",
        "event_id",
        "ts",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("slope_24h"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "win_streaks_islands",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             LAG(value) OVER w AS prev_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN prev_value IS NULL OR value <= prev_value
                  THEN 1 ELSE 0 END AS brk
      FROM o
    ), islands AS (
      SELECT user_id, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM flagged
    ), runs AS (
      SELECT user_id, island_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           MAX(run_len)                    AS longest_streak,
           CAST(COUNT(*) AS BIGINT)        AS n_runs
    FROM runs
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def win_streaks_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest strictly-increasing run of event values
    per user — the classic streak/run-length idiom (lag to flag breaks,
    running sum of flags to number islands, then two rollups).
    ts_sessionize is its time-gap cousin; this is the value-ordered
    form.

    Spark shape: the lag window and the running-sum window share the
    SAME (user_id; ts, event_id) partitioning and ordering, so both
    stack on one exchange + one sort (same single-shuffle property the
    sessionize plan gate pins). The island aggregation then shuffles
    one row per run, and the final per-user rollup one row per user.
    Full tie-break (ts, event_id) makes island numbering identical on
    both engines even under timestamp collisions.
    Reference provenance: none; SURVEY §2 Part B window family
    (round 3).
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    wlag = W.partitionBy("user_id").orderBy(*order)
    wsum = wlag.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.lag("value").over(wlag).isNull()
            | (F.col("value") <= F.lag("value").over(wlag)),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    islands = flagged.select(
        "user_id", F.sum("brk").over(wsum).alias("island_id")
    )
    runs = islands.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("run_len").alias("longest_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        )
        .orderBy("user_id")
    )


@register(
    "win_pattern_match",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), marked AS (
      SELECT user_id, ts, event_type, rn,
             MAX(CASE WHEN event_type <> 'click' THEN rn END)
               OVER w2 AS anchor_rn,
             LAST_VALUE(CASE WHEN event_type <> 'click' THEN event_type END
                        IGNORE NULLS) OVER w2 AS anchor_type,
             LAST_VALUE(CASE WHEN event_type <> 'click' THEN ts END
                        IGNORE NULLS) OVER w2 AS anchor_ts
      FROM o
      WINDOW w2 AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           anchor_ts                        AS signup_ts,
           ts                               AS purchase_ts,
           CAST(rn - anchor_rn - 1 AS BIGINT) AS n_clicks
    FROM marked
    WHERE event_type = 'purchase'
      AND anchor_type = 'signup'
      AND rn - anchor_rn >= 2
    ORDER BY user_id, purchase_ts, signup_ts
    """,
)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: detect every maximal consecutive
    ``signup (click)+ purchase`` run in each user's event stream —
    the row-pattern query SQL:2016 spells MATCH_RECOGNIZE (and Flink
    CEP spells PATTERN A B+ C), which neither Spark nor DuckDB ships.

    The single-pass reformulation: for each row, the last
    NON-click row before it (in stream order) is the only candidate
    pattern anchor — every row between that anchor and the current row
    is a click by construction. So a purchase row completes a match
    iff its anchor is a signup at distance >= 2 (at least one click
    between). One conditional running MAX picks the anchor position,
    two conditional last(ignorenulls) carry its type and timestamp —
    no self-join, no explode, no per-row Python.

    Spark shape: the row_number window and the three anchor windows
    share the SAME (user_id) partitioning with compatible orderings
    (ts,event_id then rn), so the whole detection stacks on ONE
    exchange (plan-gated in tests/test_plans.py). State per row is
    O(1); partitions are per-user streams, never the global table.
    Matches cannot span users, so a 100 TB run parallelizes freely.
    Reference provenance: none; SURVEY §2 Part B window family
    (round 8) — the sequence-detection face ts_funnel_stages
    (first-conversion aggregate) does not cover: EVERY occurrence,
    adjacency-constrained, with per-match click counts.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wrn = W.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    o = ev.withColumn("rn", F.row_number().over(wrn))
    w2 = (
        W.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    non_click = F.col("event_type") != F.lit("click")
    marked = o.select(
        "user_id",
        "ts",
        "event_type",
        "rn",
        F.max(F.when(non_click, F.col("rn"))).over(w2).alias("anchor_rn"),
        F.last(F.when(non_click, F.col("event_type")), ignorenulls=True)
        .over(w2)
        .alias("anchor_type"),
        F.last(F.when(non_click, F.col("ts")), ignorenulls=True)
        .over(w2)
        .alias("anchor_ts"),
    )
    return (
        marked.filter(
            (F.col("event_type") == "purchase")
            & (F.col("anchor_type") == "signup")
            & (F.col("rn") - F.col("anchor_rn") >= 2)
        )
        .select(
            "user_id",
            F.col("anchor_ts").alias("signup_ts"),
            F.col("ts").alias("purchase_ts"),
            (F.col("rn") - F.col("anchor_rn") - 1)
            .cast("bigint")
            .alias("n_clicks"),
        )
        .orderBy("user_id", "purchase_ts", "signup_ts")
    )
