"""Join operators (SURVEY.md §2 B.3).

The reference performs no relational joins — its only "matching" is the
remote Pinecone top-k scan (ra/agent.py:115-119), which is a cross join
+ rank at heart. This module declares the full join surface the engine
supports, each with its scale strategy stated.

Scale notes:
  * small dims (region/nation/part at dim-scale) → `F.broadcast`: no
    shuffle of the fact side, the hash map ships to every executor;
  * fact-fact equi-joins → shuffle on the key, AQE picks SMJ vs
    shuffled-hash and splits skewed partitions at runtime;
  * theta/as-of joins → never a blind cross join: an equi key prunes
    first (user_id), the range predicate filters within the group, or a
    window emulation avoids the join entirely (as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io_util import table
from ..registry import register


@register(
    "join_inner_shuffle",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)                      AS n_orders,
           ROUND(SUM(o_totalprice), 2)   AS revenue,
           COUNT(DISTINCT o_custkey)     AS n_customers
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: both sides shuffle on the key; AQE coalesces
    post-shuffle partitions and handles skew."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT p_brand,
           COUNT(*)                                              AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)     AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dim side: lineitem never shuffles — the
    join is map-side. This is THE pattern for fact⨝dim at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("p_brand")
    )


@register(
    "join_left_right_full",
    oracle="""
    WITH c AS (SELECT * FROM customer WHERE c_custkey < 100),
         o AS (SELECT * FROM orders  WHERE o_custkey >= 50 AND o_custkey < 150)
    SELECT 'left' AS join_kind, COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS n_unmatched_right,
           COUNT(*) FILTER (WHERE c_custkey IS NULL)  AS n_unmatched_left
    FROM c LEFT JOIN o ON o_custkey = c_custkey
    UNION ALL
    SELECT 'right', COUNT(*),
           COUNT(*) FILTER (WHERE o_orderkey IS NULL),
           COUNT(*) FILTER (WHERE c_custkey IS NULL)
    FROM c RIGHT JOIN o ON o_custkey = c_custkey
    UNION ALL
    SELECT 'full', COUNT(*),
           COUNT(*) FILTER (WHERE o_orderkey IS NULL),
           COUNT(*) FILTER (WHERE c_custkey IS NULL)
    FROM c FULL JOIN o ON o_custkey = c_custkey
    ORDER BY join_kind
    """,
)
def join_left_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join family over deliberately part-overlapping key ranges so
    each side has unmatched rows; results tagged and unioned."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") >= 50) & (F.col("o_custkey") < 150)
    )

    def counted(kind: str) -> DataFrame:
        j = c.join(o, c.c_custkey == o.o_custkey, kind)
        return j.agg(
            F.lit(kind).alias("join_kind"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_unmatched_right"),
            F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_unmatched_left"),
        ).select("join_kind", "n", "n_unmatched_right", "n_unmatched_left")

    return (
        counted("left").unionByName(counted("right")).unionByName(counted("full"))
        .orderBy("join_kind")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers WITH a big order — left-semi never duplicates the left
    side and only ships the join key of the right side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT-priority order (NOT EXISTS → left-anti).
    The priority filter keeps the check NON-VACUOUS at the driver's
    sf0.01 gate: the unfiltered "customers without orders" form matches
    zero fixture rows below sf0.1, so any anti-join bug (wrong key,
    semi-for-anti) would have compared empty-to-empty and passed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_cross_limited",
    oracle="""
    SELECT r_name, n_name,
           (r_regionkey * 100 + n_nationkey) AS pair_score
    FROM region CROSS JOIN nation
    ORDER BY pair_score
    """,
)
def join_cross_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (5×25) — the shape underlying the reference's
    query×corpus similarity scan (A18). Only ever sane when one side is
    broadcast-small; the engine broadcasts region."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        F.broadcast(r)
        .crossJoin(n)
        .select(
            "r_name",
            "n_name",
            (F.col("r_regionkey") * 100 + F.col("n_nationkey")).alias("pair_score"),
        )
        .orderBy("pair_score")
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT e.user_id,
           e.event_id AS left_id,
           f.event_id AS right_id,
           e.event_type AS left_type,
           f.event_type AS right_type
    FROM events e
    JOIN events f
      ON e.user_id = f.user_id
     AND f.ts > e.ts
     AND f.ts <= e.ts + INTERVAL 1 HOUR
    ORDER BY left_id, right_id
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via time-bucketing (the standard scale rewrite): the
    equi key is (user_id, 1-hour epoch bucket) — the right side lives in
    exactly one bucket, the left probes its own bucket and the next, the
    range predicate is the residual filter. Join-group size is bounded
    by events-per-user-per-hour instead of events-per-user, so the plan
    is a plain hash join at any corpus size, never a per-user quadratic
    blow-up. Every qualifying pair appears exactly once (bucket(f) ∈
    {bucket(e), bucket(e)+1} always holds when 0 < f.ts−e.ts ≤ 1 h), so
    no dedup pass is needed."""
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(F.col("ts").cast("double") / 3600).cast("long")
    f = ev.select(
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"),
        F.col("event_id").alias("f_id"),
        F.col("event_type").alias("f_type"),
        bucket.alias("f_bucket"),
    )
    e = ev.select(
        "user_id",
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
        F.col("event_type").alias("e_type"),
        F.explode(F.array(bucket, bucket + 1)).alias("e_bucket"),
    )
    return (
        e.join(
            f,
            (F.col("user_id") == F.col("f_user"))
            & (F.col("e_bucket") == F.col("f_bucket"))
            & (F.col("f_ts") > F.col("e_ts"))
            & (F.col("f_ts") <= F.col("e_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            F.col("e_id").alias("left_id"),
            F.col("f_id").alias("right_id"),
            F.col("e_type").alias("left_type"),
            F.col("f_type").alias("right_type"),
        )
        .orderBy("left_id", "right_id")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             (event_type = 'purchase') AS is_right
      FROM events
      WHERE event_type IN ('click', 'purchase')
    ), enriched AS (
      SELECT *,
             LAST_VALUE(CASE WHEN is_right THEN struct_pack(t := ts, v := value) END
                        IGNORE NULLS) OVER w AS asof_s
      FROM tagged
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, is_right DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts,
           asof_s['v'] AS asof_value, asof_s['t'] AS asof_ts
    FROM enriched
    WHERE NOT is_right
    ORDER BY event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (click ← latest purchase at-or-before, per user) via the
    union+window idiom: tag both sides, single sort per user, last
    non-null carry-forward. No native as-of in Spark SQL — this emulation
    is one shuffle + one sort, vs a naive range join's quadratic blow-up,
    and it's exactly how trades/quotes as-of scales on a cluster."""
    ev = table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        (F.col("event_type") == "purchase").alias("is_right"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_right").desc(), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # carry (ts, value) as ONE struct: two independent ignorenulls
    # carries would skip a NULL-VALUE purchase on the value side but
    # not the ts side, pairing one purchase's timestamp with another's
    # value — an attribute combination belonging to no event. A struct
    # with a NULL field is not NULL, so the purchase row carries whole.
    asof = F.last(
        F.when(F.col("is_right"), F.struct(F.col("ts"), F.col("value"))),
        ignorenulls=True,
    ).over(w)
    enriched = tagged.select(
        "*",
        asof["value"].alias("asof_value"),
        asof["ts"].alias("asof_ts"),
    )
    return (
        enriched.filter(~F.col("is_right"))
        .select("event_id", "user_id", "ts", "asof_value", "asof_ts")
        .orderBy("event_id")
    )


@register(
    "join_self_pairs",
    oracle="""
    SELECT n1.n_regionkey AS region_key,
           n1.n_name      AS nation_a,
           n2.n_name      AS nation_b
    FROM nation n1
    JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    ORDER BY region_key, nation_a, nation_b
    """,
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join producing unordered pairs within a group (key< key
    dedups mirror pairs) — the pairing idiom near-dup detection (B.8)
    builds on."""
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_regionkey").alias("region_key"),
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
        )
        .orderBy("region_key", "nation_a", "nation_b")
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH activity AS (
      SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) AS a_start, MAX(ts) AS a_end
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), incidents AS (
      SELECT ts AS i_start, ts + INTERVAL 30 MINUTE AS i_end
      FROM events WHERE event_type = 'error'
    )
    SELECT a.user_id, a.day,
           CAST(COUNT(*) AS BIGINT) AS n_incidents,
           ROUND(SUM(epoch(LEAST(a.a_end, i.i_end))
                     - epoch(GREATEST(a.a_start, i.i_start))), 3) AS overlap_s
    FROM activity a JOIN incidents i
      ON a.a_start <= i.i_end AND i.i_start <= a.a_end
    GROUP BY a.user_id, a.day
    ORDER BY a.user_id, a.day
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (the second classic range-join shape next
    to join_theta_range's band join): per-user daily activity intervals
    [min ts, max ts] x global 30-minute incident windows around error
    events; returns per (user, day) the overlapping-incident count and
    total overlap seconds.

    Scale rewrite: both interval sets are bucketed to the calendar-day
    grid — activity intervals live in exactly one day bucket by
    construction, incident windows explode to the 1-2 days they touch
    (sequence over to_date bounds, distinct by construction since
    sequence steps by whole days) — so the join is a plain equi-join on
    day with the overlap predicate as residual filter. Join-group size
    is bounded by incidents-per-day, never incidents-total, and no
    dedup pass is needed because the non-exploded side occupies a
    single bucket. This is the same grid decomposition GeoSpark/Sedona
    uses for spatial joins, specialized to 1-D time.
    Reference provenance: none (no joins in the reference); declared in
    SURVEY §2 Part B with join_theta_range as the range-join family.
    """
    ev = table(spark, sf_dir, "events")
    activity = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("a_start"), F.max("ts").alias("a_end")
    )
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("ts").alias("i_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("i_end"),
        )
        .select(
            "i_start",
            "i_end",
            F.explode(
                F.sequence(F.to_date("i_start"), F.to_date("i_end"))
            ).alias("day"),
        )
    )
    return (
        activity.join(incidents, ["day"])
        .filter(
            (F.col("a_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("a_end"))
        )
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_incidents"),
            F.round(
                F.sum(
                    F.least("a_end", "i_end").cast("double")
                    - F.greatest("a_start", "i_start").cast("double")
                ),
                3,
            ).alias("overlap_s"),
        )
        .orderBy("user_id", "day")
    )




def _grid_neighborhood(x_col, y_col, cell: float):
    """Exploded 3x3 grid-cell neighborhood column of a point — THE
    replication side of the grid-join coverage proof ("any pair within
    one cell-size meets in the neighborhood"), shared by
    join_spatial_epsilon and join_nearest_spatial so the proof lives in
    one place. Yields struct(gx, gy) rows; the probe side keys on its
    own single cell."""
    cx = F.floor(x_col / cell)
    cy = F.floor(y_col / cell)
    return F.explode(
        F.array(
            *[
                F.struct((cx + dx).alias("gx"), (cy + dy).alias("gy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )


@register(
    "join_spatial_epsilon",
    oracle="""
    WITH pts AS (
      SELECT event_id AS pid,
             value AS x,
             CAST(event_id % 1000 AS DOUBLE) / 10.0 AS y
      FROM events
      WHERE event_type = 'click' AND event_id < 2000
    )
    SELECT a.pid AS pid_a, b.pid AS pid_b,
           ROUND(SQRT((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 6) AS dist
    FROM pts a JOIN pts b ON a.pid < b.pid
    WHERE SQRT((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) <= 5.0
    ORDER BY pid_a, pid_b
    """,
)
def join_spatial_epsilon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-distance spatial self-join (all point pairs within ε = 5.0) via
    uniform grid decomposition — the 2-D generalization of
    join_interval_overlap's day-bucket trick and the core of every
    distributed spatial engine (Sedona/GeoSpark partitioning): bucket
    points into ε-sized grid cells, replicate ONE side to its 3×3
    neighbor cells, equi-join on the cell key, then apply the exact
    distance as a residual filter. Any pair within ε is guaranteed to
    meet in at least one cell (cell size = ε ⇒ neighbors can only be in
    adjacent cells), and each unordered pair meets exactly once under
    the (pid_a < pid_b) + replicate-left convention. Join-group size is
    bounded by points-per-cell — density, not dataset size — so the
    plan survives any scale-up at constant ε; the naive form (the
    oracle) is the O(N²) theta join. Points are synthesized
    deterministically from events (x = value, y = event_id‰/10).
    """
    eps = 5.0
    pts = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "click") & (F.col("event_id") < 2000))
        .select(
            F.col("event_id").alias("pid"),
            F.col("value").alias("x"),
            ((F.col("event_id") % 1000).cast("double") / 10.0).alias("y"),
        )
    )
    cx = F.floor(F.col("x") / eps)
    cy = F.floor(F.col("y") / eps)
    # left side replicated to its 3x3 cell neighborhood
    a = pts.select(
        F.col("pid").alias("pid_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        _grid_neighborhood(F.col("x"), F.col("y"), eps).alias("cell"),
    ).select("pid_a", "xa", "ya", F.col("cell.gx").alias("gx"), F.col("cell.gy").alias("gy"))
    b = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cx.alias("gx"),
        cy.alias("gy"),
    )
    dist = F.sqrt(
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return (
        a.join(b, ["gx", "gy"])
        .filter((F.col("pid_a") < F.col("pid_b")) & (dist <= eps))
        .select("pid_a", "pid_b", F.round(dist, 6).alias("dist"))
        .orderBy("pid_a", "pid_b")
    )


@register(
    "join_nearest_spatial",
    oracle="""
    WITH q AS (
      SELECT event_id AS qid,
             event_id % 211       AS xq,
             (event_id * 7) % 199 AS yq
      FROM events WHERE event_type = 'view' AND event_id < 1000
    ), c AS (
      SELECT event_id AS cid,
             event_id % 211       AS xc,
             (event_id * 7) % 199 AS yc
      FROM events WHERE event_type = 'click' AND event_id < 4000
    ), p AS (
      SELECT qid, cid,
             (xq - xc) * (xq - xc) + (yq - yc) * (yq - yc) AS dist2,
             ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY (xq - xc) * (xq - xc) + (yq - yc) * (yq - yc), cid
             ) AS rn
      FROM q, c
    )
    SELECT qid, cid AS nn_id, dist2 AS nn_dist2
    FROM p WHERE rn = 1
    ORDER BY qid
    """,
)
def join_nearest_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor spatial join (each query point → its single
    closest candidate point) — the argmin sibling of
    join_spatial_epsilon's all-pairs-within-ε, and the 2-D version of
    join_asof_nearest: "nearest store to each customer". EXACT, via
    the classic two-phase grid plan:

    Phase 1 — grid candidates: points bucket into g-sized cells, each
    query replicates to its 3×3 neighborhood, equi-join on the cell
    key, per-query argmin by ``min(struct(dist2, cid))`` (lexicographic
    struct min = smallest distance, smallest id on ties — total order,
    deterministic on both engines). A phase-1 winner is PROVABLY the
    true nearest iff its dist ≤ g: anything closer would lie within g
    of the query and therefore inside the 3×3 neighborhood.
    Phase 2 — residual: queries with no 3×3 candidate, or whose best
    is beyond g (sparse regions), fall back to a broadcast brute-force
    against the candidate set — exact by construction.

    All arithmetic is INTEGER (coordinates synthesized from event ids;
    dist2 = squared distance as bigint, never a sqrt) so cross-engine
    parity is exact, no float rounding rule needed. Scale shape: the
    phase-1 join is bounded by points-per-cell (density, not corpus
    size); the residual is the sparse tail — at 100 TB you size g so
    phase 2 is near-empty (or iterate expanding rings), and the
    broadcast side is the QUERY residual, never the candidate corpus.
    The oracle is the O(N·M) brute force.
    Reference provenance: none (no geometry in the reference);
    north-star spatial surface, public recipe = Sedona grid
    partitioning / two-phase exact kNN join.
    """
    g = 16
    ev = table(spark, sf_dir, "events")
    q = ev.filter((F.col("event_type") == "view") & (F.col("event_id") < 1000)).select(
        F.col("event_id").alias("qid"),
        (F.col("event_id") % 211).alias("xq"),
        ((F.col("event_id") * 7) % 199).alias("yq"),
    )
    c = ev.filter((F.col("event_type") == "click") & (F.col("event_id") < 4000)).select(
        F.col("event_id").alias("cid"),
        (F.col("event_id") % 211).alias("xc"),
        ((F.col("event_id") * 7) % 199).alias("yc"),
    )
    dist2 = (F.col("xq") - F.col("xc")) * (F.col("xq") - F.col("xc")) + (
        F.col("yq") - F.col("yc")
    ) * (F.col("yq") - F.col("yc"))
    pick = F.min(F.struct(dist2.alias("d2"), F.col("cid"))).alias("best")

    qa = q.select(
        "qid",
        "xq",
        "yq",
        _grid_neighborhood(F.col("xq"), F.col("yq"), g).alias("cell"),
    ).select("qid", "xq", "yq", F.col("cell.gx").alias("gx"), F.col("cell.gy").alias("gy"))
    cb = c.select(
        "cid", "xc", "yc",
        F.floor(F.col("xc") / g).alias("gx"),
        F.floor(F.col("yc") / g).alias("gy"),
    )
    # lazy localCheckpoint: phase1 feeds BOTH the result union and the
    # residual anti-join — without it the grid join + argmin execute
    # twice (the vec_centroid_outliers multi-consumer idiom)
    phase1 = (
        qa.join(cb, ["gx", "gy"])
        .groupBy("qid")
        .agg(pick)
        .filter(F.col("best.d2") <= g * g)
        .select("qid", F.col("best.cid").alias("nn_id"), F.col("best.d2").alias("nn_dist2"))
        .localCheckpoint(eager=False)
    )
    # broadcast the RESIDUAL QUERY side (sparse tail, provably small at
    # a well-chosen g) — the candidate corpus streams, it never ships
    residual = (
        F.broadcast(q.join(phase1.select("qid"), "qid", "left_anti"))
        .crossJoin(c)
        .groupBy("qid")
        .agg(pick)
        .select("qid", F.col("best.cid").alias("nn_id"), F.col("best.d2").alias("nn_dist2"))
    )
    return phase1.unionByName(residual).orderBy("qid")


@register(
    "join_asof_directional",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             (event_type = 'purchase') AS is_right
      FROM events
      WHERE event_type IN ('click', 'purchase')
    ), back AS (
      SELECT *,
             LAST_VALUE(CASE WHEN is_right THEN struct_pack(t := ts, v := value) END
                        IGNORE NULLS) OVER wb AS b_s
      FROM tagged
      WINDOW wb AS (PARTITION BY user_id
                    ORDER BY ts, is_right DESC, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), fwd AS (
      SELECT *,
             FIRST_VALUE(CASE WHEN is_right THEN struct_pack(t := ts, v := value) END
                         IGNORE NULLS) OVER wf AS f_s
      FROM back
      WINDOW wf AS (PARTITION BY user_id
                    ORDER BY ts, is_right ASC, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ), tol AS (
      SELECT event_id, user_id, ts,
             CASE WHEN date_diff('second', b_s['t'], ts) <= 21600
                  THEN b_s END AS b_s,
             CASE WHEN date_diff('second', ts, f_s['t']) <= 21600
                  THEN f_s END AS f_s
      FROM fwd WHERE NOT is_right
    )
    SELECT event_id, user_id, ts,
           b_s['v'] AS back_value,
           f_s['v'] AS fwd_value,
           CASE
             WHEN b_s IS NULL THEN f_s['v']
             WHEN f_s IS NULL THEN b_s['v']
             WHEN date_diff('second', b_s['t'], ts)
                  <= date_diff('second', ts, f_s['t']) THEN b_s['v']
             ELSE f_s['v']
           END AS nearest_value
    FROM tol
    ORDER BY event_id
    """,
)
def join_asof_directional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional as-of join with tolerance — the full pandas
    ``merge_asof`` semantics set (direction backward / forward /
    nearest, tolerance 6 h) that join_asof_nearest's single
    at-or-before carry does not cover: each click gets the latest
    purchase at-or-before (backward), the earliest at-or-after
    (forward), both NULLed beyond the 6-hour tolerance, and nearest =
    whichever survives with the smaller gap (tie → backward, pandas'
    rule). Ties at the click's own timestamp count for BOTH
    directions, which forces TWO orderings of one partition: backward
    sorts purchases BEFORE clicks at equal ts (frame ...CURRENT ROW
    catches them), forward sorts them AFTER (frame CURRENT ROW...
    catches them) — one user_id exchange, two sorts, zero joins
    (plan-gated). The (ts, value) carry stays a single struct per
    direction for the same NULL-value atomicity join_asof_nearest
    documents.
    Reference provenance: none; SURVEY §2 Part B join family
    (round 8) — trades/quotes enrichment at cluster scale.
    """
    ev = table(spark, sf_dir, "events")
    tol = 21600  # seconds
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        (F.col("event_type") == "purchase").alias("is_right"),
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_right").desc(), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_right").asc(), F.col("event_id"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    right_struct = F.when(
        F.col("is_right"), F.struct(F.col("ts"), F.col("value"))
    )
    enriched = tagged.select(
        "*",
        F.last(right_struct, ignorenulls=True).over(wb).alias("b_s"),
        F.first(right_struct, ignorenulls=True).over(wf).alias("f_s"),
    )
    back_gap = F.col("ts").cast("long") - F.col("b_s")["ts"].cast("long")
    fwd_gap = F.col("f_s")["ts"].cast("long") - F.col("ts").cast("long")
    tol_ok = enriched.filter(~F.col("is_right")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(back_gap <= tol, F.col("b_s")).alias("b_s"),
        F.when(fwd_gap <= tol, F.col("f_s")).alias("f_s"),
    )
    back_gap2 = F.col("ts").cast("long") - F.col("b_s")["ts"].cast("long")
    fwd_gap2 = F.col("f_s")["ts"].cast("long") - F.col("ts").cast("long")
    return tol_ok.select(
        "event_id",
        "user_id",
        "ts",
        F.col("b_s")["value"].alias("back_value"),
        F.col("f_s")["value"].alias("fwd_value"),
        F.when(F.col("b_s").isNull(), F.col("f_s")["value"])
        .when(F.col("f_s").isNull(), F.col("b_s")["value"])
        .when(back_gap2 <= fwd_gap2, F.col("b_s")["value"])
        .otherwise(F.col("f_s")["value"])
        .alias("nearest_value"),
    ).orderBy("event_id")
