"""Graph operators over relational fixtures (SURVEY.md §2 B.10).

The reference's agent traverses a tiny hand-wired LangGraph StateGraph
(ra/agent.py:151-199) — the only "graph" in the repo. These operators
generalize graph computation to data-scale graphs derived from the
relational tables, using the two standard DataFrame-native patterns:

  * **iterative message passing** (PageRank) — a fixed number of
    join + groupBy rounds with each iteration localCheckpointed, the
    same loop shape as dedup_connected_components (dedup.py) and
    vec_kmeans_train (vectors.py);
  * **degree-ordered wedge closing** (triangle counting, the
    Schank-Wagner "forward" algorithm) — orient every edge from its
    lower-degree endpoint so the wedge join fans out per vertex by its
    *oriented* out-degree (O(sqrt(m)) on any graph) instead of its raw
    degree; this is what keeps the join quadratic-proof on power-law
    graphs at 100 TB, where the naive id-ordered triple join does
    degree² work on every hub vertex.

Graph substrate: the part↔supplier bipartite graph of lineitem
(vertex id = 2*partkey for parts, 2*suppkey+1 for suppliers — disjoint
id spaces without a union of tables), and the part co-purchase graph
(parts appearing in the same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register

# Damping literals appear verbatim on BOTH engines: Python's 1 - 0.85
# and the SQL literal 0.15 are DIFFERENT doubles (last-ulp), which
# compounds over iterations — so both sides use the same parsed
# literals 0.15 / 0.85, never derived arithmetic.
# Iteration count for the registered pagerank / label-propagation ops.
# BOTH DuckDB oracles hard-code exactly this many unrolled round CTEs
# (pagerank r1-r3 below; LPA's _lpa_round_sql chain at its @register) —
# changing this constant WITHOUT adding/removing oracle rounds
# desynchronizes engine and oracle and only fails at driver-verify
# time. The assert below trips at import instead.
_ITERS = 3
assert _ITERS == 3, "update the unrolled r1..rN oracle CTEs in lockstep"


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    teleport: float | None = None,
    has_source_only: bool | None = None,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Composable PageRank: `edges` is a directed edge list (src, dst)
    — for an undirected graph pass both orientations. Returns (v, rank)
    for EVERY vertex appearing in the edge list (source-only vertices
    included), after `iters` message-passing rounds with rank_0 = 1.

    Cost shape: edges and degrees are localCheckpointed once; each round
    is ONE src join + ONE map-side-combinable dst aggregation — the
    no-in-edge vertices do NOT cost a per-round join: a vertex with no
    in-edges receives exactly the teleport term every round after the
    first, so the (one-off anti-join) source-only set is unioned into
    the rank frame each round as a constant — unionAll is narrow, no
    shuffle — instead of left-joining the full vertex set per round
    (measured 3× slower at sf0.1). Vertices with no out-edges
    contribute no mass (dangling mass is not redistributed — undirected
    inputs never have any). `teleport` defaults to 1−damping; pass it
    explicitly when a cross-engine oracle needs literal-identical
    doubles (module docstring: 1−0.85 ≠ 0.15 in IEEE).

    `has_source_only`: None (default) detects the no-in-edge vertex set
    with a one-off distinct + anti-join over the checkpointed edge
    list; pass False when the input provably has none (any undirected /
    both-orientations edge list — the registered bipartite query does)
    to skip that build entirely (~20% of the query at sf0.1), or True
    to force the union path without the emptiness probe."""
    if teleport is None:
        teleport = 1.0 - damping
    edges = edges.select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Degree is static across iterations: fuse it into the checkpointed
    # edge list once, so each round is ONE join + one aggregation
    # instead of two joins (at scale: one fewer shuffle of the edge
    # set per iteration).
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    if has_source_only is False:
        src_only = None
        has_src_only = False
    else:
        # the no-in-edge set, built FROM THE CHECKPOINT (building it
        # from the raw `edges`/`deg` lineage would re-run the upstream
        # scan+distinct — measured ~2 s at sf0.1); one distinct + one
        # anti-join, both over the materialized edge list
        src_only = (
            edges_deg.select(F.col("src").alias("v"))
            .distinct()
            .join(edges_deg.select(F.col("dst").alias("v")), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        # undirected inputs have NO source-only vertices: skip the
        # per-round union entirely so the loop keeps the aggregation's
        # hash partitioning intact (the union erases outputPartitioning
        # and re-shuffles the rank frame every round — measured
        # ~0.3 s/round at sf0.1 for nothing)
        has_src_only = True if has_source_only else bool(src_only.head(1))
    if checkpoint_interval <= 0:
        raise ValueError(
            f"checkpoint_interval must be >= 1, got {checkpoint_interval} "
            "(use a value > iters to never checkpoint mid-run)"
        )
    # seed only needs the CONTRIBUTING vertices (contributions inner-join
    # on src): in-only vertices enter the rank frame via the first
    # round's aggregation. Seed FROM THE CHECKPOINT — deg's raw lineage
    # would re-run the upstream scan+distinct+union in round 1's job
    # (the same ~2 s/sf0.1 cost the src_only build above avoids).
    ranks = (
        edges_deg.select(F.col("src").alias("v")).distinct()
        .select("v", F.lit(1.0).alias("rank"))
    )
    if iters == 0:
        # contract: a rank for EVERY vertex in the edge list — in-only
        # vertices normally enter via round 1's aggregation, so with no
        # rounds they must be unioned in explicitly at the seed value
        in_only = (
            edges_deg.select(F.col("dst").alias("v")).distinct()
            .join(ranks.select("v"), "v", "left_anti")
        )
        ranks = ranks.unionAll(in_only.select("v", F.lit(1.0).alias("rank")))
    for i in range(iters):
        contrib = edges_deg.join(ranks, edges_deg.src == ranks.v).select(
            "dst", (F.col("rank") / F.col("deg")).alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg((F.lit(teleport) + F.lit(damping) * F.sum("c")).alias("rank"))
            .select(F.col("dst").alias("v"), "rank")
        )
        if has_src_only:
            ranks = ranks.unionAll(src_only.select("v", F.lit(teleport).alias("rank")))
        # Checkpoint every `checkpoint_interval` rounds, not every round:
        # an eager materialization per iteration costs a full job each
        # time, but a few chained join+agg rounds are a perfectly fine
        # single plan for Catalyst (measured: 3 iterations un-checkpointed
        # run ~20% faster at sf0.1). The interval bounds lineage/plan
        # growth for long runs — what the per-round form over-paid for.
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Composable triangle count: `edges` holds each undirected edge
    exactly once as (u, v) with u < v. Degree-ordered wedge closing
    (docstring of graph_triangle_count); returns a single-row DataFrame
    (n_triangles bigint)."""
    edges = edges.select("u", "v")
    und = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("u").alias("du_v"), F.col("deg").alias("du"))
    dv = deg.select(F.col("u").alias("dv_v"), F.col("deg").alias("dv"))
    with_deg = (
        und.join(du, und.u == F.col("du_v"))
        .join(dv, und.v == F.col("dv_v"))
        .select("u", "v", "du", "dv")
    )
    oriented = (
        with_deg.filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    w2 = oriented.select(F.col("u").alias("w_u"), F.col("v").alias("w_v"))
    wedges = oriented.join(
        w2, (oriented.u == F.col("w_u")) & (oriented.v < F.col("w_v"))
    ).select(F.col("v").alias("a"), F.col("w_v").alias("b"))
    closer = oriented.select(
        F.least("u", "v").alias("c_u"), F.greatest("u", "v").alias("c_v")
    )
    tri = wedges.join(
        closer, (wedges.a == F.col("c_u")) & (wedges.b == F.col("c_v"))
    )
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def _bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part↔supplier edges as a directed edge list (both
    orientations), deduplicated. One narrow scan of lineitem's two key
    columns; the DISTINCT is one hash-aggregate shuffle."""
    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") * 2).alias("p_v"),
        (F.col("l_suppkey") * 2 + 1).alias("s_v"),
    )
    pairs = li.distinct()
    return pairs.select(F.col("p_v").alias("src"), F.col("s_v").alias("dst")).unionAll(
        pairs.select(F.col("s_v").alias("src"), F.col("p_v").alias("dst"))
    )


@register(
    "graph_pagerank",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey * 2 AS p_v, l_suppkey * 2 + 1 AS s_v
      FROM lineitem
    ), edges AS (
      SELECT p_v AS src, s_v AS dst FROM pairs
      UNION ALL
      SELECT s_v AS src, p_v AS dst FROM pairs
    ), deg AS (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ), r0 AS (
      SELECT src AS v, 1.0 AS rank FROM deg
    ), r1 AS (
      SELECT e.dst AS v, 0.15 + 0.85 * SUM(r.rank / d.deg) AS rank
      FROM edges e JOIN r0 r ON r.v = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ), r2 AS (
      SELECT e.dst AS v, 0.15 + 0.85 * SUM(r.rank / d.deg) AS rank
      FROM edges e JOIN r1 r ON r.v = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ), r3 AS (
      SELECT e.dst AS v, 0.15 + 0.85 * SUM(r.rank / d.deg) AS rank
      FROM edges e JOIN r2 r ON r.v = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )
    SELECT v, ROUND(rank, 6) AS rank
    FROM r3
    ORDER BY ROUND(rank, 6) DESC, v
    LIMIT 20
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, d=0.85, rank_0=1) on the
    part↔supplier bipartite graph; top-20 vertices.

    Spark shape: edges and out-degrees are computed once and
    localCheckpointed (the loop in dedup_connected_components sets the
    pattern — without the checkpoint each iteration's plan re-derives
    the DISTINCT subtree and lineage triples). Each iteration is one
    shuffle join rank⋈edges on src plus one groupBy(dst) — partial
    aggregation makes the message combine map-side, so the shuffle
    carries one row per (reducer, dst), not one per edge. Undirected
    degrees ≥ 1 everywhere: no dangling-mass term needed. In
    production the rank frame is also repartitioned by v once so every
    iteration's join reuses the same hash partitioning.

    Ordering ties are broken on v; ranks are compared ROUNDed to 1e-6
    on both engines (registry determinism rules).
    Reference provenance: generalizes the LangGraph node-hop loop
    (ra/agent.py:151-199) from a 4-node control graph to a data-scale
    graph computation.
    """
    ranks = pagerank(
        _bipartite_edges(spark, sf_dir),
        iters=_ITERS,
        damping=0.85,
        teleport=0.15,
        # both orientations are unioned, so every vertex has out-edges —
        # skip the source-only probe (docstring of pagerank())
        has_source_only=False,
    )
    return (
        ranks.select("v", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "v")
        .limit(20)
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH small AS (
      SELECT p_partkey FROM part WHERE p_size <= 10
    ), items AS (
      SELECT DISTINCT l_orderkey, l_partkey
      FROM lineitem JOIN small ON p_partkey = l_partkey
    ), edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.u = e1.v
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts bought in the
    same order; restricted to p_size ≤ 10 — the size predicate is pushed
    to the part scan and the restriction applied as a broadcast join).

    Degree-ordered "forward" counting (Schank & Wagner 2005): orient
    each undirected edge from its lower-(degree, id) endpoint, build
    wedges by joining oriented edges on their source, and close each
    wedge against the oriented edge set normalized to id order (so the
    closure is a plain equi-join, never an OR-condition nested loop).
    The orientation is an acyclic tournament on every triangle — exactly
    one vertex out-points to both others — so each triangle is produced
    by exactly one wedge and the count needs no /3 correction. The scale
    property: wedge fan-out per vertex is its ORIENTED out-degree,
    O(sqrt(m)) even for power-law hubs, where the naive id-ordered
    triple join does degree² work on every hub vertex.

    The oracle counts the same triangles with the naive a<b<c triple
    join (fine at fixture scale, and independent of the orientation
    trick — a genuine cross-check of the algorithm, not an echo of it).
    Reference provenance: no graph analytics exist in the reference;
    declared in SURVEY §2 Part B as part of the dedup/similarity
    cluster-analysis surface (pair graphs from dedup_minhash_lsh feed
    exactly this edge-list shape).
    """
    small = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey"
    )
    items = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pk2"))
    edges = (
        items.join(b, (items.l_orderkey == b.o) & (items.l_partkey < b.pk2))
        .select(F.col("l_partkey").alias("u"), F.col("pk2").alias("v"))
        .distinct()
    )
    return triangle_count(edges)


@register(
    "graph_degree_hist",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey * 2 AS p_v, l_suppkey * 2 + 1 AS s_v
      FROM lineitem
    ), edges AS (
      SELECT p_v AS src, s_v AS dst FROM pairs
      UNION ALL
      SELECT s_v AS src, p_v AS dst FROM pairs
    ), deg AS (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    )
    SELECT deg AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM deg
    GROUP BY deg
    ORDER BY deg
    """,
)
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part↔supplier bipartite graph — the
    first diagnostic run on any data-scale graph (it decides whether
    the naive triangle join or PageRank partitioning will blow up on
    hub vertices; graph_triangle_count's orientation trick exists
    precisely because of this histogram's tail).

    Two cascaded map-side-combinable aggregations: shuffle 1 carries
    one row per distinct edge (the DISTINCT), shuffle 2 one row per
    vertex, shuffle 3 one row per distinct degree — each exchange
    strictly smaller than the last, the canonical telescoping-agg
    shape.
    Reference provenance: none; SURVEY §2 Part B graph family
    (round 3).
    """
    deg = _bipartite_edges(spark, sf_dir).groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    )
    return (
        deg.groupBy("deg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"))
        .select(F.col("deg").alias("degree"), "n_vertices")
        .orderBy("degree")
    )


@register(
    "graph_bfs_layers",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT l_partkey * 2 AS p_v, l_suppkey * 2 + 1 AS s_v
      FROM lineitem
    ), edges AS (
      SELECT p_v AS src, s_v AS dst FROM pairs
      UNION ALL
      SELECT s_v AS src, p_v AS dst FROM pairs
    ), sources AS (
      SELECT DISTINCT s_suppkey * 2 + 1 AS v FROM supplier WHERE s_nationkey = 0
    ), bfs(v, layer) AS (
      SELECT v, 0 FROM sources
      UNION
      SELECT e.dst, b.layer + 1
      FROM bfs b JOIN edges e ON e.src = b.v
      WHERE b.layer < 4
    ), levels AS (
      SELECT v, MIN(layer) AS layer FROM bfs GROUP BY v
    )
    SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_vertices,
           MIN(v) AS min_v, MAX(v) AS max_v
    FROM levels
    GROUP BY layer
    ORDER BY layer
    """,
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS to depth 4 on the part↔supplier graph, sources =
    suppliers of nation 0: per layer (min hops from any source), the
    vertex count and id range — the reachability/neighborhood-growth
    diagnostic run before any propagation algorithm (how many rounds
    until the frontier saturates decides every iterative-job budget
    here, dedup_connected_components included).

    Frontier form, NOT the recursive-CTE form the oracle uses: each
    round joins the CURRENT FRONTIER (vertices first reached last
    round) against the edge list and anti-joins the visited set — so
    per-round work is |frontier ⋈ edges|, shrinking as the graph
    saturates, where the naive all-paths expansion (what the CTE does)
    grows combinatorially with path count. Only the per-round NEW
    frontier is localCheckpointed (it is the small, shrinking frame);
    the visited set is the lazy union of those materialized layer
    frames, never re-materialized as a whole — r4 rework: the previous
    form checkpointed the GROWING visited union every round, paying
    O(|V|) materialization × depth. The frontier's row count is free
    after the eager checkpoint, which buys two scale adaptations the
    CTE can't express: EARLY EXIT the moment a round adds nothing
    (saturation — on this graph depth 4 is empty), and a
    frontier-size-adaptive join strategy (broadcast the frontier into
    the edge join while it fits, shuffle join once it doesn't — the
    decision AQE would make, taken with an exact count; a lazy
    checkpoint + count-as-materializer variant measured SLOWER than
    the eager form — paired ABBA 3.34 -> 4.10 s — and was reverted). At 100 TB the
    joins shuffle on vertex id and 4 rounds = ≤4 bounded shuffle
    rounds, no driver-side data beyond one count per round.

    The oracle's UNION-dedup recursion is exponential-path-safe only at
    fixture scale — which is exactly the brute-force-twin pattern
    (dedup_near_jaccard) this suite uses everywhere.
    Reference provenance: generalizes the LangGraph hop traversal
    (ra/agent.py:151-199) to data-scale reachability.
    """
    edges = _bipartite_edges(spark, sf_dir).localCheckpoint(eager=True)
    sources = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("v"))
        .distinct()
    )
    frontier = sources.select(
        "v", F.lit(0).alias("layer")
    ).localCheckpoint(eager=True)
    layers = [frontier]
    visited = frontier.select("v")
    n_frontier = frontier.count()
    for depth in range(1, 5):
        if n_frontier == 0:
            break
        fr = frontier.select("v")
        # hint broadcast only while the frontier is BYTES-small: 100k
        # longs ≈ 0.8 MB raw / a few MB as a HashedRelation, safely
        # inside the 10 MB autoBroadcastJoinThreshold. F.broadcast is a
        # hard hint AQE cannot demote, so the cutoff must stay below
        # the byte limit the planner would apply — beyond it, leave the
        # join to AQE, which can still promote at runtime.
        if n_frontier <= 100_000:
            fr = F.broadcast(fr)
        reached = (
            edges.join(fr, edges.src == fr.v)
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        frontier = (
            reached.join(visited, "v", "left_anti")
            .select("v", F.lit(depth).alias("layer"))
            .localCheckpoint(eager=True)
        )
        n_frontier = frontier.count()
        if n_frontier:
            layers.append(frontier)
            visited = visited.unionAll(frontier.select("v"))
    out = layers[0]
    for extra in layers[1:]:
        out = out.unionAll(extra)
    return (
        out.groupBy("layer")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .orderBy("layer")
    )


@register(
    "graph_jaccard_neighbors",
    oracle="""
    WITH postings AS (
      SELECT DISTINCT l_partkey AS part, l_suppkey AS supp FROM lineitem
    ), rare AS (
      SELECT part FROM postings GROUP BY part HAVING COUNT(*) <= 64
    ), p AS (
      SELECT postings.part, postings.supp
      FROM postings JOIN rare USING (part)
    ), sizes AS (
      SELECT supp, COUNT(*) AS n FROM p GROUP BY supp
    ), shared AS (
      SELECT a.supp AS supp_a, b.supp AS supp_b, COUNT(*) AS n_shared
      FROM p a JOIN p b ON a.part = b.part AND a.supp < b.supp
      GROUP BY a.supp, b.supp
    )
    SELECT supp_a, supp_b, n_shared, jaccard
    FROM (
      SELECT sh.supp_a, sh.supp_b, sh.n_shared,
             ROUND(sh.n_shared / CAST(sa.n + sb.n - sh.n_shared AS DOUBLE), 6)
               AS jaccard
      FROM shared sh
      JOIN sizes sa ON sa.supp = sh.supp_a
      JOIN sizes sb ON sb.supp = sh.supp_b
    )
    ORDER BY jaccard DESC, supp_a, supp_b
    LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood similarity: the top-20 supplier
    pairs by part-neighborhood Jaccard — "these two suppliers serve
    the most similar catalogs" — the structural-equivalence signal
    behind recommend-a-supplier / collapse-duplicate-vendor tasks, and
    the graph-native sibling of dedup_near_jaccard (token sets →
    neighbor sets). Global top-k, not a threshold: the fixture's
    uniform-random graph puts every pair's Jaccard in a narrow band
    (~0.14), so a fixed threshold either returns everything or
    nothing; ranking is the form that carries signal on ANY degree
    distribution. Ties are impossible to mis-order — (jaccard desc,
    supp_a, supp_b) is a total key on both engines.

    Inverted-index wedge shape, never all-pairs: postings (part →
    supplier) self-join on the part, so a pair is generated once per
    SHARED part and only pairs with ≥1 common part exist. The
    hub-guard cap (parts with ≤ 64 suppliers — 64 > the fixture's max
    part degree of 52, so nothing is dropped at test scale, stated
    per the no-silent-caps rule) bounds the wedge fan-out at cap² per
    part: a hub part served by thousands of suppliers would emit
    degree² pairs while carrying no similarity signal (everyone
    shares it) — the same discriminative-posting rule as
    dedup_containment_pairs' df-cap, with sizes computed over the
    SAME capped postings so the metric stays internally consistent.
    a.supp < b.supp halves the join output; both size lookups ride
    broadcast joins (one row per supplier); the global top-20 is a
    TakeOrdered (per-partition top-k then a 20-row driver merge),
    never a full sort. At 100 TB: one shuffle on part (wedge), one on
    the pair (count), bounded fan-out — the plan survives power-law
    degree distributions by construction.
    Reference provenance: none; SURVEY §2 Part B graph family
    (round 4).
    """
    postings = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    rare = (
        postings.groupBy("part")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 64)
        .select("part")
    )
    # p feeds THREE consumers (sizes, both wedge sides) — materialize it
    # once or the scan+distinct+cap lineage re-runs three times
    # (measured 5.0 s → ~2 s at sf0.1)
    p = postings.join(rare, "part").localCheckpoint(eager=True)
    sizes = p.groupBy("supp").agg(F.count(F.lit(1)).alias("n"))
    a = p.select("part", F.col("supp").alias("supp_a"))
    b = p.select("part", F.col("supp").alias("supp_b"))
    shared = (
        a.join(b, "part")
        .filter(F.col("supp_a") < F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(
            F.broadcast(sizes.select(F.col("supp").alias("supp_a"), F.col("n").alias("na"))),
            "supp_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("supp").alias("supp_b"), F.col("n").alias("nb"))),
            "supp_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
                6,
            ),
        )
    )
    return (
        out.select("supp_a", "supp_b", "n_shared", "jaccard")
        .orderBy(F.col("jaccard").desc(), "supp_a", "supp_b")
        .limit(20)
    )


def _lpa_round_sql(prev: str, cur: str) -> str:
    """One unrolled synchronous LPA round as a DuckDB CTE pair: count
    neighbor labels per vertex, keep the most frequent (min label id on
    ties)."""
    return f"""{cur}_cnt AS (
      SELECT e.dst AS v, r.label, COUNT(*) AS c
      FROM edges e JOIN {prev} r ON r.v = e.src
      GROUP BY e.dst, r.label
    ), {cur} AS (
      SELECT v, MIN(label) AS label
      FROM {cur}_cnt a
      WHERE c = (SELECT MAX(c) FROM {cur}_cnt b WHERE b.v = a.v)
      GROUP BY v
    )"""


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l_partkey * 2 AS p_v, l_suppkey * 2 + 1 AS s_v
      FROM lineitem
    ), edges AS (
      SELECT p_v AS src, s_v AS dst FROM pairs
      UNION ALL
      SELECT s_v AS src, p_v AS dst FROM pairs
    ), r0 AS (
      SELECT DISTINCT src AS v, src AS label FROM edges
    ), {_lpa_round_sql("r0", "r1")}, {_lpa_round_sql("r1", "r2")},
    {_lpa_round_sql("r2", "r3")}
    SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM r3
    GROUP BY label
    ORDER BY n_vertices DESC, community
    LIMIT 20
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), 3 fixed rounds on the part↔supplier bipartite graph,
    label_0 = vertex id; each round every vertex adopts its neighbors'
    MOST FREQUENT label, ties broken to the smallest label id — the
    deterministic variant (classic LPA breaks ties randomly, which no
    cross-engine oracle could pin). Output: the 20 largest communities
    after round 3.

    Spark shape — the window-free round: neighbor-label counts are one
    join + one map-side-combinable (dst, label) hash agg, and the
    per-vertex argmax is a SECOND tiny agg `max(struct(c, -label))` on
    dst — never a row_number window (a window would force a second
    full sort per round; max(struct) keeps both steps partial-agg
    combinable). Labels are checkpointed per round (the
    dedup_connected_components loop pattern) so round N's plan does
    not re-derive rounds 1..N-1. Per round the shuffled bytes are
    bounded by the distinct (vertex, neighbor-label) pairs — at 100 TB
    this is the standard GraphX/Pregel LPA message shape, and the
    fixed round count keeps the whole job 3 × (join + 2 aggs).

    The DuckDB oracle unrolls the identical 3 rounds as CTEs (the
    graph_pagerank convention); all arithmetic is integer, so parity
    is exact with no float rule.
    Reference provenance: none (the reference's only graph is a 4-node
    control-flow StateGraph, ra/agent.py:151-199); north-star graph
    family, the community face next to pagerank's centrality face.
    """
    edges = _bipartite_edges(spark, sf_dir).localCheckpoint(eager=False)
    labels = edges.select("src").distinct().select(
        F.col("src").alias("v"), F.col("src").alias("label")
    )
    for _ in range(_ITERS):
        counted = (
            edges.join(labels, edges.src == labels.v)
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counted.groupBy("dst")
            .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("m"))
            .select(F.col("dst").alias("v"), (-F.col("m.nl")).alias("label"))
            .localCheckpoint(eager=False)
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy(F.col("n_vertices").desc(), "community")
        .limit(20)
    )


@register(
    "graph_copurchase_pairs",
    oracle="""
    -- bipartite projection replay: parts co-occurring in one order
    -- form an edge; weight = number of orders sharing the pair. Top-20
    -- by (weight DESC, part_a, part_b) — integer counts, no floats.
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS weight
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT part_a, part_b, CAST(weight AS BIGINT) AS weight
    FROM pairs
    ORDER BY weight DESC, part_a, part_b
    LIMIT 20
    """,
)
def graph_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of the order→part graph onto part-part
    co-purchase edges (market-basket co-occurrence — the input to
    item-to-item collaborative filtering and frequent-pair mining):
    two parts are connected iff some order contains both, weighted by
    how many orders do; output = the top-20 heaviest pairs with a full
    deterministic tiebreak. Distinct from the user-graph family
    (degree/triangles/pagerank run on the synthetic edge fixture);
    this derives its graph from the RELATIONAL tables.

    Scale shape: distinct (order, part) → an equi self-join on the
    ORDER key, so each order only meets itself — the pair blowup is
    bounded by per-order basket size squared (TPC-H ~7 items → ≤21
    pairs per order), never |parts|²; the count groupBy is map-side
    combinable and the top-20 is a TakeOrdered, not a global sort.
    Integer weights — no float discipline needed.
    Reference provenance: none; SURVEY §2 B.11 graph family (round 9);
    public recipe = bipartite projection / co-occurrence mining.
    """
    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(
            F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
        .orderBy(F.col("weight").desc(), "part_a", "part_b")
        .limit(20)
    )
