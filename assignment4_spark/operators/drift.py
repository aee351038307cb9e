"""Distribution-drift and dependence statistics (SURVEY.md §2 B.11).

The reference pipeline re-ingests the same publication corpus on every
Airflow run (airflow/dags/parser_pinecone_storage.py:118-190) with no
check that the new snapshot still *looks like* the old one — a silent
upstream format change (prices rescaled, a field dropped, a bot cohort
appearing) flows straight into the Pinecone index. At 100 TB that check
is mandatory and must itself be a distributed aggregate. The family:
two-sample Kolmogorov-Smirnov (exact, continuous columns — the CDF is
a distributed prefix sum, never a single-partition window), Population
Stability Index (binned, the industry drift score), mutual information
(categorical dependence / label-leakage probe), and embedding-space
centroid drift (exact-decimal per-dim sums) — each ONE hash-aggregate
pass plus group-count-sized math, so the shuffle is O(distinct values,
bins, or dims), never O(rows). The streaming face
(stream_tv_drift_daily, streaming/batch_decl.py) completes the set.

Determinism: KS runs entirely in exact cross-multiplied arithmetic
(|cum_a·n_b − cum_b·n_a| as DECIMAL — int64 would wrap silently at the
very scale the distributed form targets) so the max and its argmax are
bit-exact in both engines; PSI/MI round each float term to 6 dp BEFORE
the total so summation order cannot flip the 6th decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register
from ..schemas import FIXTURE_EMBED_DIM


def ks_2sample(df: DataFrame, value_col: str, flag_col: str) -> DataFrame:
    """Composable two-sample Kolmogorov-Smirnov core: `df` carries one
    row per observation with `value_col` (any orderable type) and
    `flag_col` (1 = sample A, 0 = sample B). Returns ONE row
    `(n_a, n_b, ks_at_value, ks_d)` — the supremum CDF gap D rounded to
    6 dp, attained at `ks_at_value` (ties broken on the smaller value).

    Plan — a DISTRIBUTED prefix sum, not a global window: hash-agg on
    distinct values (shuffle is O(distinct)) → repartitionByRange on
    value → per-partition running CDFs (windows keyed on the physical
    partition id — parallel) → per-partition totals collapse to a
    ≤n_partitions-row frame whose exclusive prefix becomes a BROADCAST
    offset correction, plus a 1-row broadcast of the grand totals →
    TakeOrdered(1) tail. The first draft used `Window.orderBy(value)`
    with no partition key, which Spark plans as Exchange
    SinglePartition — every distinct value of a continuous column
    through ONE task, the definition of a 100 TB bottleneck; the
    offset-corrected form keeps the CDF fully parallel and is
    value-identical because cum(v) = Σ counts ≤ v regardless of where
    range boundaries fall. The argmax compares the exact DECIMAL
    cross-product |cum_a·n_b − cum_b·n_a| (int64 would wrap silently
    past ~3e9 rows per side), so no float accumulation can flip it
    under any partitioning. See agg_ks_drift for the
    registry/oracle instance.
    """
    v, f_ = F.col(value_col), F.col(flag_col)
    # NULL values are NOT observations: counted, they inflate n and form
    # a phantom CDF step whose position even differs cross-engine
    # (Spark windows sort NULLS FIRST, DuckDB's NULLS LAST — measured)
    steps = (
        df.filter(v.isNotNull())
        .select(v.alias("value"), f_.alias("is_a"))
        .groupBy("value")
        .agg(F.sum("is_a").alias("d_a"), F.sum(1 - F.col("is_a")).alias("d_b"))
    )
    parts = steps.repartitionByRange(F.col("value")).withColumn(
        "pid", F.spark_partition_id()
    )
    w_loc = (
        Window.partitionBy("pid")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Lazily checkpoint AFTER the expensive prefix (scan → distinct agg
    # → range exchange → local-CDF window): its three consumers — the
    # per-partition totals, the grand totals, and the final join probe —
    # then read one materialized O(distinct) frame instead of re-running
    # the scan pipeline each.
    loc = (
        parts.select(
            "pid",
            "value",
            F.sum("d_a").over(w_loc).alias("la"),
            F.sum("d_b").over(w_loc).alias("lb"),
        )
        .localCheckpoint(eager=False)
    )
    # Running sums are monotone (non-negative increments), so each
    # partition's TOTAL is just the max of its running sum — no second
    # pass over the pre-window frame.
    ptot = loc.groupBy("pid").agg(F.max("la").alias("ta"), F.max("lb").alias("tb"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptot.select(
        "pid",
        F.coalesce(F.sum("ta").over(w_off), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(w_off), F.lit(0)).alias("ob"),
    )
    tot = ptot.agg(F.sum("ta").alias("n_a"), F.sum("tb").alias("n_b"))
    gaps = (
        loc.join(F.broadcast(offs), "pid")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            "value",
            # DECIMAL(19,0) operands: the cross-product reaches
            # cum·n ≈ rows², which wraps int64 past ~3e9 rows per side
            # (with ANSI off the wrap is SILENT and the argmax garbage)
            # — exactly the scale this distributed form exists for.
            # DuckDB's SUM already promotes to 128-bit HUGEINT, so
            # decimal keeps the two engines exact together up to 1e38.
            F.abs(
                (F.col("la") + F.col("oa")).cast("decimal(19,0)")
                * F.col("n_b").cast("decimal(19,0)")
                - (F.col("lb") + F.col("ob")).cast("decimal(19,0)")
                * F.col("n_a").cast("decimal(19,0)")
            ).alias("gap"),
        )
    )
    return (
        gaps.orderBy(F.col("gap").desc(), "value")
        .limit(1)
        .select(
            "n_a",
            "n_b",
            F.col("value").alias("ks_at_value"),
            # denominator as double·double (NOT an integer product that
            # would itself wrap); the oracle mirrors the same cast chain
            # so the one rounding happens identically in both engines
            # empty-side guard: with n_a or n_b = 0 the statistic is
            # undefined — NULL, matching DuckDB's non-ANSI division,
            # instead of an ANSI DIVIDE_BY_ZERO killing the job
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.round(
                    F.col("gap").cast("double")
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                    6,
                ),
            ).alias("ks_d"),
        )
    )


def psi_binned(
    binned: DataFrame,
    n_bins: int,
    bin_col: str = "bin_id",
    ref_col: str = "w_ref",
    cur_col: str = "w_cur",
) -> DataFrame:
    """Composable Population Stability Index core over a pre-binned
    observation frame: one row per observation with integer `bin_col` in
    [0, n_bins) and 0/1 weights `ref_col` / `cur_col`. Returns one row
    per bin `(bin_id, n_ref, n_cur, psi_term, psi_total)` ordered by
    bin — Laplace-smoothed (+0.5/bin, so empty bins score instead of
    inf), per-bin terms rounded to 6 dp BEFORE the total so summation
    order cannot move the headline. Empty bins are seeded via a
    zero-weight `spark.range` unionAll (plan stays one scan + one
    hash-agg). See agg_psi_drift for the registry/oracle instance.
    """
    spark = binned.sparkSession
    # numPartitions pinned to 1: a bare range(n) inherits
    # defaultParallelism slices, unioning ~32 near-empty tasks into
    # the scan stage for a handful of seed rows
    seed = spark.range(0, n_bins, 1, 1).select(
        F.col("id").cast("int").alias("bin_id"),
        F.lit(0).alias("w_ref"),
        F.lit(0).alias("w_cur"),
    )
    obs = binned.select(
        F.col(bin_col).cast("int").alias("bin_id"),
        F.col(ref_col).alias("w_ref"),
        F.col(cur_col).alias("w_cur"),
    )
    cnt = obs.unionAll(seed).groupBy("bin_id").agg(
        F.sum("w_ref").alias("n_ref"), F.sum("w_cur").alias("n_cur")
    )
    w_all = Window.partitionBy()
    half = n_bins * 0.5
    p_ref = (F.col("n_ref") + 0.5) / (F.sum("n_ref").over(w_all) + half)
    p_cur = (F.col("n_cur") + 0.5) / (F.sum("n_cur").over(w_all) + half)
    terms = cnt.select(
        "bin_id",
        "n_ref",
        "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )
    return terms.select(
        "bin_id",
        "n_ref",
        "n_cur",
        "psi_term",
        F.round(F.sum("psi_term").over(w_all), 6).alias("psi_total"),
    ).orderBy("bin_id")


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Composable mutual-information core between two categorical
    columns: one row per joint cell `(x_col, y_col, n_xy, mi_term,
    mi_total)` ordered by (x, y); per-cell contributions rounded to
    6 dp before the total. Marginals and the grand total ride windows
    OVER THE JOINT cells — the corpus is scanned once and the shuffle
    is O(|X|·|Y|). See agg_mutual_information for the registry/oracle
    instance.
    """
    joint = df.groupBy(x_col, y_col).agg(F.count("*").alias("n_xy"))
    n_x = F.sum("n_xy").over(Window.partitionBy(x_col))
    n_y = F.sum("n_xy").over(Window.partitionBy(y_col))
    n = F.sum("n_xy").over(Window.partitionBy())
    # marginal products as double·double — the integer product n_x·n_y
    # wraps int64 silently past ~3e9 rows (same hazard the KS
    # cross-product had); the oracle mirrors the identical cast chain
    terms = joint.select(
        x_col,
        y_col,
        "n_xy",
        F.round(
            (F.col("n_xy").cast("double") / n)
            * F.log(
                F.col("n_xy").cast("double")
                * n
                / (n_x.cast("double") * n_y.cast("double"))
            ),
            6,
        ).alias("mi_term"),
    )
    return terms.select(
        x_col,
        y_col,
        "n_xy",
        "mi_term",
        F.round(F.sum("mi_term").over(Window.partitionBy()), 6).alias("mi_total"),
    ).orderBy(x_col, y_col)

# PSI bins: fixed literal edges (width 50 over [0, 500)) rather than
# data-derived min/max — identical constants in both engines, so a value
# sitting exactly on an edge bins identically; the events fixture draws
# value in [0.01, 490.02] so the range is exhaustive by construction.
_PSI_BIN_W = 50
_PSI_BINS = 10
# Reference window for the whole drift family (weeks 1-2 of the events
# fixture); stream_tv_drift_daily imports this so the batch and
# streaming faces can never disagree about what "reference" means.
DRIFT_REF_SPLIT = "2024-01-15 00:00:00"


@register(
    "agg_ks_drift",
    oracle="""
    WITH pop AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    tot AS (SELECT SUM(is_a) AS n_a, SUM(1 - is_a) AS n_b FROM pop),
    steps AS (
      SELECT value,
             SUM(SUM(is_a))     OVER (ORDER BY value) AS cum_a,
             SUM(SUM(1 - is_a)) OVER (ORDER BY value) AS cum_b
      FROM pop GROUP BY value
    ),
    gaps AS (
      SELECT s.value, ABS(s.cum_a * t.n_b - s.cum_b * t.n_a) AS gap,
             t.n_a, t.n_b
      FROM steps s CROSS JOIN tot t
    )
    -- CAST(n_a AS BIGINT): DuckDB's SUM over integers returns HUGEINT,
    -- which its pandas conversion renders as float64 while Spark's
    -- non-null long renders int64 — the exact dtype split behind the
    -- r6 driver hash-FAIL on this op (values matched, representation
    -- didn't). BIGINT pins both engines to int64. See VERDICT r6 §wrong.
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           value AS ks_at_value,
           ROUND(CAST(gap AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS ks_d
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY gap DESC, value) AS rn
          FROM gaps)
    WHERE rn = 1
    """,
)
def agg_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test: does the `value`
    distribution of 'click' events match that of 'purchase' events?
    Returns the supremum CDF gap D, the value where it is attained
    (ties broken on the smaller value), and both sample sizes.

    Spark shape: one filtered scan (predicate pushed to parquet) →
    hash-agg on distinct `value` (map-side combined, shuffle is
    O(distinct values)) → ks_2sample's DISTRIBUTED prefix-sum CDF
    (range partition → per-partition running sums → broadcast offset
    correction; plan-gated against the single-partition global-window
    form — see the core's docstring for the full argument) →
    TakeOrdered(1) tail. The CDF gap is compared as the exact
    DECIMAL cross-product |cum_a·n_b − cum_b·n_a| (int64 would wrap
    silently past ~3e9 rows per side; the division to D happens once,
    on the winning row), so no float accumulation can flip the argmax
    cross-engine. agg_psi_drift models the binned variant for when
    even O(distinct values) is too wide a shuffle.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "value",
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        )
    )
    return ks_2sample(ev, "value", "is_a")


@register(
    "agg_psi_drift",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(GREATEST(LEAST(FLOOR(value / {_PSI_BIN_W}), {_PSI_BINS - 1}), 0) AS INTEGER) AS bin_id,
             CASE WHEN ts < TIMESTAMP '{DRIFT_REF_SPLIT}' THEN 1 ELSE 0 END AS w_ref,
             CASE WHEN ts < TIMESTAMP '{DRIFT_REF_SPLIT}' THEN 0 ELSE 1 END AS w_cur
      FROM events
      UNION ALL
      SELECT CAST(s AS INTEGER), 0, 0
      FROM (SELECT UNNEST(generate_series(0, {_PSI_BINS - 1})) AS s)
    ),
    cnt AS (
      -- BIGINT: SUM over integers is HUGEINT in DuckDB → float64 in
      -- pandas vs Spark's int64 (the r6 driver hash-FAIL); pin to int64
      SELECT bin_id, CAST(SUM(w_ref) AS BIGINT) AS n_ref,
             CAST(SUM(w_cur) AS BIGINT) AS n_cur
      FROM binned GROUP BY bin_id
    ),
    smoothed AS (
      SELECT bin_id, n_ref, n_cur,
             (n_ref + 0.5) / (SUM(n_ref) OVER () + {_PSI_BINS} * 0.5) AS p_ref,
             (n_cur + 0.5) / (SUM(n_cur) OVER () + {_PSI_BINS} * 0.5) AS p_cur
      FROM cnt
    ),
    terms AS (
      SELECT bin_id, n_ref, n_cur,
             ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 6) AS psi_term
      FROM smoothed
    )
    SELECT bin_id, n_ref, n_cur, psi_term,
           ROUND(SUM(psi_term) OVER (), 6) AS psi_total
    FROM terms ORDER BY bin_id
    """,
)
def agg_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference window (events
    before 2024-01-15) and the current window, over 10 fixed-width value
    bins — the binned drift score monitoring systems alert on
    (PSI > 0.2 = investigate). Laplace-smoothed (+0.5 per bin) so an
    empty bin cannot produce ±inf; per-bin terms are rounded to 6 dp
    before the total so the headline sum is order-independent.

    Spark shape: ONE scan of (ts, value), unionAll'd with a 10-row
    zero-weight seed so empty bins still report → hash-agg on 10
    literal-edge bins (map-side combined; the shuffle carries ≤10 rows
    per input partition) → unpartitioned window over 10 rows for the
    marginals and the total. Bin edges are compile-time literals, not data-
    derived min/max, so no second pass over the corpus and no float
    edge ambiguity cross-engine. This is the 100 TB-shaped drift op:
    cost is the scan; everything after fits on the head of a pin.
    """
    is_ref = F.col("ts") < F.lit(DRIFT_REF_SPLIT).cast("timestamp")
    ev = table(spark, sf_dir, "events").select(
        # clamp BOTH ends into [0, n_bins): a negative value (refund,
        # correction) would mint an un-seeded bin_id < 0, and the
        # Laplace denominator (which adds n_bins·0.5) would stop
        # normalizing — a silently mis-scaled psi_total on both engines
        F.greatest(
            F.least(F.floor(F.col("value") / _PSI_BIN_W), F.lit(_PSI_BINS - 1)),
            F.lit(0),
        ).cast("int").alias("bin_id"),
        F.when(is_ref, 1).otherwise(0).alias("w_ref"),
        F.when(is_ref, 0).otherwise(1).alias("w_cur"),
    )
    # psi_binned seeds every bin with a zero-weight phantom row so an
    # EMPTY bin still emits its Laplace-smoothed term (PSI is defined
    # over the full binning, and an empty bin is exactly the drift
    # signal the smoothing exists to score).
    return psi_binned(ev, _PSI_BINS)


@register(
    "agg_mutual_information",
    oracle="""
    WITH joint AS (
      SELECT event_type,
             CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) / 25)
                  AS INTEGER) AS k_bucket,
             COUNT(*) AS n_xy
      FROM events GROUP BY 1, 2
    ),
    marg AS (
      SELECT event_type, k_bucket, n_xy,
             SUM(n_xy) OVER (PARTITION BY event_type) AS n_x,
             SUM(n_xy) OVER (PARTITION BY k_bucket)   AS n_y,
             SUM(n_xy) OVER ()                        AS n
      FROM joint
    ),
    terms AS (
      SELECT event_type, k_bucket, n_xy,
             ROUND((CAST(n_xy AS DOUBLE) / n)
                   * LN(CAST(n_xy AS DOUBLE) * n
                        / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6) AS mi_term
      FROM marg
    )
    SELECT event_type, k_bucket, n_xy, mi_term,
           ROUND(SUM(mi_term) OVER (), 6) AS mi_total
    FROM terms ORDER BY event_type, k_bucket
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between `event_type` and the JSON payload's
    `k` field (bucketed to quartile-width bands) — the dependence /
    label-leakage probe a training pipeline runs before trusting a
    feature: MI ≈ 0 means the payload carries no signal about the
    event class, large MI on a supposedly-independent column means
    leakage. Per-cell contributions are rounded to 6 dp before the
    total (order-independent headline).

    Spark shape: ONE scan → get_json_object (codegen, no Python) →
    hash-agg on the ~20-cell joint (map-side combined) → both marginals
    and the grand total as windows OVER THE JOINT — never a second
    corpus scan. The shuffle is O(|X|·|Y|) cells; at 100 TB the scan
    dominates and the MI math is free. integer k/25 truncation matches
    DuckDB's integer division exactly.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        # try_cast, not cast: the op probes an UNTRUSTED JSON payload,
        # and under the session's ANSI mode one non-integral k would
        # kill the stage (cond_try_cast's poisoned-row rule); a dirty k
        # degrades to a NULL bucket — its own MI category
        F.floor(F.get_json_object("props", "$.k").try_cast("int") / F.lit(25))
        .cast("int")
        .alias("k_bucket"),
    )
    return mutual_information(ev, "event_type", "k_bucket")


@register(
    "vec_embedding_drift",
    oracle=f"""
    WITH x AS (
      SELECT d.dim,
             CAST(ROUND(embedding[d.dim], 6) AS DECIMAL(12,6)) AS v6,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS is_lo
      FROM embeddings
      CROSS JOIN (SELECT UNNEST(generate_series(1, {FIXTURE_EMBED_DIM})) AS dim) d
      WHERE LEN(embedding) = {FIXTURE_EMBED_DIM}
    ),
    agg AS (
      SELECT dim,
             SUM(CASE WHEN is_lo = 1 THEN v6 ELSE CAST(0 AS DECIMAL(12,6)) END) AS s_lo,
             SUM(CASE WHEN is_lo = 0 THEN v6 ELSE CAST(0 AS DECIMAL(12,6)) END) AS s_hi,
             -- BIGINT: SUM over integers is HUGEINT in DuckDB → float64
             -- in pandas vs Spark's int64 (r6 driver hash-FAIL fix)
             CAST(SUM(is_lo) AS BIGINT) AS n_lo,
             CAST(SUM(1 - is_lo) AS BIGINT) AS n_hi
      FROM x GROUP BY dim
    ),
    m AS (
      SELECT CAST(dim AS INTEGER) AS dim, n_lo, n_hi,
             ROUND(CAST(s_lo AS DOUBLE) / n_lo, 6) AS mean_lo,
             ROUND(CAST(s_hi AS DOUBLE) / n_hi, 6) AS mean_hi
      FROM agg
    ),
    u AS (
      SELECT *, CAST(ROUND(mean_lo * 1000000) AS BIGINT) AS lo_u,
                CAST(ROUND(mean_hi * 1000000) AS BIGINT) AS hi_u
      FROM m
    )
    SELECT dim, n_lo, n_hi, mean_lo, mean_hi,
           ROUND(ABS(mean_lo - mean_hi), 6) AS mean_gap,
           ROUND(CAST(SUM(lo_u * hi_u) OVER () AS DOUBLE)
                 / NULLIF(SQRT(SUM(lo_u * lo_u) OVER ())
                          * SQRT(SUM(hi_u * hi_u) OVER ()), 0), 6)
             AS centroid_cosine
    FROM u ORDER BY dim
    """,
)
def vec_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between two populations (labels 0-4 vs
    5-9 — in production: last week's corpus vs this week's, or model
    v1 vs v2 re-embeddings): per-dimension centroid of each side, the
    per-dim gap, and the cosine between the two centroids — the
    monitoring signal that catches a re-embedding model swap or a
    corpus-composition shift that scalar drift (agg_psi_drift) on
    metadata never sees.

    Determinism is the whole design: float averages are
    reduction-order-dependent, so each component is rounded to 6 dp
    and cast DECIMAL(12,6) BEFORE summing — decimal partial sums are
    exact and associative under any partitioning (the
    agg_decimal_money argument, applied per dimension); means divide
    once at the end in double (lossless: ≤14 significant digits). The
    centroid cosine then folds the 64 rounded means AS INTEGER
    micro-units (exact window sums — an unordered window's float fold
    would be reduction-order-dependent; the scale cancels in the
    ratio) — the same windows-over-the-group-frame shape as the drift
    trio above.

    Spark shape: ONE scan → posexplode to (dim, value) — the exchange
    carries (64 dims × partial sums), never the vectors — hash-agg
    per dim with both sides' sums and counts as conditional aggregates
    in one pass, then unpartitioned windows over the 64-row frame for
    the cosine. At 100 TB the scan dominates; the shuffle is 64 rows
    per input partition.
    """
    # explicit full-width contract on BOTH engines: posexplode emits
    # only elements that EXIST, while the oracle's dims cross join
    # counts every row at every dim — a NULL or short embedding would
    # diverge silently; filter it out (and mirror the predicate in the
    # oracle) so the contract is declared, not assumed of the fixture
    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.size("embedding") == FIXTURE_EMBED_DIM)
        .select(
            (F.col("label") < 5).cast("int").alias("is_lo"),
            F.posexplode("embedding").alias("pos", "v"),
        )
    )
    x = e.select(
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("v").cast("double"), 6).cast("decimal(12,6)").alias("v6"),
        "is_lo",
    )
    zero = F.lit(0).cast("decimal(12,6)")
    agg = x.groupBy("dim").agg(
        F.sum(F.when(F.col("is_lo") == 1, F.col("v6")).otherwise(zero)).alias("s_lo"),
        F.sum(F.when(F.col("is_lo") == 0, F.col("v6")).otherwise(zero)).alias("s_hi"),
        F.sum("is_lo").alias("n_lo"),
        F.sum(1 - F.col("is_lo")).alias("n_hi"),
    )
    m = agg.select(
        F.col("dim").cast("int").alias("dim"),
        "n_lo",
        "n_hi",
        F.round(F.col("s_lo").cast("double") / F.col("n_lo"), 6).alias("mean_lo"),
        F.round(F.col("s_hi").cast("double") / F.col("n_hi"), 6).alias("mean_hi"),
    )
    # The centroid cosine folds over 64 rows of an UNORDERED window —
    # float products summed there would be reduction-order-dependent;
    # converting the (already 6 dp-rounded) means to integer micro-units
    # makes every window sum exact and associative, and the scale
    # cancels in the ratio. Division + sqrt happen once, on the same
    # exact integers in both engines.
    m = m.withColumn(
        "lo_u", F.round(F.col("mean_lo") * 1_000_000).cast("long")
    ).withColumn("hi_u", F.round(F.col("mean_hi") * 1_000_000).cast("long"))
    w_all = Window.partitionBy()
    denom = F.sqrt(F.sum(F.col("lo_u") * F.col("lo_u")).over(w_all)) * F.sqrt(
        F.sum(F.col("hi_u") * F.col("hi_u")).over(w_all)
    )
    cos = F.sum(F.col("lo_u") * F.col("hi_u")).over(w_all).cast("double") / F.nullif(
        denom, F.lit(0.0)
    )
    return m.select(
        "dim",
        "n_lo",
        "n_hi",
        "mean_lo",
        "mean_hi",
        F.round(F.abs(F.col("mean_lo") - F.col("mean_hi")), 6).alias("mean_gap"),
        F.round(cos, 6).alias("centroid_cosine"),
    ).orderBy("dim")


@register(
    "agg_ttest_ab",
    oracle="""
    WITH m AS (
      SELECT COUNT(value) FILTER (user_id % 2 = 0)              AS n_a,
             COUNT(value) FILTER (user_id % 2 = 1)              AS n_b,
             AVG(value) FILTER (user_id % 2 = 0)                AS mean_a,
             AVG(value) FILTER (user_id % 2 = 1)                AS mean_b,
             VAR_SAMP(value) FILTER (user_id % 2 = 0)           AS var_a,
             VAR_SAMP(value) FILTER (user_id % 2 = 1)           AS var_b
      FROM events
      WHERE event_type = 'purchase'
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(mean_a, 6) AS mean_a,
           ROUND(mean_b, 6) AS mean_b,
           ROUND(mean_a - mean_b, 6) AS mean_diff,
           ROUND((mean_a - mean_b) / SQRT(var_a / n_a + var_b / n_b), 4)
             AS t_stat,
           ROUND(POW(var_a / n_a + var_b / n_b, 2)
                 / (POW(var_a / n_a, 2) / (n_a - 1)
                    + POW(var_b / n_b, 2) / (n_b - 1)), 2) AS df_welch
    FROM m
    """,
)
def agg_ttest_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test — the A/B experiment readout (treatment
    = user_id parity, metric = purchase value): difference of means,
    the t statistic, and the Welch–Satterthwaite degrees of freedom.
    The member of the statistics family the drift trio (KS/PSI/MI)
    doesn't cover: KS asks "is the distribution the same", the t-test
    asks the decision question "did the MEAN move, relative to noise".

    Distributed form: t is a closed-form function of per-arm sufficient
    statistics (count, mean, sample variance), so the WHOLE test is one
    map-side-combinable conditional aggregate — one 1-row shuffle
    regardless of corpus size, the same telescoping shape as
    agg_stats/vec_centroid_outliers. Both arms ride ONE scan via
    when()-conditional aggregates (null-skipping, matching the oracle's
    FILTER clauses). Rounding per the agg_stats precedent (FIXTURES §5):
    means/diff 6 dp, the variance-quotient outputs coarser (t 4 dp,
    df 2 dp) because quotients of sampled variances amplify
    partial-agg-order float jitter.
    Reference provenance: none — the reference ships no experiment
    readout at all; SURVEY §2 B.11 statistics family (round 5)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # explicit arm predicates, never the complement: -1 % 2 = -1 on
    # both engines, so a negative odd user_id satisfies ~(u%2==0) but
    # NOT u%2==1 — the complement form diverged from the oracle there.
    # n per arm = COUNT of non-NULL metric values (both engines): the
    # Welch denominators must use the same n the variance was computed
    # over, and var_samp/avg skip NULLs.
    in_a = F.col("user_id") % 2 == 0
    in_b = F.col("user_id") % 2 == 1
    a_val = F.when(in_a, F.col("value"))
    b_val = F.when(in_b, F.col("value"))
    m = ev.agg(
        F.count(a_val).cast("bigint").alias("n_a"),
        F.count(b_val).cast("bigint").alias("n_b"),
        F.avg(a_val).alias("mean_a_raw"),
        F.avg(b_val).alias("mean_b_raw"),
        F.var_samp(a_val).alias("var_a"),
        F.var_samp(b_val).alias("var_b"),
    )
    se2_a = F.col("var_a") / F.col("n_a")
    se2_b = F.col("var_b") / F.col("n_b")
    return m.select(
        "n_a",
        "n_b",
        F.round("mean_a_raw", 6).alias("mean_a"),
        F.round("mean_b_raw", 6).alias("mean_b"),
        F.round(F.col("mean_a_raw") - F.col("mean_b_raw"), 6).alias("mean_diff"),
        F.round(
            (F.col("mean_a_raw") - F.col("mean_b_raw")) / F.sqrt(se2_a + se2_b), 4
        ).alias("t_stat"),
        F.round(
            F.pow(se2_a + se2_b, 2)
            / (
                F.pow(se2_a, 2) / (F.col("n_a") - 1)
                + F.pow(se2_b, 2) / (F.col("n_b") - 1)
            ),
            2,
        ).alias("df_welch"),
    )
