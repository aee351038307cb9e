"""Time-series analytics operators over the `events` stream table.

Two shapes every telemetry/metrics pipeline needs that plain group-bys
don't give:

  * gap filling — a date spine × dimension grid left-joined to the
    actual aggregates, so silent days show as explicit zeros instead of
    missing rows (downstream charts/models need the dense grid);
  * funnel staging — ordered multi-step conversion (signup → click →
    purchase), where each step must happen strictly AFTER the previous
    one; expressed as a cascade of per-user conditional MIN aggregates,
    one hash aggregation per step, no window over the raw stream.

Reference provenance: generalizes the reference's event-less telemetry
gap (SURVEY §2 Part A "not present") over the fixture `events` table —
the same per-user sequencing its session state (A26) implies.

Scale notes: the spine is tiny (days × types) and broadcast; the only
big-data shuffles are per-user/per-day partial aggregations that
map-side combine. Nothing here carries raw rows through a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io_util import table
from ..registry import register


@register(
    "ts_gap_fill",
    oracle="""
    WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
                    FROM events),
    days AS (SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (SELECT CAST(ts AS DATE) AS day, event_type,
                      COUNT(*) AS n, SUM(value) AS total_value
               FROM events
               GROUP BY day, event_type)
    SELECT d.day AS day, t.event_type,
           COALESCE(a.n, 0) AS n,
           ROUND(COALESCE(a.total_value, 0), 2) AS total_value
    FROM days d
    CROSS JOIN types t
    LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type
    ORDER BY d.day, t.event_type
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid per event_type with zero-filled gaps: date spine
    (sequence over min..max day) × distinct types, left-joined to the
    actual daily aggregates."""
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    days = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1")).select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("a_n"), F.sum("value").alias("a_total")
    )
    return (
        days.crossJoin(types)
        .join(actual, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("a_n"), F.lit(0)).alias("n"),
            F.round(F.coalesce(F.col("a_total"), F.lit(0.0)), 2).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "ts_funnel_stages",
    oracle="""
    WITH t1 AS (SELECT user_id,
                       MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
                FROM events GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS t_click
           FROM events e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND t1.t_signup IS NOT NULL
             AND e.ts > t1.t_signup
             AND e.ts <= t1.t_signup + INTERVAL 1 DAY
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
           FROM events e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
             AND e.ts <= t2.t_click + INTERVAL 1 DAY
           GROUP BY e.user_id)
    SELECT CASE WHEN t3.user_id IS NOT NULL THEN 'purchase'
                WHEN t2.user_id IS NOT NULL THEN 'click'
                WHEN t1.t_signup IS NOT NULL THEN 'signup'
                ELSE 'none' END AS stage,
           COUNT(*) AS n_users
    FROM t1
    LEFT JOIN t2 ON t1.user_id = t2.user_id
    LEFT JOIN t3 ON t1.user_id = t3.user_id
    GROUP BY stage
    ORDER BY stage
    """,
)
def ts_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users counted by the furthest stage
    reached, each stage's event required strictly after the previous
    stage's first event AND within 24 h of it (mere presence of the
    event type anywhere in the stream doesn't convert)."""
    ev = table(spark, sf_dir, "events")
    t1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup")
    )
    day = F.expr("INTERVAL 1 DAY")
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1.filter(F.col("t_signup").isNotNull()), "user_id")
        .filter((F.col("ts") > F.col("t_signup")) & (F.col("ts") <= F.col("t_signup") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), "purchase")
        .when(F.col("t_click").isNotNull(), "click")
        .when(F.col("t_signup").isNotNull(), "signup")
        .otherwise("none")
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


@register(
    "ts_anomaly_zscore",
    oracle="""
    WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
                   FROM events GROUP BY day, event_type),
    stats AS (SELECT day, event_type, n,
                     AVG(n)         OVER w AS mu,
                     STDDEV_SAMP(n) OVER w AS sd
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT day, event_type, n, ROUND((n - mu) / sd, 6) AS z
    FROM stats
    WHERE sd IS NOT NULL AND sd > 0 AND ROUND(ABS((n - mu) / sd), 6) > 2
    ORDER BY day, event_type
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each day's count scored
    against the mean/stddev of the PREVIOUS 7 days (current row
    excluded — the baseline must not contain the point under test),
    flagged at |z| > 2. One daily pre-aggregation then a bounded
    ROWS window per series — state is 7 rows per (event_type), which
    is what makes the same query incremental under streaming at
    100 TB/day arrival rates."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    stats = daily.select(
        "day",
        "event_type",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    # Row MEMBERSHIP is decided on the 6-dp-rounded |z| (both engines):
    # windowed mu/sd can differ by an ulp across engines, and an
    # unrounded > 2 boundary would let a knife-edge day appear in one
    # engine only — same discipline ts_changepoint_cusum applies.
    return (
        stats.filter(
            F.col("sd").isNotNull() & (F.col("sd") > 0) & (F.round(F.abs(z), 6) > 2)
        )
        .select("day", "event_type", "n", F.round(z, 6).alias("z"))
        .orderBy("day", "event_type")
    )


@register(
    "ts_retention_cohort",
    oracle="""
    WITH first_seen AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
    cohort AS (SELECT user_id, CAST(DATE_TRUNC('week', first_ts) AS DATE) AS cohort_week
               FROM first_seen),
    activity AS (SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS week
                 FROM events),
    joined AS (SELECT c.cohort_week,
                      CAST(DATE_DIFF('day', c.cohort_week, a.week) // 7 AS INTEGER)
                        AS week_offset,
                      a.user_id
               FROM activity a JOIN cohort c ON a.user_id = c.user_id),
    sizes AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM cohort GROUP BY cohort_week)
    SELECT j.cohort_week,
           j.week_offset,
           COUNT(DISTINCT j.user_id) AS n_active,
           s.n_cohort,
           ROUND(COUNT(DISTINCT j.user_id) * 1.0 / s.n_cohort, 6) AS retention
    FROM joined j JOIN sizes s ON s.cohort_week = j.cohort_week
    GROUP BY j.cohort_week, j.week_offset, s.n_cohort
    ORDER BY j.cohort_week, j.week_offset
    """,
)
def ts_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix — the canonical product-analytics
    triangle: users grouped by first-seen ISO week (their cohort), then
    for each later week the share of the cohort still active. Both
    engines truncate to Monday-start ISO weeks, so offsets are exact
    multiples of 7 days and the division is lossless.

    Spark shape: per-user MIN(ts) is one map-side-combinable hash
    aggregation; (user, week) activity is a distinct over the same
    user-keyed shuffle; the cohort join is user_id-equi (co-partitioned
    with the aggregates, no extra exchange under AQE); cohort sizes are
    a tiny frame broadcast onto the final group-by. Nothing windows over
    raw events — at 100 TB the only big shuffles are the two user-keyed
    partial aggs. Provenance: A26 session state generalized to the
    retention surface every telemetry pipeline ships."""
    e = table(spark, sf_dir, "events")
    cohort = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id", F.to_date(F.date_trunc("week", "first_ts")).alias("cohort_week")
        )
    )
    activity = e.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).distinct()
    joined = activity.join(cohort, "user_id").select(
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        "user_id",
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") * F.lit(1.0) / F.col("n_cohort"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


_EWMA_LAGS = 8  # current day + 7 trailing
_EWMA_DECAY = 0.5  # exact power of two → bit-identical weights cross-engine

_ewma_num_sql = " + ".join(
    f"{_EWMA_DECAY**i!r} * COALESCE(LAG(cnt, {i}) OVER w, 0)"
    for i in range(_EWMA_LAGS)
)
_ewma_den_sql = " + ".join(
    f"{_EWMA_DECAY**i!r} * (CASE WHEN LAG(cnt, {i}) OVER w IS NOT NULL THEN 1 ELSE 0 END)"
    for i in range(_EWMA_LAGS)
)


@register(
    "ts_ewma",
    oracle=f"""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
                   FROM events GROUP BY event_type, CAST(ts AS DATE))
    SELECT event_type, day, cnt,
           ROUND(({_ewma_num_sql}) / ({_ewma_den_sql}), 6) AS ewma
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ORDER BY event_type, day
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event counts per
    series (decay 0.5, truncated at 8 terms — by which point the tail
    weight is 2⁻⁸ ≈ 0.4%), the standard smoothing signal for
    monitoring/trend features. The recursive EWMA definition is not
    expressible as a closed-form window in either engine, so both run
    the SAME truncated form: explicit weighted lags normalized by the
    weights actually present (so the series ramps correctly at its
    start instead of biasing toward zero).

    Scale shape: one map-side-combinable daily pre-aggregation shrinks
    the stream to days×series rows; the window then holds 8 rows of
    state per series — identical to ts_anomaly_zscore's bounded-window
    discipline, never a window over raw events. Lags are ROW-based over
    observed days; compose with ts_gap_fill first if a dense calendar
    is required."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("event_type").orderBy("day")
    num = None
    den = None
    for i in range(_EWMA_LAGS):
        lag_i = F.lag("cnt", i).over(w)
        wt = F.lit(_EWMA_DECAY**i)
        n_term = wt * F.coalesce(lag_i, F.lit(0))
        d_term = wt * F.when(lag_i.isNotNull(), 1).otherwise(0)
        num = n_term if num is None else num + n_term
        den = d_term if den is None else den + d_term
    return daily.select(
        "event_type", "day", "cnt", F.round(num / den, 6).alias("ewma")
    ).orderBy("event_type", "day")



def scd2_changes(e: DataFrame) -> DataFrame:
    """Change detection underlying the SCD2 family — ONE definition for
    the history builder (ts_scd2_history) and its point-in-time
    consumer (ts_scd2_pointintime), so the dimension history the two
    ops reason about is provably the same: per user in (ts, event_id)
    order, keep rows whose event_type differs from the previous row's
    (consecutive no-op updates collapse; the first row always opens).
    Returns (user_id, valid_from, event_id, state)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.col("event_type").alias("state"),
    )


@register(
    "ts_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM changes
    ORDER BY user_id, valid_from, state
    """,
)
def ts_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history build from a CDC-style
    feed: per user, consecutive duplicate states are collapsed (no-op
    updates dropped), each surviving change opens a validity interval
    [valid_from, valid_to) closed by the next change; the open interval
    is flagged current. This is the canonical lakehouse MERGE-into-
    history pattern — vec_upsert_dedup keeps only latest-wins; this op
    keeps the full audit trail with interval semantics.

    Scale shape: both windows partition by user_id over the SAME sort
    key (ts, event_id — event_id breaks timestamp ties so the history
    is total-ordered and engine-exact), so Catalyst plans ONE shuffle +
    ONE sort and evaluates lag and lead in consecutive Window nodes
    without re-exchanging. State per partition is one row. Provenance:
    A13's upsert generalized to temporal-validity history; A26 session
    state."""
    e = table(spark, sf_dir, "events")
    changes = scd2_changes(e)
    w = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(w)
    return (
        changes.select(
            "user_id",
            "state",
            "valid_from",
            valid_to.alias("valid_to"),
            valid_to.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "state")
    )


@register(
    "ts_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                     OR LAG(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    ), per_session AS (
        SELECT user_id, session_id,
               COUNT(*)              AS n_events,
               MAX(us) - MIN(us)     AS duration_us
        FROM sess
        GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                          AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_singleton,
           CAST(MAX(n_events) AS BIGINT)                     AS longest_events,
           CAST(SUM(duration_us) AS BIGINT)                  AS active_us
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a user's events belong to one session while
    consecutive gaps stay ≤ 30 min; a larger gap opens a new session —
    the canonical clickstream operator (web analytics, retention, abuse
    detection all start here).

    Spark shape: ONE exchange on user_id feeds both same-key windows
    (lag to flag gap-breaks, running sum to number sessions) — Spark
    reuses the partitioning, so the raw stream is shuffled exactly once;
    the per-session and per-user rollups that follow are map-side
    combinable hash aggregates. Gap math is integer microseconds
    (unix_micros / epoch_us) on both engines — no float time anywhere.
    At 100 TB the cost is the one user_id exchange; state per task is
    one lag row, so no skew blowup unless a single user dominates (that
    user's window is still streamed, not materialized).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    per_session = sessionize(
        ev, key_col="user_id", ts_us_col="us", order_cols=["event_id"]
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count(F.when(F.col("n_events") == 1, 1)).alias("n_singleton"),
            F.max("n_events").alias("longest_events"),
            F.sum("duration_us").alias("active_us"),
        )
        .orderBy("user_id")
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    order_cols: list | None = None,
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Composable sessionization (api.sessionize): group `df`'s rows into
    sessions per `key_col` wherever consecutive `ts_us_col` gaps exceed
    `gap_us`; returns one row per (key, session_id) with n_events and
    duration_us. `order_cols` break timestamp ties deterministically.
    Both windows and the rollup share ONE exchange on the key."""
    order = [ts_us_col, *(order_cols or [])]
    w = W.partitionBy(key_col).orderBy(*order)
    gap = F.col(ts_us_col) - F.lag(ts_us_col).over(w)
    flagged = df.withColumn(
        "new_session", F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_us_col) - F.min(ts_us_col)).alias("duration_us"),
    )


@register(
    "ts_ohlc_bars",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts)                   AS bar_ts,
           CAST(COUNT(*) AS BIGINT)                 AS n,
           ROUND(arg_min(value, lpad((epoch_us(ts) + 72057594037927936)::VARCHAR, 18, '0')
                                || lpad(event_id::VARCHAR, 19, '0')), 2) AS open,
           ROUND(MAX(value), 2)                     AS high,
           ROUND(MIN(value), 2)                     AS low,
           ROUND(arg_max(value, lpad((epoch_us(ts) + 72057594037927936)::VARCHAR, 18, '0')
                                || lpad(event_id::VARCHAR, 19, '0')), 2) AS close
    FROM events
    WHERE CAST(ts AS DATE) < DATE '2024-01-08'
    GROUP BY event_type, date_trunc('hour', ts)
    ORDER BY event_type, bar_ts
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling per series — the standard time-series
    compaction (metrics dashboards, tick data, sensor rollups): open =
    first value in the bar, close = last, plus high/low/count. first/
    last are argument-extremes (min_by/max_by) on a zero-padded
    (epoch_us, event_id) STRING order key, so ties are deterministic and
    the whole bar is ONE map-side-combinable hash aggregate — no window,
    no sort of the raw stream, shuffle carries one row per (series,
    hour). At 100 TB this is the rollup that turns a raw firehose into
    a queryable hypertable; composing bars-of-bars (hour→day→month)
    reuses the same shape because first/last compose through argmin/max.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").cast("date") < F.lit("2024-01-08").cast("date")
    )
    # order key = zero-padded (µs, event_id) string: lexicographic order
    # equals numeric order for fixed-width non-negative digits, compares
    # identically on both engines, and has no overflow/collision window
    # (an integer µs·1e6+id key would collide whenever two same-µs events
    # have ids 1e6 apart). MICROsecond precision, not ms: both engines
    # store timestamps as exact integer µs, so unix_micros/epoch_us is
    # conversion-free — an ms key needed a µs→ms division whose rounding
    # direction differs between the engines on pre-1970 sub-ms values
    # (Spark floors, DuckDB truncates toward zero: measured -1 vs 0 at
    # '1969-12-31 23:59:59.999001'). epoch_us is offset by 2^56 (~2285
    # years) so pre-1970 timestamps stay non-negative — a bare negative
    # epoch would break the lexicographic=numeric equivalence ('-' sorts
    # below digits, larger negatives after smaller). event_id must be ≥ 0.
    okey = F.concat(
        F.lpad((F.unix_micros("ts") + F.lit(72057594037927936)).cast("string"), 18, "0"),
        F.lpad(F.col("event_id").cast("string"), 19, "0"),
    )
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bar_ts"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min_by("value", okey), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", okey), 2).alias("close"),
        )
        .orderBy("event_type", "bar_ts")
    )


def interpolate_linear(
    obs,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    trunc_unit: str = "hour",
    step: str = "INTERVAL 1 HOUR",
):
    """Composable union-spine linear interpolation
    (api.interpolate_linear): `obs` must hold one row per (key, ts) —
    pre-aggregate duplicates first. Returns (key_col, grid_ts,
    value_interp) on the regular grid [ceil_unit(min ts), max ts] per
    key; value_interp is UNROUNDED. Plan shape and parity rationale:
    ts_interpolate_linear's docstring."""
    obs = obs.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    bounds = obs.groupBy("_k").agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    trunc = F.date_trunc(trunc_unit, F.col("t0"))
    start = F.when(trunc == F.col("t0"), F.col("t0")).otherwise(
        trunc + F.expr(step)
    )
    # a key whose observations all precede the first grid point (e.g.
    # everything inside one hour, first obs off the hour) has start > t1;
    # Spark's sequence() throws on inverted bounds (DuckDB generate_series
    # returns empty), so gate it — the NULL branch explodes to no rows.
    grid = bounds.select(
        "_k",
        F.explode(
            F.when(start <= F.col("t1"), F.sequence(start, F.col("t1"), F.expr(step)))
        ).alias("gts"),
    )
    u = obs.select(
        "_k",
        "ts",
        "value",
        # obs_ts nulls WITH value: last(value, ignorenulls) skips a
        # NULL-value observation, so its timestamp must be skipped too
        # or the bracketing (pv, pt)/(nv, nt) pairs desynchronize and
        # the slope anchors at a timestamp whose value was never seen
        F.when(F.col("value").isNotNull(), F.col("ts")).alias("obs_ts"),
        F.lit(0).alias("is_grid"),
    ).unionAll(
        grid.select(
            "_k",
            F.col("gts").alias("ts"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("timestamp").alias("obs_ts"),
            F.lit(1).alias("is_grid"),
        )
    )
    back = (
        W.partitionBy("_k")
        .orderBy("ts", "is_grid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("_k")
        .orderBy("ts", "is_grid")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    w = u.select(
        "_k",
        "ts",
        "is_grid",
        F.last("value", ignorenulls=True).over(back).alias("pv"),
        F.last("obs_ts", ignorenulls=True).over(back).alias("pt"),
        F.first("value", ignorenulls=True).over(fwd).alias("nv"),
        F.first("obs_ts", ignorenulls=True).over(fwd).alias("nt"),
    )
    interp = F.when(F.col("nt").isNull(), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("ts").cast("double") - F.col("pt").cast("double"))
        / (F.col("nt").cast("double") - F.col("pt").cast("double"))
    )
    return w.filter(F.col("is_grid") == 1).select(
        F.col("_k").alias(key_col),
        F.col("ts").alias("grid_ts"),
        interp.alias("value_interp"),
    )


@register(
    "ts_interpolate_linear",
    oracle="""
    WITH obs AS (
      SELECT user_id, ts, AVG(value) AS value
      FROM events GROUP BY user_id, ts
    ), bounds AS (
      SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM obs GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             UNNEST(generate_series(
               CASE WHEN date_trunc('hour', t0) = t0 THEN t0
                    ELSE date_trunc('hour', t0) + INTERVAL 1 HOUR END,
               t1, INTERVAL 1 HOUR)) AS gts
      FROM bounds
    ), u AS (
      SELECT user_id, ts, value,
             CASE WHEN value IS NOT NULL THEN ts END AS obs_ts,
             0 AS is_grid
      FROM obs
      UNION ALL
      SELECT user_id, gts, NULL, NULL, 1 FROM grid
    ), w AS (
      SELECT user_id, ts, is_grid,
             LAST_VALUE(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_grid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(obs_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_grid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             FIRST_VALUE(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_grid
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(obs_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_grid
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM u
    )
    SELECT user_id, ts AS grid_ts,
           ROUND(CASE WHEN nt IS NULL THEN pv
                      ELSE pv + (nv - pv) * (epoch(ts) - epoch(pt))
                                / (epoch(nt) - epoch(pt))
                 END, 6) AS value_interp
    FROM w WHERE is_grid = 1
    ORDER BY user_id, grid_ts
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular value series onto an hourly grid
    by linear interpolation between the bracketing observations — the
    standard irregular→regular alignment primitive (ffill's continuous
    cousin; ts_gap_fill is the categorical/zero-fill variant).

    Spark shape: the union-spine trick — observations and grid points
    go through ONE union and ONE window pass per direction
    (last(ignorenulls) looking back, first(ignorenulls) looking
    forward), so interpolation costs two window sorts per user
    partition, never a per-grid-point range join. Duplicate timestamps
    are pre-aggregated (AVG) so the window order (ts, is_grid) is a
    total order and both engines see identical neighbor values. Grid
    points lie in [ceil_hour(min ts), max ts], so a backward and a
    forward neighbor always exist; the only NULL-next case is a grid
    point exactly at the series end, which degenerates to the endpoint
    value. At scale the window partitions by user — no global sort,
    and the grid explode is narrow (two timestamp bounds per user in,
    one row per grid point out).
    Reference provenance: none (no timeseries ops in the reference);
    SURVEY §2 Part B timeseries family.
    """
    obs = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.avg("value").alias("value"))
    )
    return (
        interpolate_linear(obs, key_col="user_id")
        .select(
            "user_id",
            "grid_ts",
            F.round("value_interp", 6).alias("value_interp"),
        )
        .orderBy("user_id", "grid_ts")
    )


@register(
    "ts_downsample_ltob",
    oracle="""
    WITH pts AS (
      SELECT event_type, ts, event_id, value,
             NTILE(40) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS bucket
      FROM events
    ), tri AS (
      SELECT event_type, bucket, ts, event_id, value,
             ABS( (EPOCH_US(LAG(ts)  OVER w) - EPOCH_US(LEAD(ts) OVER w))
                    * (value - LAG(value) OVER w)
                - (EPOCH_US(LAG(ts)  OVER w) - EPOCH_US(ts))
                    * (LEAD(value) OVER w - LAG(value) OVER w) ) AS area2
      FROM pts
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), picked AS (
      SELECT event_type, bucket, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY area2 DESC NULLS LAST, ts, event_id)
               AS rn
      FROM tri
    )
    SELECT event_type, bucket, ts, event_id, ROUND(value, 6) AS val_r
    FROM picked
    WHERE rn = 1
    ORDER BY event_type, bucket
    """,
)
def ts_downsample_ltob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-One-Bucket downsampling (Steinarsson 2013 — the
    chart-rendering reduction): each event_type's series is cut into 40
    equal-count buckets and each bucket keeps the single point forming
    the largest triangle with its immediate neighbors — the point whose
    removal would deform the line most. 40 points out per series
    regardless of input length.

    LTOB rather than LTTB deliberately: LTTB's triangle uses the
    PREVIOUSLY SELECTED point, a sequential dependency that cannot be
    a window expression (it would need applyInPandas per series); LTOB
    is lag/lead-local, so the whole operator is two window passes over
    the same (event_type | ts, event_id) sort order — ntile and the
    neighbor triangle share one exchange, the bucket argmax adds a
    partial WindowGroupLimit. Area is the doubled unsigned triangle
    area in (epoch-µs × value) units, written with IDENTICAL operation
    order on both engines (products of small differences — exact
    integer µs deltas times value deltas — so the doubles agree
    bit-for-bit); series endpoints have NULL neighbors → NULL area →
    sort last, so an endpoint is kept only when its bucket holds
    nothing else. Ties break on (ts, event_id) — the fixture's shared
    millisecond timestamps make a bare ts tie-break nondeterministic
    (ts_ohlc_bars lesson).

    At 100 TB: one shuffle per series partition (event_type), both
    windows ride it; no cross-series traffic, buckets never
    materialize more than their own rows.
    Reference provenance: none; SURVEY §2 Part B timeseries family
    (round 4) — the read-side reduction every dashboard on top of this
    engine runs.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    pts = ev.select(
        "event_type", "ts", "event_id", "value", F.ntile(40).over(w).alias("bucket")
    )
    x = F.unix_micros(F.col("ts")).cast("double")
    x_prev = F.unix_micros(F.lag("ts").over(w)).cast("double")
    x_next = F.unix_micros(F.lead("ts").over(w)).cast("double")
    tri = pts.select(
        "event_type",
        "bucket",
        "ts",
        "event_id",
        "value",
        F.abs(
            (x_prev - x_next) * (F.col("value") - F.lag("value").over(w))
            - (x_prev - x) * (F.lead("value").over(w) - F.lag("value").over(w))
        ).alias("area2"),
    )
    pick = W.partitionBy("event_type", "bucket").orderBy(
        F.col("area2").desc_nulls_last(), "ts", "event_id"
    )
    return (
        tri.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", "bucket", "ts", "event_id", F.round("value", 6).alias("val_r")
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "ts_changepoint_cusum",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.ts, e.event_id,
             CASE WHEN s.sigma > 0 THEN (e.value - s.mu) / s.sigma
                  ELSE 0.0 END AS z
      FROM events e JOIN stats s USING (event_type)
    ), cusum AS (
      SELECT event_type, ts, event_id,
             SUM(z) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS s
      FROM dev
    )
    SELECT event_type, ts, event_id, ROUND(s, 6) AS cusum_r,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY ROUND(ABS(s), 6) DESC, ts, event_id)
                      AS rn
          FROM cusum)
    WHERE rn <= 3
    ORDER BY event_type, rank
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954): per series, standardize
    each value against the series mean/stddev and accumulate the
    deviations in time order — where |CUSUM| peaks is where the mean
    most plausibly shifted. Emits the top-3 candidate points per
    event_type.

    Shape: one per-series aggregation for (μ, σ) broadcast back onto
    the stream, then ONE per-series window sort shared by the running
    sum and the peak-rank (same (event_type | ts, event_id) order;
    ranking partitions by the same key, so no second exchange), with
    WindowGroupLimit pruning the rank. The running sum is sequential
    per series — the one genuinely order-dependent float in the engine;
    both ranks and values compare on 6-dp rounds so the engines'
    different accumulation trees (Spark running-frame vs DuckDB
    segment tree) agree (same tolerance argument as win_running_sum).
    At 100 TB: series partition by key, no cross-series traffic; a
    single series too long for one task is the documented limit (the
    standard fix — chunked prefix-sum scan — is not needed at any
    realistic per-key cardinality).
    Reference provenance: none; SURVEY §2 Part B timeseries family
    (round 4) — the drift monitor a curation pipeline points at its
    own quality metrics.
    """
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    dev = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        # σ>0 guard (ts_anomaly_zscore's discipline): a constant series
        # has no changepoint — z pins to 0 rather than riding DuckDB
        # 1.0's NULL-on-float-div-by-zero quirk, which flips to ±inf on
        # DuckDB ≥ 1.1 and would break parity for that input class
        F.when(
            F.col("sigma") > 0, (F.col("value") - F.col("mu")) / F.col("sigma")
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cusum = dev.select(
        "event_type", "ts", "event_id", F.sum("z").over(w).alias("s")
    )
    rank_w = W.partitionBy("event_type").orderBy(
        F.round(F.abs(F.col("s")), 6).desc(), "ts", "event_id"
    )
    return (
        cusum.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "ts", "event_id", F.round("s", 6).alias("cusum_r"), "rank")
        .orderBy("event_type", "rank")
    )


@register(
    "ts_cdc_apply",
    oracle="""
    WITH changes AS (
      SELECT user_id,
             ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value
      FROM events
    ), latest AS (
      SELECT user_id, op, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_changes
      FROM changes
    )
    SELECT user_id, ROUND(value, 6) AS final_value, n_changes
    FROM latest
    WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
    """,
)
def ts_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC (change-data-capture) apply — the read-side materialization
    of a change stream into current table state, with DELETE
    tombstones: each event is an upsert of (user_id → value) unless it
    is an 'error' event, which acts as a delete of that key. A key's
    final state is its LATEST change by (ts, event_id); keys whose
    latest change is a tombstone vanish from the result.

    This is one level past vec_upsert_dedup (latest-wins without
    deletes) and the read-side dual of vec_upsert_merge (write-side
    MERGE): together the three cover the ingest surface a Delta/Hudi
    CDF consumer needs. Shape: one window over (user_id | seq desc)
    shared by the latest-pick and the change count (same partition
    key, one exchange) — the change-count window needs every row, so
    the rank filter prunes after it, not below it — shuffle volume is
    the change stream, state is one row per key. At 100 TB the same plan applies partition-wise;
    compaction of the applied state is scan_files_compaction's job.
    Reference provenance: A13's upsert loop (SURVEY §4.1) — the delete
    path its Pinecone calls have but the reference never exercises.
    """
    ev = table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    wc = W.partitionBy("user_id")
    latest = changes.select(
        "user_id",
        "op",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_changes"),
    )
    return (
        latest.filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", F.round("value", 6).alias("final_value"), "n_changes")
        .orderBy("user_id")
    )


@register(
    "ts_seasonal_profile",
    oracle="""
    WITH base AS (
      SELECT event_type, EXTRACT(HOUR FROM ts) AS hod, value
      FROM events
    ), hourly AS (
      SELECT event_type, hod,
             COUNT(*) AS n_events,
             SUM(value) AS s
      FROM base GROUP BY event_type, hod
    ), totals AS (
      SELECT event_type,
             SUM(s) / SUM(n_events) AS overall_mean
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, CAST(h.hod AS INT) AS hour_of_day,
           CAST(h.n_events AS BIGINT) AS n_events,
           ROUND(h.s / h.n_events, 6) AS seasonal_mean,
           ROUND((h.s / h.n_events) / t.overall_mean, 6) AS seasonal_index
    FROM hourly h JOIN totals t USING (event_type)
    ORDER BY event_type, hour_of_day
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type: mean value and the
    seasonal index (hourly mean / overall mean — >1 = above-baseline
    hour), the decomposition table consumed by every
    deseasonalized-anomaly check (ts_anomaly_zscore's residual step
    assumes exactly this baseline) and by load-aware schedulers.

    Shape: one scan → hour-of-day hash agg carrying (count, sum) — one
    row per (type, hour) ≤ 24·|types|, map-side combinable — then the
    per-type overall mean derived FROM THE PROFILE (a second
    telescoping agg over ≤24 rows per type, never a second scan of the
    raw events) and a broadcast join back. The overall mean must be
    the event-weighted mean Σs/Σn — averaging the 24 hourly means
    would weight empty hours equally and skew every index. At 100 TB:
    the only exchange over data is the first agg's, and its output is
    bounded by the key space, not the row count.
    Reference provenance: none; SURVEY §2 B.11 timeseries family
    (round 4).
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("s"),
    )
    totals = hourly.groupBy("event_type").agg(
        (F.sum("s") / F.sum("n_events")).alias("overall_mean")
    )
    return (
        hourly.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            F.col("hod").cast("int").alias("hour_of_day"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.col("s") / F.col("n_events"), 6).alias("seasonal_mean"),
            F.round((F.col("s") / F.col("n_events")) / F.col("overall_mean"), 6).alias(
                "seasonal_index"
            ),
        )
        .orderBy("event_type", "hour_of_day")
    )


@register(
    "ts_scd2_pointintime",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    hist AS (
      SELECT user_id, ts AS valid_from, event_id, event_type AS state
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    u AS (
      SELECT user_id, valid_from AS ts, 0 AS kind, event_id, state, valid_from
      FROM hist
      UNION ALL
      SELECT user_id, ts, 1 AS kind, event_id, NULL, NULL FROM events
    ),
    eff AS (
      SELECT user_id, ts, kind, event_id,
             LAST_VALUE(state IGNORE NULLS) OVER w      AS state_at,
             LAST_VALUE(valid_from IGNORE NULLS) OVER w AS state_since
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts, state_at, state_since
    FROM eff
    WHERE kind = 1
    ORDER BY user_id, ts, event_id
    """,
)
def ts_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 dimension history — "what
    state was this user in when this event happened", the temporal-join
    every fact-to-dimension pipeline needs once history is kept
    (ts_scd2_history builds it; this op CONSUMES it).

    Deliberately NOT an interval join: the naive form equi-joins facts
    to history on user_id and filters valid_from ≤ ts < valid_to —
    join-group size |facts_u|×|states_u| per user, and the range
    residual can't prune the build side. The scale-right decomposition
    is union + ordered window: state-open rows (kind 0) and fact rows
    (kind 1) interleave on one (ts, kind, event_id) sort per user, and
    `last(state, ignorenulls=True)` carries the in-effect state onto
    every fact row — ONE shuffle of the union, state per partition one
    row, no join at all. kind sorts state-opens before facts at equal
    ts, so a fact that IS the change event sees the new state
    (valid_from ≤ ts inclusive — matching ts_scd2_history's interval
    semantics); event_id completes the total order so both engines
    resolve ties identically. The history build's lag window rides the
    SAME user_id partitioning, so Catalyst reuses one exchange across
    the whole plan. ROWS framing is explicit on both engines — the
    default RANGE frame would merge tied sort keys and leak states
    backward.
    Reference provenance: A13 upsert + A26 session state, composed;
    the standard "AS OF" read the lakehouse MERGE story requires.
    """
    e = table(spark, sf_dir, "events")
    hist = scd2_changes(e)
    u = hist.select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.lit(0).alias("kind"),
        "event_id",
        "state",
        "valid_from",
    ).unionAll(
        e.select(
            "user_id",
            "ts",
            F.lit(1).alias("kind"),
            "event_id",
            F.lit(None).cast("string").alias("state"),
            F.lit(None).cast("timestamp").alias("valid_from"),
        )
    )
    weff = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    eff = u.select(
        "user_id",
        "ts",
        "kind",
        "event_id",
        F.last("state", ignorenulls=True).over(weff).alias("state_at"),
        F.last("valid_from", ignorenulls=True).over(weff).alias("state_since"),
    )
    return (
        eff.filter(F.col("kind") == 1)
        .select("user_id", "event_id", "ts", "state_at", "state_since")
        .orderBy("user_id", "ts", "event_id")
    )


_ATTR_LOOKBACK_US = 7 * 86400 * 1_000_000  # 7-day last-touch window


@register(
    "ts_attribution_lasttouch",
    oracle=f"""
    WITH tl AS (
      SELECT event_id, user_id, ts, event_type, value,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'click' THEN EPOCH_US(ts) END AS click_us
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    attr AS (
      SELECT event_id, user_id, ts, event_type, value,
             LAST_VALUE(click_id IGNORE NULLS) OVER w AS a_click,
             LAST_VALUE(click_us IGNORE NULLS) OVER w AS a_us
      FROM tl
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           ROUND(value, 2) AS revenue,
           CASE WHEN EPOCH_US(ts) - a_us <= {_ATTR_LOOKBACK_US}
                THEN a_click END AS attr_click_id,
           CASE WHEN EPOCH_US(ts) - a_us <= {_ATTR_LOOKBACK_US}
                THEN (EPOCH_US(ts) - a_us) // 1000000 END AS gap_s
    FROM attr WHERE event_type = 'purchase'
    ORDER BY purchase_id
    """,
)
def ts_attribution_lasttouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the same user's most recent click, provided it happened within the
    7-day lookback; purchases with no qualifying click stay
    unattributed (NULL id/gap). The analytics join behind every
    conversion report.

    Deliberately NOT an as-of join (join_asof_nearest is the join-shaped
    sibling): clicks and purchases interleave on ONE (ts, event_id)
    sort per user and `last(click, ignorenulls=True)` carries the
    latest click onto every purchase row — single shuffle of the
    filtered union, no join, no per-user join-group blowup when a bot
    user has 10^6 clicks (the same decomposition argument as
    ts_scd2_pointintime:1052). The lookback gate compares EXACT
    microsecond integers (unix_micros / EPOCH_US), so the
    attributed-or-null decision is bit-identical cross-engine; gap_s is
    the integer-truncated second difference. ROWS framing explicit —
    RANGE would merge tied timestamps and let a same-instant click
    attribute through id order both engines resolve identically. At
    100 TB: one hash exchange on user_id, window state = one row.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    tl = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.when(is_click, F.col("event_id")).alias("click_id"),
        F.when(is_click, F.unix_micros("ts")).alias("click_us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    attr = tl.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last("click_id", ignorenulls=True).over(w).alias("a_click"),
        F.last("click_us", ignorenulls=True).over(w).alias("a_us"),
    )
    gap_us = F.unix_micros("ts") - F.col("a_us")
    within = gap_us <= F.lit(_ATTR_LOOKBACK_US)
    return (
        attr.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.round("value", 2).alias("revenue"),
            F.when(within, F.col("a_click")).alias("attr_click_id"),
            F.when(within, F.floor(gap_us / F.lit(1_000_000)).cast("long")).alias(
                "gap_s"
            ),
        )
        .orderBy("purchase_id")
    )


# Holt's linear-trend one-step-ahead forecast as FIXED impulse weights:
# the recursion l_t = a·y_t + (1-a)(l_{t-1}+b_{t-1}),
# b_t = β(l_t-l_{t-1}) + (1-β)b_{t-1}, f = l_t + b_t is linear and
# time-invariant, so the forecast is exactly Σ_k w_k·y_{t-k} with w_k
# the impulse response — computed ONCE here and embedded as repr()
# literals in both engines (shortest-round-trip float text parses to
# the identical double on both sides, the ts_ewma discipline). K=10
# truncation drops ~5% absolute weight mass — a documented, identical
# truncation on both engines, so oracle parity stays exact; rows
# without a full K-lag history are excluded rather than ramp-corrected
# (the ramp-state coefficients are t-dependent, unlike ts_ewma's).
_HOLT_ALPHA, _HOLT_BETA, _HOLT_K = 0.5, 0.3, 10


def _holt_weights() -> list[float]:
    n = 3 * _HOLT_K
    out = []
    for k in range(_HOLT_K):
        level = trend = 0.0
        for t in range(n):
            y = 1.0 if t == n - 1 - k else 0.0
            nl = _HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (level + trend)
            trend = _HOLT_BETA * (nl - level) + (1 - _HOLT_BETA) * trend
            level = nl
        out.append(level + trend)
    return out


_HOLT_W = _holt_weights()
# ::DOUBLE — a bare decimal literal is DECIMAL in DuckDB, and a
# DECIMAL-typed dot product ROUNDs to Decimal cells (the r01 lesson);
# the cast text still parses to the bit-identical double
_holt_sql = " + ".join(
    f"{w!r}::DOUBLE * LAG(cnt, {i}) OVER w" for i, w in enumerate(_HOLT_W)
)


@register(
    "ts_holt_forecast",
    oracle=f"""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
                   FROM events GROUP BY event_type, CAST(ts AS DATE)),
    numbered AS (
      SELECT event_type, day, cnt,
             ROW_NUMBER() OVER w AS rn,
             {_holt_sql} AS forecast
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
           ROUND(forecast, 6) AS next_day_forecast
    FROM numbered
    WHERE rn >= {_HOLT_K}
    ORDER BY event_type, day
    """,
)
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double-exponential) one-step-ahead forecast
    of daily event counts per series — the level+trend smoother
    telemetry forecasting uses where ts_ewma's level-only smoothing
    lags a trending series. Expressed as a FIXED K=10 lag-weight dot
    product (see _holt_weights above): the recursion is linear
    time-invariant, so its impulse response is exact per lag, both
    engines evaluate the identical left-associated literal expression,
    and the whole op is one bounded ROWS window — O(K) state per row,
    no recursion state to carry, no per-row Python.

    Scale shape: daily pre-aggregation (map-side combinable) shrinks
    events to O(series × days) rows BEFORE the window; the lag window
    partitions on event_type — bounded frames only, the
    unpartitioned-window ban holds. Rows with fewer than K-1 prior
    observations are excluded (ramp coefficients are t-dependent;
    truncating the ramp identically on both engines would silently
    bless a biased warm-up — exclusion is the honest contract).
    Reference provenance: none; SURVEY §2 Part B time-series family
    (round 8) — trend-aware forecasting over the monitoring surface.
    """
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    forecast = None
    for i, wt in enumerate(_HOLT_W):
        term = F.lit(wt) * F.lag("cnt", i).over(w)
        forecast = term if forecast is None else forecast + term
    return (
        daily.select(
            "event_type",
            "day",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.row_number().over(w).alias("rn"),
            F.round(forecast, 6).alias("next_day_forecast"),
        )
        .filter(F.col("rn") >= _HOLT_K)
        .drop("rn")
        .orderBy("event_type", "day")
    )


@register(
    "ts_dow_anomaly",
    oracle="""
    WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
                   FROM events GROUP BY day, event_type),
    stats AS (SELECT day, event_type, n,
                     CAST(ISODOW(day) AS INTEGER) AS iso_dow,
                     AVG(n)         OVER w AS mu,
                     STDDEV_SAMP(n) OVER w AS sd,
                     COUNT(*)       OVER w AS n_hist
              FROM daily
              WINDOW w AS (PARTITION BY event_type, ISODOW(day)
                           ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
    SELECT day, event_type, iso_dow, CAST(n AS BIGINT) AS n,
           ROUND(mu, 6) AS dow_baseline,
           ROUND((n - mu) / NULLIF(sd, 0), 6) AS z,
           (ROUND(ABS((n - mu) / NULLIF(sd, 0)), 6) > 1.5) AS is_anomaly
    FROM stats
    WHERE n_hist = 3
    ORDER BY event_type, day
    """,
)
def ts_dow_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week-adjusted anomaly scoring: each day's count is
    z-scored against the trailing 3 observations of the SAME weekday
    for that series — the seasonality-aware variant ts_anomaly_zscore's
    flat trailing window cannot express (a quiet Sunday is normal FOR
    SUNDAYS; scoring it against a Mon-Sat baseline flags weekends
    forever). Partitioning the window by (event_type, ISO dow) IS the
    seasonal adjustment — no decomposition pass, no model state beyond
    3 rows per (series, weekday).

    Emits every fully-baselined day with its weekday baseline, z, and
    the 6-dp-rounded |z| > 1.5 flag (rounded MEMBERSHIP on both
    engines — the ts_anomaly_zscore ulp discipline; zero-variance
    baselines yield NULL z via NULLIF, never a division error).
    Scale shape: daily pre-agg map-side, then one bounded ROWS window
    on a (series × 7)-key partitioning — finer, hence better spread,
    than the flat anomaly window.
    Reference provenance: none; SURVEY §2 Part B time-series family
    (round 8) — composes the date_calendar_dim weekday semantics into
    the monitoring surface.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("iso_dow", (F.weekday("day") + F.lit(1)).cast("int"))
    )
    w = (
        W.partitionBy("event_type", "iso_dow")
        .orderBy("day")
        .rowsBetween(-3, -1)
    )
    stats = daily.select(
        "day",
        "event_type",
        "iso_dow",
        F.col("n").cast("bigint").alias("n"),
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    z = (F.col("n") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0))
    return (
        stats.filter(F.col("n_hist") == 3)
        .select(
            "day",
            "event_type",
            "iso_dow",
            "n",
            F.round("mu", 6).alias("dow_baseline"),
            F.round(z, 6).alias("z"),
            (F.round(F.abs(z), 6) > 1.5).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "ts_forecast_backtest",
    oracle=f"""
    -- rolling-origin backtest of the Holt forecast: at every day with
    -- full lag history, the K-weight dot product over days t-1..t-K
    -- (shifted one step back from ts_holt_forecast's frame) predicts
    -- day t; the error aggregates per series. Same literals, shifted
    -- lags — the backtest never peeks at the day it scores.
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
                   FROM events GROUP BY event_type, CAST(ts AS DATE)),
    numbered AS (
      SELECT event_type, day, cnt,
             ROW_NUMBER() OVER w AS rn,
             {" + ".join(f"{w!r}::DOUBLE * LAG(cnt, {i + 1}) OVER w" for i, w in enumerate(_HOLT_W))} AS forecast
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), scored AS (
      SELECT event_type, cnt, forecast
      FROM numbered WHERE rn >= {_HOLT_K + 1}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                     AS n_scored,
           ROUND(AVG(ABS(cnt - forecast)), 6)           AS mae,
           ROUND(AVG(ABS(cnt - forecast)
                 / NULLIF(cnt, 0)) * 100, 6)            AS mape_pct,
           ROUND(AVG(cnt - forecast), 6)                AS bias
    FROM scored
    GROUP BY event_type ORDER BY event_type
    """,
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of ts_holt_forecast — forecasting
    evaluated as an OPERATOR, not a notebook ritual: at every day with
    full history, the same K-weight Holt dot product (shifted one lag
    back, so the scored day is never inside its own forecast window)
    predicts the day's count, and the residuals aggregate to per-series
    MAE / MAPE / signed bias — bias is the number that catches a
    systematically trend-lagging model that MAE alone hides. Identical
    literals as ts_holt_forecast, shifted frames; every row of the
    backtest is deterministic on both engines.

    Scale shape: same as the forecaster — daily pre-agg, one bounded
    per-series ROWS window, then a per-series rollup; backtesting N
    days costs ONE window pass, not N model refits (the fixed-weight
    reduction is what buys this).
    Reference provenance: none; SURVEY §2 Part B time-series family
    (round 8) — the evaluation half of the forecasting story.
    """
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    forecast = None
    for i, wt in enumerate(_HOLT_W):
        term = F.lit(wt) * F.lag("cnt", i + 1).over(w)
        forecast = term if forecast is None else forecast + term
    scored = (
        daily.select(
            "event_type",
            "cnt",
            F.row_number().over(w).alias("rn"),
            forecast.alias("forecast"),
        )
        .filter(F.col("rn") >= _HOLT_K + 1)
    )
    err = F.col("cnt") - F.col("forecast")
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.round(F.avg(F.abs(err)), 6).alias("mae"),
            F.round(
                F.avg(F.abs(err) / F.nullif(F.col("cnt"), F.lit(0))) * 100, 6
            ).alias("mape_pct"),
            F.round(F.avg(err), 6).alias("bias"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_stl_decompose",
    oracle="""
    -- additive STL-lite replay: daily means per type, trend = centered
    -- 7-day moving average (ROWS frame, partial at the edges — both
    -- engines average over PRESENT rows), seasonal = mean detrended
    -- per weekday (0=Monday on both sides: DuckDB isodow-1, Spark
    -- weekday()), residual = y - trend - seasonal.
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             ISODOW(ts) - 1 AS dow,
             SUM(value) / COUNT(*) AS y
      FROM events GROUP BY 1, 2, 3
    ), trended AS (
      SELECT *,
             AVG(y) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend
      FROM daily
    ), seasonal AS (
      SELECT event_type, dow, AVG(y - trend) AS s
      FROM trended GROUP BY event_type, dow
    )
    SELECT t.event_type,
           CAST(t.dow AS INT)                                  AS dow,
           COUNT(*)                                            AS n_days,
           ROUND(MIN(se.s), 6)                                 AS seasonal,
           ROUND(SQRT(AVG(POWER(t.y - t.trend - se.s, 2))), 4) AS resid_rmse
    FROM trended t JOIN seasonal se USING (event_type, dow)
    GROUP BY t.event_type, t.dow
    ORDER BY t.event_type, t.dow
    """,
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-lite decomposition of each event type's daily
    series — trend (centered 7-day moving average), weekly seasonal
    (mean detrended value per weekday), residual (what anomaly
    detection should actually score; feeding raw values into a z-score
    flags every Saturday): the classic decomposition every
    training-data freshness/drift dashboard runs before alerting.
    Generalizes ts_seasonal_profile (level-only hour-of-day indices)
    and ts_dow_anomaly (window-frame adjustment) into the explicit
    three-component model; loess is replaced by the moving average —
    the standard scalable simplification, keeping every step a
    windowed/grouped aggregate.

    Output per (event_type, weekday): the seasonal component and the
    residual RMSE — a seasonal row far from 0 means real weekly
    structure; a large RMSE flags a type whose variance the model
    does not explain.

    Scale shape: ONE scan → (type, day) hash agg (output bounded by
    the key space, not rows), then two partition-bounded windows — the
    7-row ROWS-frame trend per type and the unbounded per-(type,
    weekday) seasonal mean — and the final tiny groupBy; no join, no
    second scan, no global sort. Weekday convention pinned to
    0=Monday on BOTH engines (Spark weekday() / DuckDB isodow-1) —
    dayofweek() would silently disagree across engines.
    Reference provenance: none; SURVEY §2 B.11 timeseries family
    (round 9); public recipe = classical seasonal decomposition
    (Cleveland STL, MA-trend variant).
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.expr("weekday(ts)").alias("dow"),
        )
        .agg((F.sum("value") / F.count(F.lit(1))).alias("y"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    # seasonal as a SECOND window (unbounded over (type, dow)) instead
    # of an aggregate + self-join back: one events scan total — the
    # join form re-computes the daily agg subtree on both sides (plan
    # gate in tests/test_plans.py pins the single scan)
    w2 = W.partitionBy("event_type", "dow")
    dec = daily.withColumn("trend", F.avg("y").over(w)).withColumn(
        "s", F.avg(F.col("y") - F.col("trend")).over(w2)
    )
    return (
        dec.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.min("s"), 6).alias("seasonal"),
            F.round(
                F.sqrt(
                    F.avg(
                        F.pow(
                            F.col("y") - F.col("trend") - F.col("s"),
                            F.lit(2),
                        )
                    )
                ),
                4,
            ).alias("resid_rmse"),
        )
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            "seasonal",
            "resid_rmse",
        )
        .orderBy("event_type", "dow")
    )
