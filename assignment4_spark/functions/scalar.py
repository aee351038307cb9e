"""Scalar function surface: string/regex/date/math/conditional/array/map
(SURVEY.md §2 B.7).

Direct generalizations of reference behaviors: title[:50]/content[:200]
truncation (parser_pinecone_storage.py:149-153), the ArXiv abstract
regex (ra/agent.py:84-88), default-on-missing (ra/agent.py:89),
token splitting for chunking (A9), vector math over array<float> (A18),
metadata maps (A12).

All functions here are JVM expressions inside whole-stage codegen — no
Python in the row path, which is what keeps them viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register


@register(
    "str_funcs",
    oracle="""
    SELECT c_custkey,
           SUBSTRING(c_name, 1, 50)                 AS title50,
           LOWER(c_name)                            AS lname,
           UPPER(c_mktsegment)                      AS useg,
           TRIM('  ' || c_name || ' ')              AS trimmed,
           LENGTH(c_name)                           AS name_len,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           CONCAT_WS('|', c_name, c_mktsegment)     AS joined
    FROM customer
    WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface incl. the reference's substring(x,1,50) truncation."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 50).alias("title50"),
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
    ).orderBy("c_custkey")


@register(
    "str_regexp",
    oracle="""
    SELECT doc_id,
           REGEXP_EXTRACT(text, '^(\\w+)', 1)                    AS first_word,
           REGEXP_EXTRACT(text, '(spark|hash|join)', 1)          AS first_kw,
           LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g'))      AS no_vowel_len
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction with empty-string-on-miss — the ArXiv abstract
    scrape pattern (ra/agent.py:84-88). Spark and DuckDB both return ''
    when the pattern misses."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("text", r"(spark|hash|join)", 1).alias("first_kw"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("no_vowel_len"),
    ).orderBy("doc_id")


@register(
    "str_split_tokens",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' '))     AS n_tokens,
           STRING_SPLIT(text, ' ')[1]       AS first_token,
           STRING_SPLIT(text, ' ')[-1]      AS last_token
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def str_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization substrate for chunking/embedding (A9)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    ).orderBy("doc_id")


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER)        AS yr,
           CAST(MONTH(o_orderdate) AS INTEGER)       AS mo,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS eom
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day("o_orderdate").alias("eom"),
    ).orderBy("o_orderkey")


@register(
    "math_funcs",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice, 1)                     AS r1,
           ABS(p_retailprice - 1000)                   AS dist_1000,
           CAST(CEIL(p_retailprice) AS BIGINT)         AS c,
           CAST(FLOOR(p_retailprice) AS BIGINT)        AS f,
           ROUND(POW(p_retailprice, 0.5), 6)           AS root,
           ROUND(LN(p_retailprice + 1), 6)             AS log_price,
           ROUND(SQRT(CAST(p_size AS DOUBLE)), 6)      AS size_root,
           MOD(p_partkey, 7)                           AS bucket
    FROM part
    ORDER BY p_partkey
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface. pow/ln are libm-dependent (JVM vs C can differ in the
    last ulp) → rounded to 6dp; abs/ceil/floor/mod are exact."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("r1"),
        F.abs(F.col("p_retailprice") - 1000).alias("dist_1000"),
        F.ceil("p_retailprice").alias("c"),
        F.floor("p_retailprice").alias("f"),
        F.round(F.pow("p_retailprice", F.lit(0.5)), 6).alias("root"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_root"),
        (F.col("p_partkey") % 7).alias("bucket"),
    ).orderBy("p_partkey")


@register(
    "cond_case_coalesce",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END                         AS tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
           IF(c_acctbal > 5000, 1, 0)                   AS is_rich
    FROM customer
    ORDER BY c_custkey
    """,
)
def cond_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE tiers + coalesce/nullif — the reference's default-on-missing
    ('Abstract not found.', ra/agent.py:89)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("N/A")).alias(
            "seg_or_na"
        ),
        F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("is_rich"),
    ).orderBy("c_custkey")


@register(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))        AS n_unique_tokens,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark')    AS has_spark,
           ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:3], ' ')  AS first3,
           LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1] AS min_token
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias("min_token"),
    ).orderBy("doc_id")


@register(
    "array_higher_order",
    oracle="""
    SELECT vec_id,
           ROUND(SQRT(LIST_AGGREGATE(LIST_TRANSFORM(embedding::DOUBLE[], x -> x * x), 'sum')), 6)
             AS l2_norm,
           ROUND(LIST_AGGREGATE(embedding::DOUBLE[], 'sum'), 6)  AS comp_sum,
           LEN(LIST_FILTER(embedding::DOUBLE[], x -> x > 0))     AS n_positive
    FROM embeddings
    WHERE vec_id < 200
    ORDER BY vec_id
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/aggregate over embedding vectors — the engine's
    native (no-UDF) vector math substrate (A18). Floats are widened to
    double BEFORE arithmetic on both sides so the sequential fold is
    bit-compatible."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x * x)), 6
        ).alias("l2_norm"),
        F.round(F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x), 6).alias("comp_sum"),
        F.size(F.filter(dvec, lambda x: x > 0)).alias("n_positive"),
    ).orderBy("vec_id")


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_from_map,
           event_type                                         AS type_from_map,
           2                                                  AS map_size
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a metadata map (reference A12's Pinecone metadata dict) and
    read it back via element_at; the oracle computes the same values
    directly (DuckDB's MAP type isn't needed for parity)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k"),
        F.lit("type"),
        F.col("event_type"),
    )
    return ev.select(
        "event_id",
        # try_cast (the cond_try_cast rule): one poisoned props value
        # must degrade to NULL, not kill the stage under ANSI mode
        F.element_at(m, "k").try_cast("int").alias("k_from_map"),
        F.element_at(m, "type").alias("type_from_map"),
        F.size(m).alias("map_size"),
    ).orderBy("event_id")


@register(
    "cond_try_cast",
    oracle="""
    WITH dirty AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN CAST(value AS VARCHAR)
                  WHEN event_id % 3 = 1 THEN event_type
                  ELSE CAST(value AS VARCHAR) || 'x' END AS raw
      FROM events
    )
    SELECT COUNT(*)                                          AS n_rows,
           COUNT(TRY_CAST(raw AS DOUBLE))                    AS n_parsed,
           COUNT(*) - COUNT(TRY_CAST(raw AS DOUBLE))         AS n_rejected,
           ROUND(SUM(COALESCE(TRY_CAST(raw AS DOUBLE), 0)), 6) AS sum_parsed
    FROM dirty
    """,
)
def cond_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe casting over a dirty feed: TRY_CAST turns unparseable
    strings into NULL instead of failing the job — the error-tolerant
    ingestion primitive (A28's per-item error isolation as an
    EXPRESSION, not a try/except loop). A deterministically dirty
    column (numeric / word / malformed, by event_id mod 3) is built
    identically on both engines, so the parse-accept and parse-reject
    sets — not just counts — are pinned by the value hash.

    At 100 TB this is the difference between one poisoned row killing a
    stage under ANSI mode and the row degrading to NULL inside codegen;
    pair with a `WHERE parsed IS NULL` side-channel to quarantine
    rejects (scan_permissive_corrupt is the source-level twin)."""
    e = table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 3 == 0, F.col("value").cast("string"))
        .when(F.col("event_id") % 3 == 1, F.col("event_type"))
        .otherwise(F.concat(F.col("value").cast("string"), F.lit("x")))
    )
    parsed = F.expr("try_cast(raw AS double)")
    return (
        e.select(F.col("event_id"), raw.alias("raw"))
        .select("raw", parsed.alias("parsed"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("parsed").alias("n_parsed"),
            (F.count(F.lit(1)) - F.count("parsed")).alias("n_rejected"),
            F.round(F.sum(F.coalesce("parsed", F.lit(0.0))), 6).alias("sum_parsed"),
        )
    )


@register(
    "date_calendar_dim",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      FROM events
    ), spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT s.day,
           CAST(QUARTER(s.day) AS INTEGER)      AS quarter,
           CAST(WEEK(s.day) AS INTEGER)         AS iso_week,
           CAST(ISODOW(s.day) AS INTEGER)       AS iso_dow,
           (ISODOW(s.day) >= 6)                 AS is_weekend,
           CAST(DAY(LAST_DAY(s.day)) AS INTEGER) AS days_in_month,
           CAST(COALESCE(d.n, 0) AS BIGINT)     AS n_events
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY s.day
    """,
)
def date_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension build — the date spine + attributes every
    warehouse model needs (quarter, ISO week, ISO day-of-week, weekend
    flag, month length) over the events table's date range, left-joined
    to per-day event counts with zero fill. ISO day-of-week is the one
    cross-engine trap: Spark's dayofweek() is 1=Sunday while DuckDB's
    dayofweek() is 0=Sunday — both sides use the ISO form instead
    (Spark weekday()+1, DuckDB ISODOW; Monday=1) so the semantics are
    pinned, not coincidental.

    Scale shape: the spine is a generated sequence from ONE 2-column
    aggregate (days, not data — a century is ~36.5k rows); the daily
    counts pre-aggregate map-side before the broadcast-sized join.
    Reference provenance: none; SURVEY §2 Part B scalar/date family
    (round 8) — the dimension-table build feeding every ts_* rollup.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    iso_dow = F.weekday("day") + F.lit(1)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.quarter("day").alias("quarter"),
            F.weekofyear("day").alias("iso_week"),
            iso_dow.cast("int").alias("iso_dow"),
            (iso_dow >= 6).alias("is_weekend"),
            F.dayofmonth(F.last_day("day")).alias("days_in_month"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("day")
    )
