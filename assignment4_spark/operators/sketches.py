"""Sketch and importance-weighting operators (SURVEY.md §2 B.11,
round 4): count-min-sketch heavy hitters and DSIR-style importance
scoring over the `documents` corpus.

Both are the deterministic, oracle-checkable forms of the streaming/
sampling sketches a 100 TB curation pipeline runs before anything else
touches the data: "which tokens dominate the corpus" (CMS) and "which
documents look like the target domain" (DSIR, Xie et al. 2023,
data-selection-for-LMs). Everything is md5-keyed so DuckDB reproduces
the sketch bit-for-bit (registry determinism rules; the md5→int idiom
is the KMV estimator's, aggregates.py:agg_approx_distinct).

Reference provenance: the reference has no sketching at all — its
corpus fits in one Pinecone index (SURVEY §0); these generalize the
"what is in my corpus" question its RAG ingest never has to ask.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import table
from ..registry import register

# CMS geometry: 3 hash rows x 512 buckets. At 512 buckets the fixture
# vocabulary (~2k distinct tokens at sf0.01) collides enough that the
# estimate visibly exceeds the exact count for some tokens — which is
# the point: the oracle checks the ESTIMATOR (including its collision
# inflation), not just a count.
_CMS_ROWS = 3
_CMS_W = 512

_DSIR_BUCKETS = 1024


def _bucket(col: Column, seed: str, w: int) -> Column:
    """First 8 md5 hex digits of (value || seed) as an int, mod w —
    byte-identical in DuckDB as
    CAST(concat('0x', substr(md5(v || seed), 1, 8)) AS BIGINT) % w."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(seed))), 1, 8), 16, 10)
        .cast("long")
        % w
    )


def _sql_bucket(expr: str, seed: str, w: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({expr} || '{seed}'), 1, 8)) AS BIGINT) % {w}"
    )


@register(
    "agg_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS token
      FROM documents
    ), exact AS (
      SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token
    ), b AS (
      SELECT token, exact_cnt,
             {_sql_bucket('token', '#0', _CMS_W)} AS b0,
             {_sql_bucket('token', '#1', _CMS_W)} AS b1,
             {_sql_bucket('token', '#2', _CMS_W)} AS b2
      FROM exact
    ), sk0 AS (SELECT b0 AS b, SUM(exact_cnt) AS s FROM b GROUP BY b0),
       sk1 AS (SELECT b1 AS b, SUM(exact_cnt) AS s FROM b GROUP BY b1),
       sk2 AS (SELECT b2 AS b, SUM(exact_cnt) AS s FROM b GROUP BY b2)
    SELECT token,
           CAST(LEAST(sk0.s, sk1.s, sk2.s) AS BIGINT) AS est_cnt,
           exact_cnt
    FROM b
    JOIN sk0 ON sk0.b = b.b0
    JOIN sk1 ON sk1.b = b.b1
    JOIN sk2 ON sk2.b = b.b2
    ORDER BY est_cnt DESC, token
    LIMIT 20
    """,
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: top-20 tokens by CMS estimate
    (3 md5 hash rows x 512 buckets), alongside the exact count so the
    collision inflation is visible in the output.

    The sketch is built FROM the exact per-token counts rather than by
    re-scanning token occurrences: cell(r, b) = sum of counts of tokens
    hashing to b under row r — algebraically identical to incrementing
    per occurrence, but the three bucket aggregations run over the
    (tiny) vocabulary, not the corpus, so the corpus is tokenized and
    shuffled exactly once. At 100 TB the vocabulary frame is the classic
    map-side-combinable count whose distinct-key cardinality is bounded
    by the language, not the data; the three sketch frames are ≤512 rows
    each and broadcast back onto it. In a true streaming deployment the
    sketch is the ONLY state (the exact counts exist here because the
    oracle checks the estimator against ground truth — the point of the
    operator is measuring CMS error, the production pipeline keeps just
    the 3x512 grid).
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token")
    )
    # the vocab frame feeds the probe AND all three sketch-row builds:
    # without the cut the corpus scan + token explode + vocab agg re-run
    # once per consumer (measured: 4 documents scans, 4 token shuffles,
    # zero ReusedExchange in the AQE plan) — the text_dsir_importance
    # idiom applied here collapses it to one
    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=False)
    )
    b = exact.select(
        "token",
        "exact_cnt",
        _bucket(F.col("token"), "#0", _CMS_W).alias("b0"),
        _bucket(F.col("token"), "#1", _CMS_W).alias("b1"),
        _bucket(F.col("token"), "#2", _CMS_W).alias("b2"),
    )
    sketches = [
        b.groupBy(F.col(f"b{r}").alias("b")).agg(F.sum("exact_cnt").alias(f"s{r}"))
        for r in range(_CMS_ROWS)
    ]
    out = b
    for r, sk in enumerate(sketches):
        out = out.join(
            F.broadcast(sk), out[f"b{r}"] == sk["b"]
        ).drop("b")
    return (
        out.select(
            "token",
            F.least("s0", "s1", "s2").cast("bigint").alias("est_cnt"),
            "exact_cnt",
        )
        .orderBy(F.col("est_cnt").desc(), "token")
        .limit(20)
    )


@register(
    "text_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             {_sql_bucket('token', '@d', _DSIR_BUCKETS)} AS b
      FROM (
        SELECT doc_id, lang,
               UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> ''))
                 AS token
        FROM documents
      )
    ), tgt AS (
      SELECT b, COUNT(*) AS c FROM tok WHERE lang = 'en' GROUP BY b
    ), src AS (
      SELECT b, COUNT(*) AS c FROM tok GROUP BY b
    ), tot AS (
      SELECT (SELECT SUM(c) FROM tgt) AS t_tot, (SELECT SUM(c) FROM src) AS s_tot
    ), ratio AS (
      SELECT src.b,
             LN( (COALESCE(tgt.c, 0) + 1.0) / (tot.t_tot + {_DSIR_BUCKETS}) )
               - LN( (src.c + 1.0) / (tot.s_tot + {_DSIR_BUCKETS}) ) AS logratio
      FROM src LEFT JOIN tgt ON tgt.b = src.b CROSS JOIN tot
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(r.logratio), 6) AS dsir_score
    FROM tok t JOIN ratio r ON r.b = t.b
    GROUP BY t.doc_id
    ORDER BY dsir_score DESC, t.doc_id
    LIMIT 50
    """,
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scoring (Xie et al. 2023): per-document mean
    log-likelihood ratio of hashed unigram features under the target
    distribution (lang='en' docs) vs the raw-corpus distribution —
    the score DSIR resamples on to shift a 100 TB crawl toward a
    target domain. Top-50 by score.

    Features are md5 buckets (1024) so both engines share the feature
    map exactly; both distributions are Laplace-smoothed (+1 / +B).
    Shape: ONE tokenize+bucket pass, immediately collapsed to
    per-(doc, lang, bucket) counts (≤ docs×1024 rows — the shuffled
    token text never leaves the map side) and localCheckpointed for its
    three consumers (fit counts, totals, scoring join), so the corpus
    explode provably runs once physically. Both bucket distributions
    come from one aggregation with a conditional target count. The
    per-doc score is the count-weighted mean of the broadcast 1024-row
    log-ratio table — algebraically AVG over token rows; the 6-dp
    round absorbs the engines' different summation orders (idiom:
    text_unigram_logprob).
    """
    d = table(spark, sf_dir, "documents")
    docb = (
        d.select(
            "doc_id",
            "lang",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("token"),
        )
        .select("doc_id", "lang", _bucket(F.col("token"), "@d", _DSIR_BUCKETS).alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        # three consumers (fit counts, totals, scoring join): checkpoint
        # the compact frame once so the corpus explode provably runs one
        # time — the same idiom as graph_jaccard_neighbors' postings
        .localCheckpoint(eager=True)
    )
    bdist = docb.groupBy("b").agg(
        F.sum("n").alias("sc"),
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(F.lit(0))).alias("tc"),
    )
    tot = bdist.agg(F.sum("sc").alias("s_tot"), F.sum("tc").alias("t_tot"))
    ratio = (
        bdist.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.col("tc") + F.lit(1.0))
                    / (F.col("t_tot") + F.lit(float(_DSIR_BUCKETS)))
                )
                - F.log(
                    (F.col("sc") + F.lit(1.0))
                    / (F.col("s_tot") + F.lit(float(_DSIR_BUCKETS)))
                )
            ).alias("logratio"),
        )
    )
    return (
        docb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.round(
                F.sum(F.col("n") * F.col("logratio")) / F.sum("n"), 6
            ).alias("dsir_score"),
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(50)
    )
