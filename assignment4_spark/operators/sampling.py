"""Deterministic sampling / dataset-splitting operators.

A training-data pipeline needs reproducible subsets: train/valid/test
splits that never move between runs, and stratified downsampling to
rebalance skewed strata (e.g. a dominant language). Random sampling
(`df.sample`) is seed- and partitioning-dependent and differs between
engines, so these operators derive the sample from a CONTENT HASH:
`md5(key)` is identical in Spark and DuckDB, making the exact same rows
land in the exact same split everywhere — which is also what makes the
split stable when the corpus is re-partitioned or incrementally grown
at 100 TB (a new file never reshuffles old rows between splits).

Reference provenance: the reference has no sampling at all; this
generalizes its corpus handling (SURVEY §1.1) to the dataset-curation
surface the north-star asks for. Hash-based splitting is the published
standard for dataset dedup/splits (e.g. C4/The Pile preprocessing).

Scale notes: both ops are a narrow projection (md5 + substring) feeding
a partial aggregation — no shuffle beyond the final tiny group-by. At
100 TB the hash evaluates inside whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io_util import table
from ..registry import register
from .textstats import QUALITY_SQL, quality_expr

_TRAIN = [str(d) for d in range(10)]  # 10/16 of hash space
_VALID = ["a", "b", "c"]  # 3/16
# remaining d/e/f → test


def _split_expr(key_col: str = "doc_id"):
    """THE 10/3/3 train/valid/test assignment from md5(key)'s first hex
    digit — one definition for sample_split_hash and
    text_curate_pipeline (their docstrings promise 'the same algebra')."""
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)
    return (
        F.when(h.isin(_TRAIN), F.lit("train"))
        .when(h.isin(_VALID), F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def _holdout_expr(key):
    """THE 12/2/2 val/test/train holdout from md5(key)'s first hex digit
    — shared by sample_group_holdout (key = source) and
    sample_cluster_holdout (key = cluster id)."""
    h = F.substring(F.md5(key), 1, 1)
    return (
        F.when(h.isin("c", "d"), F.lit("val"))
        .when(h.isin("e", "f"), F.lit("test"))
        .otherwise(F.lit("train"))
    )


def _lang_hash_rank():
    """Per-language deterministic rank on (md5(doc_id), doc_id) — the
    quota-selection window shared by sample_class_balance and
    sample_mix_proportions."""
    return F.row_number().over(
        W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )



@register(
    "sample_split_hash",
    oracle="""
    WITH t AS (SELECT CASE
                        WHEN SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0','1','2','3','4','5','6','7','8','9') THEN 'train'
                        WHEN SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('a','b','c') THEN 'valid'
                        ELSE 'test'
                      END AS split,
                      n_chars
               FROM documents)
    SELECT split,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 6) AS avg_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM t
    GROUP BY split
    ORDER BY split
    """,
)
def sample_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split (10/3/3 sixteenths) keyed on
    md5(doc_id): reproducible across engines, runs, and repartitions."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(_split_expr().alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("split")
    )


@register(
    "sample_stratified_hash",
    oracle="""
    WITH t AS (SELECT lang,
                      SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        IN ('0','1','2','3','4','5','6','7') AS wide,
                      SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        IN ('0','1') AS narrow
               FROM documents)
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN (lang = 'en' AND narrow) OR (lang <> 'en' AND wide)
                      THEN 1 END) AS n_sampled,
           ROUND(COUNT(CASE WHEN (lang = 'en' AND narrow) OR (lang <> 'en' AND wide)
                            THEN 1 END) * 1.0 / COUNT(*), 6) AS frac
    FROM t
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified downsample: the dominant stratum
    ('en') keeps 2/16 hash buckets, every other language keeps 8/16 —
    the standard move to flatten a skewed language mix in a training
    corpus, done deterministically so the sample is stable under
    incremental ingest."""
    d = table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    wide = h.isin([str(x) for x in range(8)])
    narrow = h.isin(["0", "1"])
    keep = ((F.col("lang") == "en") & narrow) | ((F.col("lang") != "en") & wide)
    return (
        d.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("keep"), 1)).alias("n_sampled"),
            F.round(
                F.count(F.when(F.col("keep"), 1)) * F.lit(1.0) / F.count(F.lit(1)), 6
            ).alias("frac"),
        )
        .orderBy("lang")
    )


@register(
    "text_curate_pipeline",
    oracle="""
    WITH canon AS (SELECT doc_id, lang, n_chars,
                          MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS fp,
                          LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) AS n_tokens
                   FROM documents),
    kept AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                                                         ORDER BY doc_id) AS rn
                            FROM canon)
             WHERE rn = 1),
    quality AS (SELECT * FROM kept WHERE n_chars >= 80 AND n_tokens >= 10),
    tagged AS (SELECT *, CASE
                           WHEN SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                                IN ('0','1','2','3','4','5','6','7','8','9') THEN 'train'
                           WHEN SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                                IN ('a','b','c') THEN 'valid'
                           ELSE 'test'
                         END AS split
               FROM quality)
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           ROUND(AVG(n_chars), 6) AS avg_chars
    FROM tagged
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def text_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-curation pass as ONE lazy lineage — canonicalize →
    exact-dedup (first doc_id per fingerprint wins) → quality gate
    (length + token floor) → deterministic hash split → per-(lang,split)
    summary. This is the batch shape of a training-data curation job:
    every step before the final summary is narrow except the dedup
    shuffle on the 16-byte fingerprint (never on the document text)."""
    d = table(spark, sf_dir, "documents")
    canon = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("fp"),
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tokens"),
    )
    kept = (
        canon.withColumn(
            "rn", F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .filter((F.col("n_chars") >= 80) & (F.col("n_tokens") >= 10))
    )
    return (
        kept.select("lang", _split_expr().alias("split"), "n_tokens", "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang", "split")
    )


@register(
    "sample_temperature",
    oracle="""
    WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n_docs) AS n_total,
                   SUM(POW(n_docs * 1.0 / (SELECT SUM(n_docs) FROM counts), 0.3)) AS z
            FROM counts)
    SELECT c.lang,
           c.n_docs,
           ROUND(c.n_docs * 1.0 / t.n_total, 6) AS p_raw,
           ROUND(POW(c.n_docs * 1.0 / t.n_total, 0.3) / t.z, 6) AS p_resampled,
           CAST(FLOOR(ROUND(POW(c.n_docs * 1.0 / t.n_total, 0.3) / t.z * t.n_total, 6))
                AS BIGINT) AS n_target
    FROM counts c CROSS JOIN tot t
    ORDER BY c.lang
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (exponential-smoothing) language re-weighting,
    α=0.3 — the multilingual-corpus sampling rule published with
    mBERT/XLM-R/mT5: raw language shares p_l are flattened to
    p_l^α / Σ p_l^α so low-resource languages are upsampled without
    letting any single language dominate. Output: per-language raw
    share, resampled share, and the integer document target the sampler
    would draw.

    Spark shape: one tiny hash aggregation (languages ≪ rows, fully
    map-side combinable), the normalizer Σ p^α as a second scalar
    aggregate over the per-lang frame, broadcast back via crossJoin —
    the corpus itself is scanned exactly once no matter the scale.
    Complements sample_stratified_hash (which applies a fixed bucket
    rule; this op DERIVES the per-language rates from the data)."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_total = counts.agg(F.sum("n_docs").alias("n_total"))
    tot = (
        counts.crossJoin(F.broadcast(n_total))
        .agg(
            F.max("n_total").alias("n_total"),
            F.sum(F.pow(F.col("n_docs") * F.lit(1.0) / F.col("n_total"), 0.3)).alias(
                "z"
            ),
        )
    )
    p = F.col("n_docs") * F.lit(1.0) / F.col("n_total")
    w = F.pow(p, 0.3) / F.col("z")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.round(p, 6).alias("p_raw"),
            F.round(w, 6).alias("p_resampled"),
            # floor of a 6-dp-rounded product: pow() can differ by an ulp
            # between JVM Math.pow and libm, and an unprotected FLOOR
            # turns that ulp into an off-by-one (same dyadic-boundary
            # discipline as _MIX_WEIGHTS)
            F.floor(F.round(w * F.col("n_total"), 6)).cast("bigint").alias("n_target"),
        )
        .orderBy("lang")
    )


@register(
    "sample_reservoir_hash",
    oracle="""
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                AS BIGINT) AS rk
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100
    """,
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform k-sample (k=100): the reservoir-sampling
    replacement for distributed engines. A true reservoir is
    order-dependent (useless across retries/repartitions); ranking every
    row by md5(doc_id) and keeping the k smallest gives the SAME uniform
    marginal distribution but is reproducible across engines, runs, and
    partitionings — and composes with incremental data (a doc's rank
    never changes, so the sample under growth is a proper bottom-k
    sketch, mergeable across shards).

    Plan: orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps its local top-k (O(n) scan, k-size heap), the driver
    merges p×k candidates; the full corpus is never sorted or shuffled.
    That is exactly the 100 TB shape: bottom-k by hash is a one-pass,
    mergeable sketch.
    """
    d = table(spark, sf_dir, "documents")
    return bottomk_by_hash(d, key_col="doc_id", k=100, keep_cols=["lang"]).select(
        "doc_id", "lang", "rk"
    )


def bottomk_by_hash(
    df: DataFrame, key_col: str, k: int, keep_cols: list | None = None
) -> DataFrame:
    """Composable deterministic uniform k-sample (api.bottomk_by_hash):
    the k rows whose md5(key) ranks smallest, with a 1-based `rk`
    column. Reproducible across engines/runs/partitionings, and a
    proper mergeable bottom-k sketch under data growth. Compiles to
    TakeOrderedAndProject — no global sort, no shuffle of the corpus."""
    reserved = {"_bk_h", "rk"}
    clash = reserved & {key_col, *(keep_cols or [])}
    if clash:
        raise ValueError(
            f"column(s) {sorted(clash)} collide with bottomk_by_hash's "
            "internal/output names (_bk_h, rk); rename them first"
        )
    h = F.md5(F.col(key_col).cast("string"))
    return (
        df.select(key_col, *(keep_cols or []), h.alias("_bk_h"))
        .orderBy("_bk_h", key_col)
        .limit(k)
        .select(
            key_col,
            *(keep_cols or []),
            F.row_number().over(W.orderBy("_bk_h", key_col)).cast("bigint").alias("rk"),
        )
    )


def weighted_sample_ares(
    df, id_col: str = "doc_id", weight_col: str = "n_chars", k: int = 100
):
    """Composable Efraimidis-Spirakis A-ES weighted sample w/o
    replacement (api.weighted_sample_ares): keeps the k rows with the
    largest r = ln(u)/w, u a deterministic md5-derived uniform of
    `id_col` — reproducible across engines/runs and mergeable across
    partitions (TakeOrdered, never a full sort). Appends the 1e-9-
    rounded priority key as `_ares_r`; see sample_weighted_ares for the
    determinism rationale.

    A-ES is DEFINED for positive weights only; rows with w <= 0 are
    dropped up front. Unguarded they invert the sample: ln(u) < 0, so a
    NEGATIVE w flips r positive and such rows deterministically outrank
    every valid row, while w = 0 divides to NULL (Spark) vs -inf
    (DuckDB) — a silent cross-engine divergence."""
    if "_ares_r" in df.columns:
        raise ValueError("input already has an _ares_r column; rename it first")
    h32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    r = F.round(F.log((h32 + 1) / F.lit(4294967296.0)) / F.col(weight_col), 9)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_ares_r", r)
        .orderBy(F.col("_ares_r").desc(), id_col)
        .limit(k)
    )


@register(
    "sample_weighted_ares",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS h32
      FROM documents
      WHERE n_chars > 0
    ), keyed AS (
      SELECT doc_id, lang, n_chars,
             ROUND(LN((h32 + 1) / 4294967296.0) / n_chars, 9) AS r
      FROM h
    ), top AS (
      SELECT doc_id, lang, n_chars, r,
             ROW_NUMBER() OVER (ORDER BY r DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT doc_id, lang, n_chars, ROUND(r, 6) AS priority
    FROM top WHERE rk <= 100
    ORDER BY doc_id
    """,
)
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, k=100, weight = n_chars —
    the Efraimidis-Spirakis A-ES scheme (key = u^(1/w), ranked here in
    log space r = ln(u)/w, same order, better conditioning). Longer
    documents are proportionally likelier to be kept: the byte-budget
    sampler a curation pipeline runs, where sampling documents uniformly
    would bias the token mix toward short docs.

    u is a DETERMINISTIC uniform from the first 32 md5 bits of doc_id
    ((h+1)/2^32 ∈ (0,1] — never 0, so LN is safe), which makes the
    sample reproducible across engines and runs — same rationale as
    sample_reservoir_hash's bottom-k, generalized to weights. The rank
    key is rounded to 1e-9 with a doc_id tie-break so the top-100
    membership boundary is engine-stable; output is the sample SET
    (sorted by doc_id), not the rank order, which keeps parity immune
    to adjacent-rank flips entirely. One TakeOrdered (top-k by r),
    never a full sort — mergeable across partitions like any bottom-k
    sketch, so the 100 TB plan is scan → per-partition top-k → driver
    merge.
    Reference provenance: none; north-star training-data sampling
    surface next to sample_temperature's language reweighting.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        weighted_sample_ares(d, id_col="doc_id", weight_col="n_chars", k=100)
        .select("doc_id", "lang", "n_chars", F.round("_ares_r", 6).alias("priority"))
        .orderBy("doc_id")
    )


@register(
    "sample_shuffle_hash",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY MD5('shuffle_e1:' || doc_id)) AS BIGINT)
             AS position,
           doc_id,
           lang
    FROM documents
    QUALIFY position <= 20
    ORDER BY position
    """,
)
def sample_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle — the order-randomization
    every dataset pipeline runs before sharding to trainers, done the
    reproducible way: sort key = md5(epoch_salt || id). Same salt →
    identical order on any cluster size or engine (md5 is the one hash
    both engines compute identically — FIXTURES §5); a new epoch is a
    new salt, no RNG state anywhere.

    Scale shape: the registered query takes the first 20 of the
    shuffled order, which plans as TakeOrderedAndProject — per-partition
    top-k then driver merge of k·partitions rows, NEVER a global sort.
    The full-shuffle write path is the same expression as a sort column
    feeding a partitioned writer (each output shard = one contiguous
    hash range), still one exchange. Provenance: north-star training
    pipeline (shuffle-before-shard); generalizes sample_split_hash's
    hash-determinism from membership to ORDER."""
    d = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuffle_e1:"), F.col("doc_id").cast("string")))
    # orderBy+limit FIRST (plans as TakeOrderedAndProject, plan-gated) —
    # a row_number-then-filter formulation would drag the whole corpus
    # through one window partition; the position window here only ever
    # sees the k survivors
    top = d.select("doc_id", "lang", key.alias("_k")).orderBy("_k").limit(20)
    w = W.orderBy("_k")
    return (
        top.select(
            F.row_number().over(w).cast("bigint").alias("position"),
            "doc_id",
            "lang",
        )
        .orderBy("position")
    )


@register(
    "sample_class_balance",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk
    FROM ranked WHERE rk <= 60
    ORDER BY doc_id
    """,
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: cap every language at 60 documents,
    chosen by deterministic md5 rank within the class — the
    majority-class capping step of any balanced training mix (keep all
    of the rare classes, hash-sample the overrepresented ones).

    Spark shape: ONE window (partitionBy lang, orderBy md5 hash with
    doc_id tie-break) filtered on rn ≤ cap — Spark rewrites this to
    WindowGroupLimit, so each partition keeps a 60-row heap and the
    exchange carries only survivors per class; no global sort, no
    per-class collect. Same plan family as win_topk_per_group
    (plan-gated there); the hash ranking makes the kept set
    reproducible across engines, runs, and partitionings — and under
    corpus GROWTH the kept set only changes where the hash boundary
    moves, like every bottom-k sketch in this module.
    Reference provenance: none; north-star sampling surface next to
    sample_stratified_hash (which samples a FRACTION per stratum —
    this op enforces an absolute per-class budget).
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        d.select("doc_id", "lang", _lang_hash_rank().cast("bigint").alias("rk"))
        .filter(F.col("rk") <= 60)
        .orderBy("doc_id")
    )


# Target language mix for sample_mix_proportions. DYADIC weights (exact
# binary doubles) so w*T and n/w hit no cross-engine float-boundary
# ambiguity in the floor()s below.
_MIX_WEIGHTS = {"en": 0.25, "de": 0.25, "es": 0.25, "fr": 0.125, "zh": 0.125}
_MIX_SQL_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_WEIGHTS.items())


@register(
    "sample_mix_proportions",
    oracle=f"""
    WITH tgt(lang, w) AS (VALUES {_MIX_SQL_VALUES}),
    cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    budget AS (
      SELECT CAST(MIN(FLOOR(c.n / CAST(t.w AS DOUBLE))) AS BIGINT) AS t_total
      FROM cnt c JOIN tgt t USING (lang)
    ),
    quota AS (
      SELECT t.lang,
             CAST(FLOOR(CAST(t.w AS DOUBLE) * b.t_total) AS BIGINT) AS k
      FROM tgt t, budget b
    ),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.rk, q.k AS quota
    FROM ranked r JOIN quota q USING (lang)
    WHERE r.rk <= q.k
    ORDER BY r.doc_id
    """,
)
def sample_mix_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixing to target proportions — the 'data mixture'
    step of LLM training-set assembly: given target weights per
    language (here 25/25/25/12.5/12.5%), find the LARGEST total budget
    T the corpus supports without oversampling any class
    (T = min_c floor(n_c / w_c)), then keep k_c = floor(w_c · T)
    documents per class by deterministic md5 rank.

    Spark shape: the class histogram is one map-side-combinable count;
    the budget is a single-row aggregate over ≤|classes| rows; quotas
    broadcast back onto the per-class hash ranking (WindowGroupLimit
    family, see sample_class_balance) — the corpus is scanned once and
    only survivors cross the final exchange. Weights are DYADIC
    rationals (exact doubles), so the two floor()s are boundary-exact
    across engines — the reason the target mix isn't 20% × 5.
    Reference provenance: none; public recipe = the domain-weight
    mixtures of GPT-3/Pile/LLaMA training-set papers.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in _MIX_WEIGHTS.items()], "lang string, w double"
    )
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # LEFT join from the TARGETS with absent classes counted as 0: an
    # inner join would silently drop a target class missing from the
    # corpus, compute T over the remaining classes, and emit a skewed
    # mixture — by the invariant T = min_c floor(n_c / w_c), a missing
    # class means T = 0 (empty mixture), not a renormalized one
    budget = (
        tgt.join(cnt, "lang", "left")
        .select(F.floor(F.coalesce(F.col("n"), F.lit(0)) / F.col("w")).alias("q"))
        .agg(F.min("q").cast("bigint").alias("t_total"))
    )
    quota = tgt.crossJoin(F.broadcast(budget)).select(
        "lang",
        F.floor(F.col("w") * F.col("t_total")).cast("bigint").alias("k"),
    )
    ranked = d.select("doc_id", "lang", _lang_hash_rank().cast("bigint").alias("rk"))
    return (
        ranked.join(F.broadcast(quota), "lang")
        .filter(F.col("rk") <= F.col("k"))
        .select("doc_id", "lang", "rk", F.col("k").alias("quota"))
        .orderBy("doc_id")
    )


@register(
    "sample_group_holdout",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, source,
             CASE WHEN SUBSTRING(md5(source), 1, 1) IN ('c', 'd') THEN 'val'
                  WHEN SUBSTRING(md5(source), 1, 1) IN ('e', 'f') THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT split,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware holdout split (GroupKFold semantics): the split key
    is md5(source), not md5(doc_id) — every document of a source lands
    in the SAME split by construction, so near-duplicate documents
    within one source (the dominant intra-source leakage mode) can
    never straddle the train/eval boundary. sample_split_hash is the
    per-row form; this is the leak-free form an eval pipeline actually
    needs. 12/2/2 sixteenths via the first hex digit, same algebra as
    split_hash so the two ops are directly comparable.

    Shape: one narrow projection (md5 of an already-present column) +
    one aggregation; the shuffle carries (split, source) — grouping
    stays map-side-combinable and no data moves to assign splits. At
    100 TB the assignment column is computed at scan time and the
    split filter pushes into every downstream read.
    """
    d = table(spark, sf_dir, "documents")
    assigned = d.select(
        "doc_id", "source", _holdout_expr(F.col("source")).alias("split")
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .orderBy("split")
    )


@register(
    "sample_curriculum_order",
    oracle="""
    WITH q AS (
      SELECT doc_id,
             {quality} AS quality,
             MD5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    staged AS (
      SELECT doc_id, quality, h,
             CASE WHEN quality < 0.25 THEN 1
                  WHEN quality < 0.5  THEN 2
                  WHEN quality < 0.75 THEN 3
                  ELSE 4 END          AS stage,
             SUBSTRING(h, 1, 1)       AS shard
      FROM q
    )
    SELECT doc_id, quality, stage, shard,
           ROW_NUMBER() OVER (PARTITION BY stage, shard ORDER BY h, doc_id)
             AS pos_in_shard
    FROM staged
    ORDER BY stage, shard, pos_in_shard
    """.format(quality=QUALITY_SQL),
)
def sample_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum / annealing data order: every document is assigned a
    training STAGE by quality band (literal [0,1] edges — stage 4, the
    highest-quality band, trains last, the "best data at the end"
    annealing recipe), a 16-way SHARD by content hash, and a
    deterministic position within its shard. The output IS the epoch
    file layout a trainer consumes: read shards of stage 1, then 2, …

    Scale design — the reason this is NOT one global ORDER BY with a
    corpus-wide row_number (a single-partition window, the classic
    scale-killer): stage comes from LITERAL quality edges (narrow
    codegen projection, no rank pass over the corpus), the within-stage
    shuffle order comes from md5(doc_id) (content hash — stable under
    repartitioning and incremental growth, same argument as the split
    ops above), and positions are numbered per (stage, shard) — window
    groups bounded at corpus/64, and in production the shard count
    scales with the cluster so each window partition stays file-sized.
    The quality band reuses textstats' shared QUALITY_SQL/quality_expr
    definition, so curriculum stages agree exactly with the quality
    report and the dedup survivor picker.

    Reference provenance: none (the reference trains nothing); this is
    the data-ordering surface of the north-star training pipeline
    (curriculum learning, Bengio et al. 2009; quality-annealed data
    schedules in modern LLM recipes).
    """
    d = table(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        quality_expr().alias("quality"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    staged = q.select(
        "doc_id",
        "quality",
        "h",
        F.when(F.col("quality") < 0.25, 1)
        .when(F.col("quality") < 0.5, 2)
        .when(F.col("quality") < 0.75, 3)
        .otherwise(4)
        .alias("stage"),
        F.substring("h", 1, 1).alias("shard"),
    )
    w = W.partitionBy("stage", "shard").orderBy("h", "doc_id")
    return (
        staged.withColumn("pos_in_shard", F.row_number().over(w))
        .select("doc_id", "quality", "stage", "shard", "pos_in_shard")
        .orderBy("stage", "shard", "pos_in_shard")
    )


from .dedup import _SHINGLE_SQL as _DEDUP_SHINGLE_SQL  # noqa: E402
from .dedup import JACCARD_THRESHOLD as _JACCARD  # noqa: E402


@register(
    "sample_cluster_holdout",
    oracle=f"""
    WITH RECURSIVE s AS ({_DEDUP_SHINGLE_SQL}),
    bounded AS (SELECT * FROM s WHERE doc_id < 200),
    edges AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM bounded a JOIN bounded b ON a.doc_id < b.doc_id
      WHERE LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE
            / LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))) >= {_JACCARD}
    ),
    undirected AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    reach(node, root) AS (
      SELECT DISTINCT a AS node, a AS root FROM undirected
      UNION
      SELECT u.b AS node, r.root FROM reach r JOIN undirected u ON u.a = r.node
    ),
    comp AS (SELECT node AS doc_id, MIN(root) AS comp_id FROM reach GROUP BY node),
    keyed AS (
      SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS split_key
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    assigned AS (
      SELECT doc_id, split_key,
             CASE WHEN SUBSTRING(md5(CAST(split_key AS VARCHAR)), 1, 1)
                       IN ('c', 'd') THEN 'val'
                  WHEN SUBSTRING(md5(CAST(split_key AS VARCHAR)), 1, 1)
                       IN ('e', 'f') THEN 'test'
                  ELSE 'train' END AS split
      FROM keyed
    )
    SELECT split,
           CAST(COUNT(DISTINCT split_key) AS BIGINT) AS n_keys,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
)
def sample_cluster_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-granularity holdout split — the REMEDIATION
    sibling of dedup_contamination's leak detection: when two near-
    duplicate documents straddle train/eval, the eval score is
    memorization, not generalization. sample_group_holdout closes the
    intra-source leak (split key = source); this op closes the CROSS-
    source one: the split key is the near-dup cluster canonical
    (min-doc_id connected component over the Jaccard match graph —
    construction shared with dedup_connected_components), so an entire
    duplicate cluster lands on ONE side of every boundary by
    construction. Unclustered docs split by their own id — the same
    12/2/2-sixteenths first-hex-digit md5 algebra as split_hash /
    group_holdout, so all three split ops are directly comparable.

    Near-dup edge detection runs on the doc_id < 200 slice — the same
    oracle-tractability bound as the sibling CC ops (the O(N²) exact-
    Jaccard oracle edge join; stated per the no-silent-caps rule); docs
    outside the slice are singletons here. At scale the edge generator
    is the LSH pair table (minhash_lsh_pairs — already bounded), CC is
    the alternating-star contraction (O(log² n) rounds), and the split
    assignment itself adds ONE broadcast membership join onto the
    corpus scan plus a map-side-combinable aggregate: assignment never
    shuffles the corpus. Leak-freedom is pinned by a property test
    (tests/test_properties.py): zero match-graph edges straddle splits.

    Reference provenance: none — the reference ingests and retrieves
    with no train/eval discipline at all; SURVEY §2 B.11 curation
    family (round 5).
    """
    from .dedup import bounded_neardup_edges, connected_components

    d = table(spark, sf_dir, "documents")
    comp = connected_components(bounded_neardup_edges(spark, sf_dir))
    membership = comp.select(F.col("node").alias("doc_id"), "comp_id")
    keyed = d.select("doc_id").join(F.broadcast(membership), "doc_id", "left").select(
        "doc_id", F.coalesce("comp_id", "doc_id").alias("split_key")
    )
    assigned = keyed.select(
        "doc_id",
        "split_key",
        _holdout_expr(F.col("split_key").cast("string")).alias("split"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.countDistinct("split_key").cast("bigint").alias("n_keys"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .orderBy("split")
    )


@register(
    "sample_poisson_bootstrap",
    oracle="""
    -- same algebra as the Spark side: u = first 6 hex chars of
    -- md5('doc_id:replicate'); fixed-length lowercase hex compares
    -- lexicographically exactly as its numeric value, so the Poisson(1)
    -- CDF thresholds are 6-hex-digit string literals shared verbatim
    -- by both engines
    WITH reps AS (SELECT UNNEST(generate_series(0, 7)) AS b),
    drawn AS (
      SELECT r.b,
             SUBSTRING(md5(CAST(d.doc_id AS VARCHAR) || ':'
                           || CAST(r.b AS VARCHAR)), 1, 6) AS u,
             d.n_chars
      FROM documents d CROSS JOIN reps r
    ), counted AS (
      SELECT b, n_chars,
             CASE WHEN u < '5e2d58' THEN 0
                  WHEN u < 'bc5ab1' THEN 1
                  WHEN u < 'eb715e' THEN 2
                  WHEN u < 'fb2397' THEN 3
                  ELSE 4 END AS cnt
      FROM drawn
    )
    SELECT CAST(b AS INTEGER)                 AS replicate,
           CAST(SUM(cnt) AS BIGINT)           AS n_rows,
           CAST(SUM(cnt * n_chars) AS BIGINT) AS sum_chars
    FROM counted
    GROUP BY b ORDER BY replicate
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online Poisson bootstrap (Oza-Russell): each document enters
    bootstrap replicate b with multiplicity ~ Poisson(1), drawn
    DETERMINISTICALLY from md5(doc_id:b) — the streaming-friendly
    bootstrap that never materializes a resampled corpus (the count IS
    the sample; downstream weights by it), and the standard way to get
    uncertainty estimates / bagging ensembles over a 100 TB corpus in
    ONE pass instead of B shuffled copies. The inverse-CDF lookup
    compares the hash's first 6 hex chars against Poisson(1) CDF
    thresholds embedded as fixed-length hex LITERALS — lowercase hex of
    fixed length orders lexicographically as its numeric value, so both
    engines share the draw verbatim (the sample_split_hash md5-algebra
    discipline). Counts cap at 4 (P = 1.9e-2 mass folded into the cap;
    identical truncation both engines, so parity stays exact; at B
    replicates the cap biases each replicate's size identically and
    cancels in variance CONTRASTS, which is what bootstraps consume).

    Scale shape: replicate fan-out is a narrow 8× explode (no shuffle);
    the only exchange carries 8 partial sums per partition — map-side
    combinable to O(B) rows. Per-replicate aggregates here; the same
    cnt column weights any downstream estimator.
    Reference provenance: none; SURVEY §2 Part B sampling family
    (round 8) — training-data pipeline uncertainty estimation.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    drawn = docs.select(
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b"),
        F.col("doc_id"),
    ).select(
        "b",
        "n_chars",
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            6,
        ).alias("u"),
    )
    cnt = (
        F.when(F.col("u") < "5e2d58", 0)
        .when(F.col("u") < "bc5ab1", 1)
        .when(F.col("u") < "eb715e", 2)
        .when(F.col("u") < "fb2397", 3)
        .otherwise(4)
    )
    return (
        drawn.select(F.col("b").cast("int").alias("replicate"),
                     cnt.alias("cnt"), "n_chars")
        .groupBy("replicate")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.sum(F.col("cnt") * F.col("n_chars")).cast("bigint").alias("sum_chars"),
        )
        .orderBy("replicate")
    )


@register(
    "sample_kfold_assign",
    oracle="""
    -- same algebra as the Spark side: fold = first hex digit of
    -- md5(doc_id) mod 5 — deterministic, engine-portable, and
    -- reassignment-free under any repartitioning
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
             CASE SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2
               WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 0
               WHEN '6' THEN 1 WHEN '7' THEN 2 WHEN '8' THEN 3
               WHEN '9' THEN 4 WHEN 'a' THEN 0 WHEN 'b' THEN 1
               WHEN 'c' THEN 2 WHEN 'd' THEN 3 WHEN 'e' THEN 4
               ELSE 0 END AS fold
      FROM documents
    )
    SELECT CAST(fold AS INTEGER)                       AS fold,
           COUNT(*)                                    AS n_test,
           CAST((SELECT COUNT(*) FROM documents) - COUNT(*)
                AS BIGINT)                             AS n_train,
           CAST(COUNT(DISTINCT lang) AS BIGINT)        AS n_langs,
           CAST(SUM(n_chars) AS BIGINT)                AS test_chars
    FROM assigned
    GROUP BY fold ORDER BY fold
    """,
)
def sample_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k=5): fold =
    first md5(doc_id) hex digit mod 5 — the sample_split_hash algebra
    extended to CV, so fold membership is reproducible across engines,
    runs, and repartitionings (a fold computed on the cluster equals
    the fold computed in the eval notebook), and every doc is in
    exactly one test fold and k-1 train folds. The hex digit covers
    '0'-'f' (16 values) mod 5 — fold 0 gets 4/16 of hash space
    ({0,5,a,f}), folds 1-4 get 3/16 each, 'f' folding to 0 via the
    ELSE (15 % 5 == 0); the slight
    imbalance is the price of digit-level portability and is IDENTICAL
    on both engines (the fixture-measured split is asserted by the
    oracle row counts themselves).

    Output per fold: test size, complementary train size, language
    coverage, test character mass — the sanity panel a CV harness
    checks before burning GPU-hours on a bad split.
    Scale shape: one projection + one tiny groupBy; the train count is
    total − test (no second scan — the scalar total broadcasts).
    Reference provenance: none; SURVEY §2 Part B sampling family
    (round 8) — evaluation-protocol face of the split family.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    hexd = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    # conv(hex,16,10) mod 5, with 'f' (15) folded to 0 to mirror the
    # oracle's explicit CASE (15 % 5 == 0 — the ELSE arm is exact)
    fold = (F.conv(hexd, 16, 10).cast("int") % 5).alias("fold")
    assigned = docs.select("lang", "n_chars", fold)
    total = docs.count()
    return (
        assigned.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            (F.lit(total) - F.count(F.lit(1))).cast("bigint").alias("n_train"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("bigint").alias("test_chars"),
        )
        .orderBy("fold")
    )


@register(
    "agg_bootstrap_ci",
    oracle="""
    -- replicate means under the deterministic Poisson bootstrap
    -- (sample_poisson_bootstrap's draw, verbatim), then the spread of
    -- the 8 replicate means brackets the point estimate: a bootstrap
    -- standard error and min/max band with no closed-form variance
    -- formula anywhere
    WITH reps AS (SELECT UNNEST(generate_series(0, 7)) AS b),
    drawn AS (
      SELECT r.b,
             SUBSTRING(md5(CAST(d.doc_id AS VARCHAR) || ':'
                           || CAST(r.b AS VARCHAR)), 1, 6) AS u,
             d.n_chars
      FROM documents d CROSS JOIN reps r
    ), counted AS (
      SELECT b, n_chars,
             CASE WHEN u < '5e2d58' THEN 0
                  WHEN u < 'bc5ab1' THEN 1
                  WHEN u < 'eb715e' THEN 2
                  WHEN u < 'fb2397' THEN 3
                  ELSE 4 END AS cnt
      FROM drawn
    ), rep_means AS (
      SELECT b,
             SUM(cnt * n_chars)::DOUBLE / NULLIF(SUM(cnt), 0) AS mean_chars
      FROM counted GROUP BY b
    )
    SELECT CAST(COUNT(*) AS BIGINT)            AS n_replicates,
           ROUND(AVG(mean_chars), 6)           AS boot_mean,
           ROUND(STDDEV_SAMP(mean_chars), 6)   AS boot_se,
           ROUND(MIN(mean_chars), 6)           AS boot_lo,
           ROUND(MAX(mean_chars), 6)           AS boot_hi
    FROM rep_means
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap uncertainty for an aggregate — the CONSUMER of
    sample_poisson_bootstrap's one-pass draw: each replicate's
    count-weighted mean document length, then the spread of the 8
    replicate means (bootstrap SE + min/max band) as the uncertainty
    estimate no closed-form variance covers once the pipeline between
    data and estimate stops being a textbook mean (dedup gates,
    quality filters, mixing weights — swap the inner aggregate, keep
    the harness). Deterministic end to end: the Poisson draw is the
    same md5-hex-threshold algebra, so both engines produce identical
    replicate means and the 6-dp-rounded spread matches exactly.

    Scale shape: ONE corpus pass fans out 8 narrow replicate rows per
    doc (no shuffle before the two-level aggregate); replicate means
    are 8 rows, their spread a single-row fold.
    Reference provenance: none; SURVEY §2 Part B sampling family
    (round 8) — closes the draw→estimate loop.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    drawn = docs.select(
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b"),
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            6,
        ).alias("u"),
    )
    cnt = (
        F.when(F.col("u") < "5e2d58", 0)
        .when(F.col("u") < "bc5ab1", 1)
        .when(F.col("u") < "eb715e", 2)
        .when(F.col("u") < "fb2397", 3)
        .otherwise(4)
    )
    rep_means = (
        drawn.select("b", cnt.alias("cnt"), "n_chars")
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("cnt") * F.col("n_chars")).cast("double")
                / F.nullif(F.sum("cnt"), F.lit(0))
            ).alias("mean_chars")
        )
    )
    return rep_means.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.avg("mean_chars"), 6).alias("boot_mean"),
        F.round(F.stddev_samp("mean_chars"), 6).alias("boot_se"),
        F.round(F.min("mean_chars"), 6).alias("boot_lo"),
        F.round(F.max("mean_chars"), 6).alias("boot_hi"),
    )
