"""Text-analysis operators for training-data pipelines (SURVEY.md §2 B.8
north-star: language-ID, quality scoring, token counting, fingerprinting,
word stats, tf-idf).

All pure Catalyst expressions — token work uses split/explode/
higher-order functions, never a Python loop, so the same code runs over
100 TB of documents as a narrow scan + one shuffle per aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io_util import table
from ..registry import register

# Function-word lists for the n-gram/stopword language heuristic. Tiny on
# purpose: they broadcast inside the expression tree as literals.
EN_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"]
FR_STOP = ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"]


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@register(
    "text_word_count",
    oracle="""
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
)
def text_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 token frequency — explode + hash agg; the shuffle
    carries one row per distinct token (map-side partial counts)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents WHERE doc_id < 100
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * LN(n.n_docs / df.df), 6) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY ROUND(tf.tf * LN(n.n_docs / df.df), 6) DESC,
                                         tf.term) AS rn
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rn AS term_rank
    FROM scored WHERE rn <= 5
    ORDER BY doc_id, term_rank
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf-idf terms per document. df-side is a broadcast join (the
    vocabulary is tiny next to the corpus); idf uses ln(N/df)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tf.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("raw", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    # rank on the 6-dp-rounded score: DuckDB's LN and the JVM's Math.log
    # can disagree in the last bit, flipping ulp-close term ranks
    # cross-engine (the rag_rrf_fusion idiom)
    w = W.partitionBy("doc_id").orderBy(F.round("raw", 6).desc(), F.col("term"))
    return (
        scored.select(
            "doc_id",
            "term",
            F.round("raw", 6).alias("tfidf"),
            F.row_number().over(w).alias("term_rank"),
        )
        .filter(F.col("term_rank") <= 5)
        .orderBy("doc_id", "term_rank")
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*)                 AS n_docs,
           ROUND(AVG(n_chars), 6)   AS avg_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang", "source")
    )



def _lang_hits(text_col: str = "text"):
    """Per-language stopword hit counts — the ONE classifier feature
    definition shared by text_lang_id and text_lang_id_eval so the
    confusion matrix always evaluates the classifier that ships."""
    toks = F.split(F.lower(F.col(text_col)), " ")

    def hits(words: list[str]):
        lits = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))

    return [
        hits(EN_STOP).alias("en_hits"),
        hits(DE_STOP).alias("de_hits"),
        hits(FR_STOP).alias("fr_hits"),
    ]


def _lang_pred():
    """The argmax/tie/fallback decision over the hit counts: no hits →
    'und'; deterministic tie order en > de > fr. Single definition per
    engine (the oracle twins inline the same CASE order)."""
    return (
        F.when(
            (F.col("en_hits") == 0) & (F.col("de_hits") == 0) & (F.col("fr_hits") == 0),
            "und",
        )
        .when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits")),
            "en",
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
        .alias("pred_lang")
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                             t -> LIST_CONTAINS({_sql_list(EN_STOP)}, t))) AS en_hits,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                             t -> LIST_CONTAINS({_sql_list(DE_STOP)}, t))) AS de_hits,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                             t -> LIST_CONTAINS({_sql_list(FR_STOP)}, t))) AS fr_hits
      FROM documents
    )
    SELECT doc_id, en_hits, de_hits, fr_hits,
           CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'und'
                WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                WHEN de_hits >= fr_hits THEN 'de'
                ELSE 'fr' END AS pred_lang
    FROM scored
    ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (the classic n-gram/function-word
    heuristic). Deterministic tie order: en > de > fr; no hits → 'und'."""
    d = table(spark, sf_dir, "documents")
    scored = d.select("doc_id", *_lang_hits())
    return scored.select(
        "doc_id", "en_hits", "de_hits", "fr_hits", _lang_pred()
    ).orderBy("doc_id")


# The composed [0,1] quality score, shared between text_quality_score
# (the per-doc report) and dedup_cluster_representative (the survivor
# picker): token-count saturation worth 0.5 + a low-punctuation bonus
# worth 0.5. One definition per engine so every consumer ranks docs
# identically.
QUALITY_SQL = """ROUND(
             LEAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) / 100.0, 1.0) * 0.5
             + CASE WHEN LEN(REGEXP_EXTRACT_ALL(text, '[^a-zA-Z0-9 ]'))::DOUBLE
                         / GREATEST(LENGTH(text), 1) < 0.1 THEN 0.5 ELSE 0.0 END, 6)"""


def quality_expr() -> Column:
    """Spark twin of QUALITY_SQL over a `text` column (narrow, codegen)."""
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    n_punct = F.regexp_count("text", F.lit(r"[^a-zA-Z0-9 ]"))
    return F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.when(n_punct / F.greatest(F.length("text"), F.lit(1)) < 0.1, 0.5).otherwise(0.0),
        6,
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           LENGTH(text)                                       AS n_chars_m,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) AS n_tokens,
           ROUND(LENGTH(text)::DOUBLE
                 / GREATEST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')), 1), 6)
                                                              AS avg_token_len,
           LEN(REGEXP_EXTRACT_ALL(text, '[^a-zA-Z0-9 ]'))     AS n_punct,
           {QUALITY_SQL}                                      AS quality
    FROM documents
    ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length + token stats + punctuation
    ratio composed into a [0,1] score — the shape of C4/Gopher-style
    quality filters, as one codegen'd projection."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    n_tokens = F.size(toks)
    n_punct = F.regexp_count("text", F.lit(r"[^a-zA-Z0-9 ]"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(F.length("text") / F.greatest(n_tokens, F.lit(1)), 6).alias("avg_token_len"),
        n_punct.alias("n_punct"),
        quality_expr().alias("quality"),
    ).orderBy("doc_id")


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> ''))  AS ws_tokens,
           LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)                 AS byte_estimate
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, a BPE-ish regex (letter
    runs / digits / punctuation — the GPT-2 pre-tokenizer shape), and the
    chars/4 estimate used for budget planning."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("ws_tokens"),
        F.regexp_count("text", F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("byte_estimate"),
    ).orderBy("doc_id")


@register(
    "text_winnow_fingerprint",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             UNNEST(generate_series(1, GREATEST(LENGTH(text) - 4, 1))) AS pos,
             text
      FROM documents
    ), hashed AS (
      SELECT doc_id, pos,
             MD5(SUBSTRING(text, CAST(pos AS INTEGER), 5)) AS h
      FROM grams
    ), winnowed AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
      FROM hashed
    )
    SELECT doc_id,
           COUNT(DISTINCT fp)  AS n_fp,
           MIN(fp)             AS min_fp,
           MAX(fp)             AS max_fp
    FROM winnowed
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint (MOSS-style rolling-hash scheme,
    the north star's "document fingerprinting (rolling hash)"):
    5-gram hashes → min per sliding window of 8 → distinct fingerprint
    set per document. Two documents sharing text spans share fingerprint
    values regardless of offset — the substring-plagiarism/dup sketch
    that whole-document hashing (text_fingerprint) cannot give.

    Shape: explode positions (narrow fan-out) → md5 per gram → window
    min per doc (one shuffle, partitioned by doc) → per-doc aggregate.
    Hashes compare as lowercase hex STRINGS (md5 is identical across
    engines; lexicographic min avoids any hex→int dialect divergence).
    The per-row lambda alternative (slice+array_min inside transform)
    re-evaluates the hash array per window position in the interpreted
    evaluator — same pitfall as the minhash signatures, avoided the
    same way."""
    d = table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        "text",
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 4, F.lit(1)))
        ).alias("_i", "pos"),
    ).select(
        "doc_id", "pos", F.md5(F.expr("substring(text, pos, 5)")).alias("h")
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, 7)
    )
    winnowed = grams.select("doc_id", F.min("h").over(w).alias("fp"))
    return (
        winnowed.groupBy("doc_id")
        .agg(
            F.countDistinct("fp").alias("n_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS fp,
           SUBSTRING(MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))), 1, 8) AS fp_short
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalizing content fingerprint: whitespace-collapse + lowercase
    + md5 (md5 is identical across engines, unlike xxhash). This is the
    exact-dedup key for A11's content-hash vector ids (SURVEY Appendix
    A.4 replacement for wall-clock ids)."""
    d = table(spark, sf_dir, "documents")
    canon = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return d.select(
        "doc_id",
        F.md5(canon).alias("fp"),
        F.substring(F.md5(canon), 1, 8).alias("fp_short"),
    ).orderBy("doc_id")


@register(
    "text_pii_redact",
    oracle="""
    WITH enriched AS (
      SELECT doc_id,
             text || ' contact: user' || doc_id || '@mail-' || (doc_id % 7) ||
               '.example or +1-555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents
    ), redacted AS (
      SELECT doc_id,
             REGEXP_REPLACE(
               REGEXP_REPLACE(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
      FROM enriched
    )
    SELECT doc_id,
           LENGTH(clean) AS n_chars_clean,
           CAST((LENGTH(clean) - LENGTH(REPLACE(clean, '<EMAIL>', '')))
                / LENGTH('<EMAIL>') AS BIGINT) AS n_emails,
           CAST((LENGTH(clean) - LENGTH(REPLACE(clean, '<PHONE>', '')))
                / LENGTH('<PHONE>') AS BIGINT) AS n_phones
    FROM redacted
    ORDER BY doc_id
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the standard pre-training redaction pass: email
    and phone patterns replaced by typed placeholder tokens, with
    per-doc redaction counts. The fixture corpus carries no real PII,
    so a deterministic synthetic contact line (derived from doc_id
    only) is appended first; the patterns and the count-by-placeholder
    accounting are the real operator. Narrow projection, no shuffle —
    at 100 TB this runs inside codegen next to the scan."""
    d = table(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            enriched, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
        ),
        r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    )
    placeholder_count = lambda col, tok: (
        (F.length(col) - F.length(F.replace(col, F.lit(tok), F.lit(""))))
        / F.length(F.lit(tok))
    ).cast("bigint")
    out = d.select("doc_id", clean.alias("clean"))
    return out.select(
        "doc_id",
        F.length("clean").alias("n_chars_clean"),
        placeholder_count(F.col("clean"), "<EMAIL>").alias("n_emails"),
        placeholder_count(F.col("clean"), "<PHONE>").alias("n_phones"),
    ).orderBy("doc_id")



def unigram_logprob(d: DataFrame, *id_cols: str):
    """Shared CCNet unigram-LM scorer: per-row mean log-probability of
    the whitespace tokens under the corpus's OWN unigram distribution.
    Returns (scored_with_counts) grouped by ``id_cols`` with columns
    (``*id_cols``, n_tokens, avg_logprob 6-dp). ONE definition of the
    signal for text_unigram_logprob (the report) and
    text_quality_bucket (the tercile split) so "the CCNet signal"
    cannot mean two different numbers in this module. Plan shape:
    map-side-combinable vocab count, broadcast scoring join, one keyed
    aggregation — no corpus×vocab shuffle."""
    tok = d.select(
        *id_cols,
        F.explode(F.filter(F.split(F.lower("text"), " "), lambda x: x != "")).alias(
            "token"
        ),
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = vocab.agg(F.sum("freq").alias("tot"))
    return (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(total))
        .groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("freq") / F.col("tot"))), 6).alias("avg_logprob"),
        )
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (SELECT doc_id,
                        UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> ''))
                          AS token
                 FROM documents),
    vocab AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
    total AS (SELECT SUM(freq) AS tot FROM vocab)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(LN(v.freq / total.tot)), 6) AS avg_logprob
    FROM tok t, vocab v, total
    WHERE t.token = v.token
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style quality signal:
    per-document mean log-probability under the corpus's own unigram
    distribution (low = token mix unlike the corpus → filter/bucket
    candidate). Two aggregation passes: the vocabulary (token → freq,
    tiny for any natural corpus relative to the data) is built once and
    broadcast back onto the exploded tokens, so the big side shuffles
    only for the final per-doc aggregation. At 100 TB the vocab pass is
    the classic map-side-combinable count; the scoring join is
    broadcast — no corpus×vocab shuffle."""
    d = table(spark, sf_dir, "documents")
    return unigram_logprob(d, "doc_id").orderBy("doc_id")


@register(
    "text_ngram_freq",
    oracle="""
    WITH tok AS (SELECT LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '') AS toks
                 FROM documents),
    bg AS (SELECT UNNEST([toks[i] || ' ' || toks[i+1]
                          FOR i IN GENERATE_SERIES(1, LEN(toks) - 1)]) AS bigram
           FROM tok WHERE LEN(toks) >= 2)
    SELECT bigram, COUNT(*) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequency, top-20 — the n-gram generalization
    of text_word_count (unigrams): the substrate for collocation
    mining, n-gram LM training, and the shingle statistics the dedup
    family consumes. Bigrams are built NARROW from two shifted slices
    zipped together (no index-lambda re-evaluation — same trick as
    dedup._shingles), so the only shuffle is the map-side-combinable
    count; ordering is fully deterministic (count desc, bigram asc)."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    t = d.select(toks.alias("toks")).filter(F.size("toks") >= 2)
    m = F.size("toks") - F.lit(1)
    bigrams = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


PACK_BUDGET = 256  # tokens per training sequence (fixture-scaled; 2k-8k real)
PACK_SHARDS = 8


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             doc_id % {PACK_SHARDS} AS shard,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT shard, doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / {PACK_BUDGET}) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT shard, pack_id,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id)                   AS first_doc
    FROM packed
    GROUP BY shard, pack_id
    ORDER BY shard, pack_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the step that turns a curated corpus into
    fixed-budget training sequences (T5/GPT "example packing"), as
    budget-aligned segmentation of the concatenated token stream:
    pack_id = floor(start_offset / budget), i.e. each document joins
    the pack its first token falls into. A pack's SPAN overflows by at
    most its last document (a pack downstream of a long overflow can be
    light — the rule aligns boundaries to the stream, it does not reset
    a counter). The reset-based greedy packer is a sequential
    recurrence no window function expresses; this offset rule is its
    standard parallelizable stand-in (bin-perfect packing is NP-hard
    and never used at corpus scale).

    Scale shape: packing is SHARDED (doc_id % shards) so the running-sum
    window partitions by shard — shards pack independently on different
    executors, no global sort, no driver state; the rollup reuses the
    window's (shard) partitioning. At 100 TB shards = O(cores) and the
    only exchange carries (shard, doc_id, n_tokens) — never text.
    Deterministic: doc_id order within shard, integer arithmetic only.
    Provenance: north-star training-data pipeline (packing is the step
    between text_token_count's budgets and the trainer)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.select(
        "shard",
        "doc_id",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET
        ).alias("pack_id"),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("shard", "pack_id")
    )


@register(
    "text_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
      FROM (SELECT UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) AS w
            FROM documents)
      GROUP BY w
    ), pairs AS (
      SELECT SUBSTR(w, CAST(i AS INTEGER), 2) AS pair, wc
      FROM words, UNNEST(GENERATE_SERIES(1, LENGTH(w) - 1)) t(i)
      WHERE LENGTH(w) >= 2
    )
    SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first merge step of BPE tokenizer training: count adjacent
    symbol pairs, weighted by word frequency — the argmax pair is the
    first merge rule (Sennrich et al., ACL'16). Returns the top-20
    character pairs.

    Scale shape — the real BPE training trick, applied Spark-side:
    aggregate the corpus to its DISTINCT-WORD vocabulary first (one
    hash agg; the vocab is orders of magnitude smaller than the token
    stream), then explode character pairs over vocab entries only,
    weighting by the word count. The expensive explode runs on |vocab|
    rows, not |corpus| tokens — exactly how production BPE trainers
    (HuggingFace tokenizers, SentencePiece) structure the count. Pair
    extraction is a transform over a per-word index sequence taking the
    2-char substring at each position — row-local and codegen'd, no
    positional self-join (bpe_train uses the equivalent
    zip-of-shifted-slices form); both aggregations are map-side
    combinable."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    words = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("w") >= 2)
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.substring(F.col("w"), i, F.lit(2)),
    )
    return (
        words.select(F.explode(pairs).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@register(
    "text_quality_bucket",
    oracle="""
    WITH tok AS (SELECT doc_id, lang,
                        UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> ''))
                          AS token
                 FROM documents),
    vocab AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
    total AS (SELECT SUM(freq) AS tot FROM vocab),
    scored AS (
      SELECT t.doc_id, t.lang, ROUND(AVG(LN(v.freq / total.tot)), 6) AS avg_logprob
      FROM tok t, vocab v, total
      WHERE t.token = v.token
      GROUP BY t.doc_id, t.lang
    )
    SELECT doc_id, lang, avg_logprob,
           CASE NTILE(3) OVER (PARTITION BY lang
                               ORDER BY avg_logprob DESC, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM scored
    ORDER BY doc_id
    """,
)
def text_quality_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: score every document by mean
    unigram log-probability under the corpus's own distribution
    (text_unigram_logprob's signal), then split each LANGUAGE into
    head / middle / tail terciles — the exact shape CCNet uses to keep
    'head' web text for LM training and to stratify the rest.

    Spark shape: the scoring pass is the broadcast-vocab plan of
    text_unigram_logprob (map-side-combinable vocab count, broadcast
    scoring join, one per-doc aggregation). The tercile split is an
    ntile(3) window PARTITIONED BY lang — no corpus-global window; each
    language ranks independently, which is both the CCNet semantics and
    the scale story (per-language partitions; a skew-heavy language mix
    at 100 TB would sub-salt by shard and merge tercile boundaries via
    approximate thresholds, at the cost of exactness this registered
    face keeps). Ordering ties on 6-dp-rounded score break on doc_id,
    so bucket assignment is engine-stable.
    Reference provenance: none in the reference app; the north-star
    curation surface next to text_unigram_logprob (CCNet, Wenzek et
    al. 2020, is the public recipe).
    """
    d = table(spark, sf_dir, "documents")
    scored = unigram_logprob(d, "doc_id", "lang").drop("n_tokens")
    tri = F.ntile(3).over(
        W.partitionBy("lang").orderBy(F.col("avg_logprob").desc(), "doc_id")
    )
    return scored.select(
        "doc_id",
        "lang",
        "avg_logprob",
        F.when(tri == 1, "head").when(tri == 2, "middle").otherwise("tail").alias(
            "bucket"
        ),
    ).orderBy("doc_id")


@register(
    "text_repetition_filter",
    oracle="""
    WITH tok AS (SELECT doc_id,
                        LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '') AS toks
                 FROM documents),
    words AS (SELECT doc_id, UNNEST(toks) AS token FROM tok),
    wf AS (SELECT doc_id, token, COUNT(*) AS freq, COUNT(*) * LEN(token) AS wchars
           FROM words GROUP BY doc_id, token),
    wordstat AS (
      SELECT doc_id,
             ROUND(MAX(wchars)::DOUBLE / SUM(wchars), 6) AS top_word_frac
      FROM wf GROUP BY doc_id
    ),
    tri AS (
      SELECT doc_id,
             CASE WHEN LEN(toks) >= 3 THEN
               ROUND(1.0 - LEN(LIST_DISTINCT(
                         [toks[i] || '_' || toks[i+1] || '_' || toks[i+2]
                          FOR i IN GENERATE_SERIES(1, LEN(toks) - 2)]))::DOUBLE
                     / (LEN(toks) - 2), 6)
             ELSE 0.0 END AS dup_trigram_frac
      FROM tok
    )
    SELECT w.doc_id, w.top_word_frac, t.dup_trigram_frac,
           (w.top_word_frac <= 0.2 AND t.dup_trigram_frac <= 0.3) AS keep
    FROM wordstat w JOIN tri t USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filtering (Rae et al. 2021, §A1.1): flag
    documents dominated by repeated content. Two signals per document:

      * top_word_frac — the largest character mass any single word
        accounts for (max over words of freq·len / Σ freq·len); the
        'fraction of characters in the most common word' family of
        rules. Computed by exploding tokens into a map-side-combinable
        (doc, token) count and taking max/sum per doc — two hash
        aggregations, no window, no corpus-global state.
      * dup_trigram_frac — the fraction of a doc's word trigrams that
        are duplicates (1 − distinct/total), computed entirely NARROW:
        the trigram array is built per-row from shifted slices
        (dedup._shingles trick) and reduced with array_distinct/size,
        so this signal costs zero shuffles.

    keep = top_word_frac ≤ 0.2 AND dup_trigram_frac ≤ 0.3 (Gopher's
    published cutoffs for the analogous rules). The corpus-scan cost at
    100 TB is one explode+agg for the word signal; a production run
    fuses both signals into the same single pass over text it already
    makes for quality scoring (text_quality_score).
    Reference provenance: none in the reference (no curation at all);
    north-star training-data surface, public recipe = Gopher appendix.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    base = d.select("doc_id", toks.alias("toks"))

    words = base.select("doc_id", F.explode("toks").alias("token"))
    wf = words.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("freq"),
        (F.count(F.lit(1)) * F.length("token")).alias("wchars"),
    )
    wordstat = wf.groupBy("doc_id").agg(
        F.round(F.max("wchars").cast("double") / F.sum("wchars"), 6).alias(
            "top_word_frac"
        )
    )

    m = F.size("toks") - F.lit(2)
    tri_arr = F.zip_with(
        F.zip_with(
            F.slice("toks", 1, m),
            F.slice("toks", 2, m),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
        F.slice("toks", 3, m),
        lambda ab, c: F.concat(ab, F.lit("_"), c),
    )
    tri = base.select(
        "doc_id",
        F.when(
            F.size("toks") >= 3,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(tri_arr)).cast("double")
                / (F.size("toks") - F.lit(2)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )

    return (
        wordstat.join(tri, "doc_id")
        .select(
            "doc_id",
            "top_word_frac",
            "dup_trigram_frac",
            (
                (F.col("top_word_frac") <= 0.2) & (F.col("dup_trigram_frac") <= 0.3)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def bpe_merge_expr(sym_col, left: str, right: str, merged: str):
    """One BPE merge rule applied to an array<string> symbol column as a
    greedy left-to-right fold (leftmost occurrence first, like every
    production BPE implementation): F.aggregate with an array
    accumulator — if the accumulator's last symbol is `left` and the
    current is `right`, the pair collapses to `merged`, else append.
    Interpreted (lambda) evaluation, but only ever run over the
    DISTINCT-WORD vocabulary (see bpe_train), never the corpus."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(words: DataFrame, num_merges: int = 8) -> list[tuple[str, str, int]]:
    """BPE tokenizer training (Sennrich et al., ACL'16) over a
    (w: string, wc: bigint) word-frequency frame: `num_merges` rounds,
    each = ONE pair-count aggregation over the symbolized vocabulary +
    a deterministic argmax (count desc, then left/right asc), then the
    winning rule merged into every vocab entry. Returns the merge table
    [(left, right, count), ...] in rank order — the tokenizer artifact.

    Scale shape: the corpus appears only in the caller's word-count
    aggregation; every training round runs on the DISTINCT-WORD vocab
    (HuggingFace tokenizers / SentencePiece structure the count the
    same way), so round cost is |vocab|, map-side combinable, with the
    vocab localCheckpointed per round to keep lineage flat. The argmax
    is a 1-row driver fetch per round — a scalar training decision,
    same pattern as vec_kmeans_train's centroid step, NOT a corpus
    collect. Deterministic: ties break on (left, right)
    lexicographically."""
    sym = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, F.lit(1)),
    )
    vocab = words.select(sym.alias("sym"), F.col("wc")).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        m = F.size("sym") - F.lit(1)
        pairs = F.zip_with(
            F.slice("sym", 1, m),
            F.slice("sym", 2, m),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        best = (
            vocab.filter(F.size("sym") >= 2)
            .select(F.explode(pairs).alias("p"), "wc")
            .groupBy("p")
            .agg(F.sum("wc").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l"), F.col("p.r"))
            .head(1)
        )
        if not best:
            break
        left, right, n = best[0]["p"]["l"], best[0]["p"]["r"], best[0]["n"]
        merges.append((left, right, int(n)))
        vocab = vocab.select(
            bpe_merge_expr(F.col("sym"), left, right, left + right).alias("sym"),
            "wc",
        ).localCheckpoint(eager=True)
    return merges


@register("text_bpe_train")  # rows-only: iterative argmax loop, no SQL twin
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training on the documents corpus: 8 merge rules
    learned from the word-frequency table (registered face of
    bpe_train — see its docstring for the vocab-sized round cost and
    determinism). Output: (rank, left, right, merged, n) — the ordered
    merge table a tokenizer ships as its model artifact.

    Rows-only by design (like vec_kmeans_train): the training loop's
    argmax-per-round is not expressible as one SQL query; correctness
    is pinned instead by a pure-Python reference implementation over
    the same word counts (SURVEY §5.2.6 pin:
    tests/test_rag_ops.py::test_bpe_train_matches_python_reference and
    ::test_bpe_train_registered_head_is_pair_counts_top1).
    Reference provenance: none in the reference app; north-star
    tokenizer-training surface, one step past text_bpe_pair_counts
    (whose top-1 row equals this op's rank-1 rule by construction).
    """
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    words = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    merges = bpe_train(words, num_merges=8)
    return spark.createDataFrame(
        [
            (i + 1, left, right, left + right, n)
            for i, (left, right, n) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string, n bigint",
    )


@register(
    "text_bigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, pos, token FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
               token
        FROM (SELECT doc_id,
                     UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                        x -> x <> '')) AS token,
                     UNNEST(generate_series(1, LEN(LIST_FILTER(
                       STRING_SPLIT(LOWER(text), ' '), x -> x <> '')))) AS pos
              FROM documents))
    ), big AS (
      SELECT doc_id, token AS w1,
             LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ), bigrams AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
    uni AS (SELECT token AS w1, COUNT(*) AS c1 FROM tok GROUP BY token),
    bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM bigrams GROUP BY w1, w2),
    v AS (SELECT COUNT(*) AS vsize FROM uni)
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(LN((bi.c2 + 1.0) / (uni.c1 + v.vsize))), 6) AS avg_logprob
    FROM bigrams b
    JOIN bi ON bi.w1 = b.w1 AND bi.w2 = b.w2
    JOIN uni ON uni.w1 = b.w1
    CROSS JOIN v
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — one order
    up from text_unigram_logprob, the cheap proxy for the "perplexity
    under a small LM" filter (CCNet's KenLM step) a curation pipeline
    applies after the unigram pass: per-document mean
    ln P(w_i | w_{i-1}) where P = (c(w1,w2)+1) / (c(w1)+|V|).

    Shape: one tokenize pass with positions (narrow), adjacent pairs
    via a per-doc lead() window (one shuffle, partitioned by doc —
    never a positional self-join of the token stream), then the bigram
    and unigram count tables (vocabulary-bounded, map-side combinable)
    broadcast back onto the bigram stream for scoring, and one per-doc
    aggregation. The count tables are what a 100 TB run materializes
    once and reuses across every scoring pass; the corpus-sized frames
    only ever shuffle on doc_id. AVG + 6-dp round absorbs summation
    order (idiom: text_unigram_logprob).
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("pos", "token"),
    )
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        tok.select(
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token").over(wdoc).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    uni = tok.groupBy(F.col("token").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    v = uni.agg(F.count(F.lit(1)).alias("vsize"))
    return (
        bigrams.join(F.broadcast(bi), ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vsize")))), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, pos,
             REGEXP_REPLACE(token, '[^a-z0-9]', '', 'g') AS w
      FROM (SELECT doc_id,
                   UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS token,
                   UNNEST(generate_series(1, LEN(STRING_SPLIT(LOWER(text), ' ')))) AS pos
            FROM documents)
    ), marked AS (
      SELECT doc_id, pos, w,
             (w = '' OR w IN ({', '.join(f"'{s}'" for s in EN_STOP)})) AS is_break
      FROM tok
    ), phrased AS (
      SELECT doc_id, pos, w, is_break,
             SUM(CASE WHEN is_break THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS phrase_id
      FROM marked
    ), words AS (
      SELECT doc_id, phrase_id, pos, w FROM phrased WHERE NOT is_break
    ), plen AS (
      SELECT doc_id, phrase_id, COUNT(*) AS n_words FROM words
      GROUP BY doc_id, phrase_id
    ), wstat AS (
      SELECT w.w, COUNT(*) AS freq, SUM(p.n_words) AS degree
      FROM words w JOIN plen p USING (doc_id, phrase_id)
      GROUP BY w.w
    ), phrases AS (
      SELECT w.doc_id, w.phrase_id,
             STRING_AGG(w.w, ' ' ORDER BY w.pos) AS phrase,
             COUNT(*) AS n_words,
             ROUND(SUM(s.degree / CAST(s.freq AS DOUBLE)), 6) AS score
      FROM words w JOIN wstat s ON s.w = w.w
      GROUP BY w.doc_id, w.phrase_id
    )
    SELECT phrase, MAX(n_words) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_occur,
           MAX(score) AS score
    FROM phrases
    WHERE n_words >= 2
    GROUP BY phrase
    ORDER BY MAX(score) DESC, phrase
    LIMIT 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal runs of non-stopword tokens; each word scores
    degree/frequency over the phrase co-occurrence graph; a phrase
    scores the sum of its word scores. Top-20 multi-word phrases.

    Phrase segmentation is the GAPS-AND-ISLANDS window
    (win_streaks_islands applied to NLP): punctuation-stripped empty
    tokens and stopwords mark breaks, a running break-count labels
    each run — no regex phrase-splitter, so both engines segment with
    byte-identical rules (a regexp_split dialect difference would
    silently shift every boundary). One per-doc window, then three
    vocabulary-bounded aggregations (phrase length, word stats, phrase
    assembly) — the word-stat table broadcasts at any corpus size; the
    corpus-sized frames shuffle only on (doc_id). Phrase text is
    reassembled with an ordered aggregation on both engines.
    Reference provenance: the reference asks an LLM for document
    keywords (ra/agent.py summarize step); this is the deterministic
    in-engine form.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "raw"),
    ).select(
        "doc_id",
        (F.col("pos") + 1).alias("pos"),
        F.regexp_replace("raw", "[^a-z0-9]", "").alias("w"),
    )
    marked = tok.withColumn(
        "is_break", (F.col("w") == "") | F.col("w").isin(*EN_STOP)
    )
    wp = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    phrased = marked.withColumn(
        "phrase_id", F.sum(F.col("is_break").cast("int")).over(wp)
    )
    words = phrased.filter(~F.col("is_break")).select(
        "doc_id", "phrase_id", "pos", "w"
    )
    plen = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    wstat = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("n_words").alias("degree"))
    )
    phrases = (
        words.join(F.broadcast(wstat), "w")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("w")))
                    ),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                F.sum(F.col("degree") / F.col("freq").cast("double")), 6
            ).alias("score"),
        )
    )
    return (
        phrases.filter(F.col("n_words") >= 2)
        .groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_occur"),
            F.max("score").alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(20)
    )


@register(
    "text_lang_id_eval",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                             t -> LIST_CONTAINS({_sql_list(EN_STOP)}, t))) AS en_hits,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                             t -> LIST_CONTAINS({_sql_list(DE_STOP)}, t))) AS de_hits,
             LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                             t -> LIST_CONTAINS({_sql_list(FR_STOP)}, t))) AS fr_hits
      FROM documents
    ), pred AS (
      SELECT lang AS true_lang,
             CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'und'
                  WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                  WHEN de_hits >= fr_hits THEN 'de'
                  ELSE 'fr' END AS pred_lang
      FROM scored
    )
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def text_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language classifier against the
    fixture's ground-truth lang label — the eval step that belongs next
    to every heuristic filter in a curation pipeline (a quality filter
    whose error structure is unmeasured is a silent data bias; the
    matrix shows WHERE misclassifications go, which per-class accuracy
    hides — e.g. zh has no stopword list here, so its row lands on
    whatever list collides with its tokens).

    Shape: the scorer is text_lang_id's narrow per-row expression; the
    matrix is one map-side-combinable count whose key cardinality is
    |langs|² at most. Classifier and eval run in ONE scan — no join
    between predictions and labels because the label rides the same
    row (the usual eval-join disappears when eval data is columnar).
    """
    d = table(spark, sf_dir, "documents")
    scored = d.select(F.col("lang").alias("true_lang"), *_lang_hits())
    pred = scored.select("true_lang", _lang_pred())
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, '')) AS ch
      FROM documents
    ), freq AS (
      SELECT doc_id, ch, COUNT(*) AS c
      FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    ), tot AS (
      SELECT doc_id, SUM(c) AS n FROM freq GROUP BY doc_id
    ), ent AS (
      SELECT f.doc_id,
             CAST(t.n AS BIGINT) AS n_chars,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             -SUM((f.c / CAST(t.n AS DOUBLE))
                  * LN(f.c / CAST(t.n AS DOUBLE))) / LN(2) AS h
      FROM freq f JOIN tot t USING (doc_id)
      GROUP BY f.doc_id, t.n
    )
    SELECT doc_id, n_chars, n_distinct, ROUND(h, 6) AS entropy_bits,
           CASE WHEN ROUND(h, 6) < 3.9 THEN 'low'
                WHEN ROUND(h, 6) < 4.1 THEN 'mid'
                ELSE 'high' END AS bucket
    FROM ent
    ORDER BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document, bucketed — the
    classic gibberish/boilerplate screen (near-zero entropy = repeated
    filler, ~4.1 bits = natural English, ≥5 = random/encoded garbage)
    that complements the token-ratio signals of text_quality_score:
    entropy catches degenerate text whose token statistics look normal.
    Bucket boundaries (3.9 / 4.1 bits) sit inside the fixture's
    observed 3.67-4.23 band — the synthetic corpus is homogeneous
    natural-ish text, so production-style cutoffs (≈3.5 gibberish,
    ≈4.5 encoded) would put every row in one bucket; real corpora
    re-tune the constants, the plan is unchanged.

    Shape: per-char explode → (doc, char) count — the explode is narrow
    and the FIRST aggregation collapses it to ≤ |alphabet| rows per doc
    before any exchange (map-side partial agg), so the shuffle carries
    O(docs × distinct-chars), not O(total characters). The entropy fold
    is then a second map-side-combinable agg per doc: Σ c·ln c and
    Σ c fused via the identity H = ln(n)/ln 2 − (Σ c·ln c)/(n·ln 2),
    which needs NO per-term p_i division and therefore no window for
    the doc total — one fewer pass than the textbook formula (the
    oracle keeps the textbook window form as the independent twin).
    At 100 TB: two telescoping aggregations, each exchange strictly
    smaller than its input — the same cascade shape as
    graph_degree_hist.
    Reference provenance: none (the reference never measures text
    quality); SURVEY §2 B.11 curation family (round 4).
    """
    d = table(spark, sf_dir, "documents")
    ent = char_entropy(d, "doc_id", "text")
    # bucket on the ROUNDED entropy (round-before-compare, the
    # file-wide rule): the two engines' Σ c·ln(c) accumulation orders
    # differ, and an unrounded threshold compare lets a boundary-ulp
    # doc flip buckets between them
    h6 = F.round("entropy_bits", 6)
    return ent.select(
        "doc_id",
        "n_chars",
        "n_distinct",
        h6.alias("entropy_bits"),
        F.when(h6 < 3.9, "low").when(h6 < 4.1, "mid").otherwise("high").alias(
            "bucket"
        ),
    ).orderBy("doc_id")


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composable per-row character entropy: returns one row per id —
    (id_col, n_chars, n_distinct, entropy_bits) with entropy UNROUNDED
    (callers choose presentation rounding / bucket boundaries). Two
    telescoping aggregations; the char explode collapses to one row per
    (id, char) before any exchange (see text_char_entropy)."""
    # split('', '') yields [''] on both engines — without the filter an
    # EMPTY document would count one phantom character (n_chars=1,
    # entropy 0) instead of dropping out; with it, empty rows simply
    # produce no output row (entropy of zero characters is undefined).
    freq = (
        df.select(id_col, F.explode(F.split(text_col, "")).alias("_ch"))
        .filter(F.col("_ch") != "")
        .groupBy(id_col, "_ch")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return freq.groupBy(id_col).agg(
        F.sum("_c").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (
            (
                F.log(F.sum("_c").cast("double"))
                - F.sum(
                    F.col("_c").cast("double") * F.log(F.col("_c").cast("double"))
                )
                / F.sum("_c").cast("double")
            )
            / F.log(F.lit(2.0))
        ).alias("entropy_bits"),
    )


# The shipped tokenizer model for text_bpe_apply: the 8-merge table
# text_bpe_train learns from the sf0.01 fixture corpus, frozen as a
# constant the way a production tokenizer ships its trained merges.
# Applying a FIXED model (rather than re-training per corpus) is what
# makes the encode a pure per-row map — and what makes it exactly
# SQL-expressible for the oracle.
_BPE_APPLY_MODEL: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]
# Symbol delimiters: every symbol is wrapped as US+sym+RS, so a merge
# rule (l, r) is the literal string US+l+RS+US+r+RS and REPLACE's
# leftmost-first, resume-after-replacement scan is EXACTLY the greedy
# BPE fold (validated against the pure-Python fold over the whole
# fixture vocabulary in tests). Control characters never occur in the
# fixture text (and any real corpus would strip them at ingest).
_US, _RS = "\x1f", "\x1e"


def _bpe_encoded_sql() -> str:
    """DuckDB expression: `text` encoded by the shipped merge table —
    the chained-REPLACE greedy fold shared by text_bpe_apply and
    text_fertility_by_lang."""
    e = "regexp_replace(text, '([^ ])', chr(31) || '\\1' || chr(30), 'g')"
    for left, right in _BPE_APPLY_MODEL:
        pat = f"chr(31) || '{left}' || chr(30) || chr(31) || '{right}' || chr(30)"
        rep = f"chr(31) || '{left}{right}' || chr(30)"
        e = f"REPLACE({e}, {pat}, {rep})"
    return e


def _bpe_encode_expr() -> Column:
    """Spark twin of _bpe_encoded_sql (narrow, all JVM string builtins)."""
    enc = F.regexp_replace(F.col("text"), "([^ ])", _US + "$1" + _RS)
    for left, right in _BPE_APPLY_MODEL:
        enc = F.replace(
            enc,
            F.lit(_US + left + _RS + _US + right + _RS),
            F.lit(_US + left + right + _RS),
        )
    return enc


def _bpe_apply_oracle() -> str:
    e = _bpe_encoded_sql()
    return f"""
    WITH enc AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_words,
             LENGTH(REPLACE(text, ' ', ''))                          AS n_chars_ns,
             {e} AS e
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS INTEGER)                                  AS n_words,
           CAST(LENGTH(e) - LENGTH(REPLACE(e, CHR(31), '')) AS INTEGER) AS n_tokens,
           ROUND(CAST(n_chars_ns AS DOUBLE)
                 / NULLIF(LENGTH(e) - LENGTH(REPLACE(e, CHR(31), '')), 0), 6)
             AS chars_per_token
    FROM enc
    ORDER BY doc_id
    """


@register("text_bpe_apply", oracle=_bpe_apply_oracle())
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a shipped BPE tokenizer model to the corpus — the third
    leg of the tokenizer story (text_bpe_train learns the merges,
    text_pack_sequences packs the budgets; this op ENCODES, which is
    what actually runs over 100 TB of training text).

    Plan shape: the whole encode is ONE narrow projection — each
    document's text is rewritten to delimiter-wrapped symbols
    (regexp_replace) and the 8 merge rules apply as a chain of literal
    REPLACEs (module constant _BPE_APPLY_MODEL), all JVM string
    builtins inside whole-stage codegen. No explode, no vocab join, no
    shuffle, no UDF: at 100 TB this costs exactly one pass over the
    text column. Word boundaries need no special casing — a space
    interrupts the delimiter pattern, so merges can never cross words.
    REPLACE's leftmost-first scan = the greedy BPE fold (validated
    symbol-by-symbol against the pure-Python reference over the whole
    fixture vocabulary in tests/test_rag_ops.py::
    test_bpe_apply_replace_chain_matches_fold). Per doc: word count,
    encoded token count, chars-per-token compression — the number a
    data-budget plan is written in.
    Reference provenance: none (the reference delegates tokenization
    to OpenAI's server side); north-star tokenizer surface.
    """
    d = table(spark, sf_dir, "documents")
    enc = _bpe_encode_expr()
    n_tokens = F.length(enc) - F.length(F.replace(enc, F.lit(_US), F.lit("")))
    n_words = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    n_chars_ns = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            n_tokens.alias("n_tokens"),
            F.when(
                n_tokens > 0,
                F.round(n_chars_ns.cast("double") / n_tokens, 6),
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_fertility_by_lang",
    oracle=f"""
    WITH raw AS (
      SELECT lang,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_words,
             LENGTH(REPLACE(text, ' ', ''))                          AS n_chars_ns,
             {_bpe_encoded_sql()} AS e
      FROM documents
    ), enc AS (
      SELECT lang, n_words, n_chars_ns,
             LENGTH(e) - LENGTH(REPLACE(e, CHR(31), '')) AS n_tokens
      FROM raw
    )
    SELECT lang,
           COUNT(*)                        AS n_docs,
           CAST(SUM(n_words) AS BIGINT)    AS total_words,
           CAST(SUM(n_tokens) AS BIGINT)   AS total_tokens,
           ROUND(SUM(n_tokens)::DOUBLE / GREATEST(SUM(n_words), 1), 6)
                                           AS fertility,
           ROUND(SUM(n_chars_ns)::DOUBLE / GREATEST(SUM(n_tokens), 1), 6)
                                           AS chars_per_token
    FROM enc
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY (tokens per word) per language — the
    standard multilingual-tokenizer equity measurement (a tokenizer
    trained on English text encodes other languages into more tokens
    per word, so those corpora cost more budget per document; this is
    the table that decision is read from). Applies the SAME shipped
    merge table as text_bpe_apply (_BPE_APPLY_MODEL via
    _bpe_encode_expr — one model definition) and rolls up by the
    corpus's ground-truth `lang` column.

    Plan shape: ONE narrow codegen projection (the chained-REPLACE
    encode + integer counters) followed by ONE map-side-combinable
    hash agg to ≤|langs| rows — the shuffle carries a handful of
    integer partial sums regardless of corpus size. Fertility is a
    RATIO OF SUMS (corpus-weighted, exactly associative integers) —
    never an average of per-doc ratios, which would weight a 3-word
    doc equal to a 3,000-word one and drift under repartitioning.

    Reference provenance: none (tokenization happens server-side at
    OpenAI); north-star tokenizer-surface extension, the per-language
    read of text_bpe_apply's corpus-level chars-per-token.
    """
    d = table(spark, sf_dir, "documents")
    enc = _bpe_encode_expr()
    n_tokens = F.length(enc) - F.length(F.replace(enc, F.lit(_US), F.lit("")))
    n_words = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    n_chars_ns = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    per_doc = d.select(
        "lang",
        n_words.alias("n_words"),
        n_chars_ns.alias("n_chars_ns"),
        n_tokens.alias("n_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_tokens") / F.greatest(F.sum("n_words"), F.lit(1)), 6
            ).alias("fertility"),
            F.round(
                F.sum("n_chars_ns") / F.greatest(F.sum("n_tokens"), F.lit(1)), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# Gopher rule constants (Rae et al. 2021, table A1 — the published
# thresholds; the two line-shape rules are omitted because the fixture
# corpus is single-line, see docstring).
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 3.0, 10.0
_GOPHER_MIN_ALPHA = 0.8
_GOPHER_MAX_SYM = 0.1
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with", "a", "in"]
_GOPHER_MIN_STOPS = 2


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, text,
             LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '') AS words
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             LEN(words) AS n_words,
             ROUND(CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(words, t -> LENGTH(t))), 0)
                        AS DOUBLE)
                   / GREATEST(LEN(words), 1), 6)                          AS mean_word_len,
             ROUND(CAST(LEN(LIST_FILTER(words, t -> REGEXP_MATCHES(t, '[a-zA-Z]')))
                        AS DOUBLE) / GREATEST(LEN(words), 1), 6)          AS alpha_frac,
             ROUND(CAST(LEN(REGEXP_EXTRACT_ALL(text, '#'))
                        + LEN(REGEXP_EXTRACT_ALL(text, '\\.\\.\\.')) AS DOUBLE)
                   / GREATEST(LEN(words), 1), 6)                          AS sym_ratio,
             ({" + ".join(f"CASE WHEN LIST_CONTAINS(words, '{s}') THEN 1 ELSE 0 END" for s in _GOPHER_STOPS)})
                                                                          AS stop_hits
      FROM w
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac, sym_ratio, stop_hits,
           CAST(n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS} AS INTEGER) AS r_wordcount,
           CAST(mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL} AS INTEGER) AS r_meanlen,
           CAST(alpha_frac >= {_GOPHER_MIN_ALPHA} AS INTEGER)  AS r_alpha,
           CAST(sym_ratio <= {_GOPHER_MAX_SYM} AS INTEGER)     AS r_symbol,
           CAST(stop_hits >= {_GOPHER_MIN_STOPS} AS INTEGER)   AS r_stopword,
           CAST(n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
                AND mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}
                AND alpha_frac >= {_GOPHER_MIN_ALPHA}
                AND sym_ratio <= {_GOPHER_MAX_SYM}
                AND stop_hits >= {_GOPHER_MIN_STOPS} AS INTEGER) AS keep
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule bundle (Rae et al. 2021, appendix A1) —
    the published rule set most LLM curation pipelines start from,
    emitted with PER-RULE diagnostics rather than one opaque score
    (text_quality_score is the composed-score sibling): word-count
    bounds [50, 100k], mean word length [3, 10], ≥80% of words contain
    an alphabetic character, symbol-to-word ratio (# and ellipsis)
    ≤0.1, and ≥2 distinct stopwords present. The two line-shape rules
    (≤90% bullet-started, ≤30% ellipsis-ended lines) are omitted: the
    fixture corpus is single-line so they would be compile-time
    constants; the four retained content rules all discriminate on it.

    Spark shape: ONE narrow scan → ONE traversal of the words array —
    a single F.aggregate whose struct accumulator carries (word count,
    char sum, alpha-word count, distinct-stopword BITMASK, OR'd per
    element and popcounted at the end) — unpacked through F.inline (a
    1-row Generate that CollapseProject cannot inline through, so the
    traversal really runs once per row; naive per-stat expressions get
    duplicated by projection collapse and re-split the text up to 13×,
    which the analyzed plan of the first draft showed). regexp_count
    for symbols rides the same projection; no shuffle except the output
    sort. At 100 TB this is the cheapest possible pass (scan-bound,
    zero exchanges), which is exactly why these rules run FIRST in real
    pipelines — cheap rules prune before expensive dedup. Ratios are
    rounded to 6 dp before the threshold comparison so the rule bits
    are identical cross-engine.
    """
    d = table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda t: t != "")

    def stop_bit(t):
        e = F.lit(0)
        for i, s in enumerate(_GOPHER_STOPS):
            e = F.when(t == s, F.lit(1 << i)).otherwise(e)
        return e

    acc0 = F.struct(
        F.lit(0).alias("n"),
        F.lit(0).alias("chars"),
        F.lit(0).alias("alpha"),
        F.lit(0).alias("stopmask"),
    )
    stats = F.aggregate(
        words,
        acc0,
        lambda acc, t: F.struct(
            (acc["n"] + 1).alias("n"),
            (acc["chars"] + F.length(t)).alias("chars"),
            (acc["alpha"] + t.rlike("[a-zA-Z]").cast("int")).alias("alpha"),
            acc["stopmask"].bitwiseOR(stop_bit(t)).alias("stopmask"),
        ),
    )
    n_sym = F.regexp_count("text", F.lit("#")) + F.regexp_count(
        "text", F.lit(r"\.\.\.")
    )
    unpacked = d.select("doc_id", n_sym.alias("n_sym"), F.inline(F.array(stats)))
    safe_n = F.greatest(F.col("n"), F.lit(1))
    m = unpacked.select(
        "doc_id",
        F.col("n").alias("n_words"),
        F.round(F.col("chars").cast("double") / safe_n, 6).alias("mean_word_len"),
        F.round(F.col("alpha").cast("double") / safe_n, 6).alias("alpha_frac"),
        F.round(F.col("n_sym").cast("double") / safe_n, 6).alias("sym_ratio"),
        F.bit_count("stopmask").cast("int").alias("stop_hits"),
    )
    r_wordcount = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    r_meanlen = F.col("mean_word_len").between(_GOPHER_MIN_MWL, _GOPHER_MAX_MWL)
    r_alpha = F.col("alpha_frac") >= _GOPHER_MIN_ALPHA
    r_symbol = F.col("sym_ratio") <= _GOPHER_MAX_SYM
    r_stopword = F.col("stop_hits") >= _GOPHER_MIN_STOPS
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_frac",
        "sym_ratio",
        "stop_hits",
        r_wordcount.cast("int").alias("r_wordcount"),
        r_meanlen.cast("int").alias("r_meanlen"),
        r_alpha.cast("int").alias("r_alpha"),
        r_symbol.cast("int").alias("r_symbol"),
        r_stopword.cast("int").alias("r_stopword"),
        (r_wordcount & r_meanlen & r_alpha & r_symbol & r_stopword)
        .cast("int")
        .alias("keep"),
    ).orderBy("doc_id")
