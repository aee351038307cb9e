"""RAG pipeline operators: chunk → metadata → embed → ingest
(SURVEY.md §2 B.8; reference pipeline parser_pinecone_storage.py:130-183).

The reference chunks with RecursiveCharacterTextSplitter(3000, 200)
(parser_pinecone_storage.py:133), truncates metadata title[:50] /
content[:200] (parser_pinecone_storage.py:149-153), and embeds each
chunk with one OpenAI HTTP call per chunk (parser_pinecone_storage.py:148).

Engine restatement:
  * chunking is PURE SQL — sequence+posexplode+substring; no UDF, no
    Python, fully pushed into codegen. At 100 TB this is a narrow map
    (no shuffle at all): each document expands to its chunks in place.
  * the embedder is a deterministic hashing embedder as a Pandas UDF —
    Arrow-batched (thousands of chunks per Python call), replacing the
    reference's one-RPC-per-chunk (batch=1) anti-pattern. Swapping in a
    real model endpoint keeps the same batched shape.
  * fixture chunk params are 120/20 (FIXTURES.md §3) so the 150-500 char
    fixture docs yield multiple chunks; the reference's 3000/200 are the
    library defaults.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io_util import table
from ..registry import register
from ..schemas import FIXTURE_EMBED_DIM

CHUNK_SIZE = 3000  # reference default, parser_pinecone_storage.py:133
CHUNK_OVERLAP = 200
FIXTURE_CHUNK_SIZE = 120
FIXTURE_CHUNK_OVERLAP = 20
# THE fixed retrieval query, single definition: _bm25_scores, the
# _BM25_CTES oracle twin, and rag_answer_select's span scorer (both
# sides) all interpolate from here so the terms can never desync
QUERY_TERMS = ("vector", "join", "scan")
_STRIDE = FIXTURE_CHUNK_SIZE - FIXTURE_CHUNK_OVERLAP
# generate_series upper bound for the chunk starts (see chunk_text's
# suffix rule): len(text) - overlap - 1, floored at 0
_CHUNK_BOUND_SQL = f"GREATEST(LENGTH(text) - {FIXTURE_CHUNK_OVERLAP + 1}, 0)" 
EMBED_DIM = FIXTURE_EMBED_DIM  # fixture embedding dim (FIXTURES.md §3)


def chunk_text(
    docs: DataFrame,
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    *,
    carry: tuple[str, ...] = ("doc_id",),
    keep_text: bool = False,
) -> DataFrame:
    """(carry…, text) → (carry…, [text,] chunk_id, chunk_text); stride
    size-overlap. The single chunk-explode idiom — every chunking
    operator (rag_chunk_text, rag_metadata_project, rag_answer_select,
    the ingest pipeline) routes through here so the chunking convention
    lives in exactly one place.

    Chunk starts at 0, stride, 2*stride, … while start ≤ len(text) -
    overlap - 1; the final chunk may be short. The upper bound stops
    one position short of len-1 ON PURPOSE: a start inside the final
    `overlap` characters would emit a chunk that is a strict SUFFIX of
    the previous one (start ≥ len-overlap ⇒ the previous chunk already
    covers through len) — a fully redundant chunk that duplicated
    vectors in the embed index and wasted context-pack budget (measured
    18.6% of fixture docs before the fix; RecursiveCharacterTextSplitter
    does not emit it either). Coverage is unaffected: every removed
    start's span is contained in its predecessor. Pure built-ins:
    sequence → posexplode → substring. Narrow (shuffle-free) at any
    scale. keep_text=True keeps the full document text on each chunk
    row (for per-doc projections like titles) instead of dropping it.
    """
    stride = size - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - F.lit(overlap + 1), F.lit(0)),
        F.lit(stride),
    )
    return (
        docs.select(*carry, "text", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            *carry,
            *(["text"] if keep_text else []),
            "chunk_id",
            F.expr(f"substring(text, start + 1, {size})").alias("chunk_text"),
        )
    )


@register(
    "rag_chunk_text",
    oracle=f"""
    WITH starts AS (
      SELECT doc_id, text,
             UNNEST(generate_series(0, {_CHUNK_BOUND_SQL}, {_STRIDE})) AS start
      FROM documents
    )
    SELECT doc_id,
           CAST(start // {_STRIDE} AS INTEGER)              AS chunk_id,
           SUBSTRING(text, CAST(start AS INTEGER) + 1, {FIXTURE_CHUNK_SIZE}) AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
)
def rag_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-scale chunking (120/20 → stride 100). No trailing sort:
    the output is one row per chunk (~corpus-sized), the driver compares
    order-insensitively, and a global sort of a 100 TB chunk set would
    be the plan's only shuffle."""
    docs = table(spark, sf_dir, "documents")
    return chunk_text(docs, FIXTURE_CHUNK_SIZE, FIXTURE_CHUNK_OVERLAP)


@register(
    "rag_metadata_project",
    oracle=f"""
    WITH starts AS (
      SELECT doc_id, text,
             UNNEST(generate_series(0, {_CHUNK_BOUND_SQL}, {_STRIDE})) AS start
      FROM documents
    )
    SELECT doc_id,
           CAST(start // {_STRIDE} AS INTEGER)           AS chunk_id,
           SUBSTRING(text, 1, 50)                        AS title,
           SUBSTRING(SUBSTRING(text, CAST(start AS INTEGER) + 1, {FIXTURE_CHUNK_SIZE}), 1, 200) AS snippet,
           'text'                                        AS content_type
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
)
def rag_metadata_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-metadata projection with the reference's truncations:
    title[:50], content[:200], content_type='text'
    (parser_pinecone_storage.py:149-153). The title is computed from the
    document text carried through the explode — no join back to
    documents, no shuffle, no trailing sort (order-insensitive compare)."""
    docs = table(spark, sf_dir, "documents")
    return chunk_text(
        docs, FIXTURE_CHUNK_SIZE, FIXTURE_CHUNK_OVERLAP, keep_text=True
    ).select(
        "doc_id",
        "chunk_id",
        F.substring("text", 1, 50).alias("title"),
        F.substring("chunk_text", 1, 200).alias("snippet"),
        F.lit("text").alias("content_type"),
    )


@F.pandas_udf(T.ArrayType(T.FloatType()))
def hash_embed_udf(texts: pd.Series) -> pd.Series:
    """Deterministic hashing embedder (replaces the reference's OpenAI
    ada-002 call, parser_pinecone_storage.py:33,148): token → sha256
    bucket → counts → L2 normalize. sha256, not Python hash(), so the
    result is stable across processes/PYTHONHASHSEED (FIXTURES.md §5).
    Arrow-batched: one Python invocation per ~10k rows, not per chunk.
    """

    def embed(text: str) -> list[float]:
        vec = np.zeros(EMBED_DIM, dtype=np.float64)
        if text:
            for tok in text.split():
                h = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
                vec[h % EMBED_DIM] += 1.0
        n = float(np.sqrt((vec * vec).sum()))
        if n > 0:
            vec /= n
        return [float(x) for x in vec]

    return texts.map(embed)


def embed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composable chunk-embedding pipeline: documents → fixture chunks →
    (doc_id, chunk_id, embedding array<float>). The array form is the
    internal API every vector op consumes; the REGISTERED rag_embed_hash
    face below flattens it, because the r6 driver run proved the driver's
    pandas canonicalizer runs even on rows-only ops and dies on
    array<float> cells ('unhashable type: numpy.ndarray')."""
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, FIXTURE_CHUNK_SIZE, FIXTURE_CHUNK_OVERLAP)
    return chunks.select(
        "doc_id", "chunk_id", hash_embed_udf("chunk_text").alias("embedding")
    )


@register("rag_embed_hash")  # embedder output is engine-defined → rows-only; unit-tested
def rag_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunks → L2-normalized dim-64 embeddings, projected to a FLAT
    driver-canonicalizable summary per chunk: vector dim, 6-dp L2 norm,
    and an md5 fingerprint over the 6-dp-formatted components (pins the
    vector bit-for-bit without emitting an array<float> the driver's
    pandas canonicalizer cannot hash — the r6 ERR on this op). The
    array-returning form stays available as embed_chunks (api.py).
    SURVEY §5.2.6 pin: determinism + unit norm + dim asserted in
    tests/test_rag_ops.py::test_hash_embedder_deterministic_and_normalized."""
    emb = embed_chunks(spark, sf_dir)
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "doc_id",
        "chunk_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x * x)), 6)
        .alias("l2_norm"),
        # decimal(9,6) cast, not format_string/format_number: the cast
        # renders shortest-repr HALF_UP (BigDecimal.valueOf semantics —
        # the same pipeline F.round uses), which a Python replay can
        # reproduce exactly via Decimal(repr(x)).quantize(HALF_UP);
        # format_string('%.6f') rounds the double's EXACT binary
        # expansion instead and can differ from that replay on
        # 6th-decimal ties, and format_number inserts grouping commas
        # (the join separator) for |x| >= 1000
        F.md5(
            F.concat_ws(
                ",", F.transform(dvec, lambda x: x.cast("decimal(9,6)").cast("string"))
            )
        ).alias("emb_md5"),
    )


@register(
    "rag_search_format",
    oracle="""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0
    ), topk AS (
      SELECT vec_id, sim,
             ROW_NUMBER() OVER (ORDER BY ROUND(sim, 6) DESC, vec_id) AS rank
      FROM scored QUALIFY rank <= 5
    )
    SELECT COALESCE(STRING_AGG(
             '**Document Title**: ' || SUBSTRING(d.text, 1, 50) ||
             chr(10) || '**Content**: ' || SUBSTRING(d.text, 1, 200),
             chr(10) || chr(10) || '---' || chr(10) || chr(10)
             ORDER BY t.rank
           ), '') AS context
    FROM topk t JOIN documents d ON d.doc_id = t.vec_id
    """,
)
def rag_search_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's rag_search output shape end-to-end (A18,
    ra/agent.py:122-129): top-5 cosine matches formatted as
    '**Document Title**: {title}\\n**Content**: {content}' joined by
    '\\n\\n---\\n\\n' — retrieval + metadata + presentation in one
    single-row query. Title/content use the reference's A12 truncations
    (50/200). Query vector = embeddings row 0; matches join documents
    on id for their text."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    from .vectors import knn_topk

    top = knn_topk(e.filter(F.col("vec_id") != 0), q, k=5)
    d = table(spark, sf_dir, "documents")
    joined = top.join(d, top.neighbor_id == d.doc_id).select(
        "rank",
        F.concat(
            F.lit("**Document Title**: "),
            F.substring("text", 1, 50),
            F.lit("\n**Content**: "),
            F.substring("text", 1, 200),
        ).alias("block"),
    )
    return joined.agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("rank", "block"))
            ).getField("block"),
            "\n\n---\n\n",
        ).alias("context")
    )


@register(
    "rag_pipeline_ingest",
    oracle=f"""
    WITH starts AS (
      SELECT doc_id,
             UNNEST(generate_series(0, {_CHUNK_BOUND_SQL}, {_STRIDE})) AS start,
             text
      FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           -- unit norm for token-bearing chunks, 0 for token-free ones
           -- (hash_embed returns the zero vector there) — the caveat the
           -- old literal 1.0 left unencoded
           ROUND(AVG(CASE WHEN LEN(TRIM(SUBSTRING(text, CAST(start AS INTEGER) + 1, {FIXTURE_CHUNK_SIZE}))) > 0
                          THEN 1.0 ELSE 0.0 END), 3) AS avg_norm
    FROM starts
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def rag_pipeline_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 3-task Airflow DAG (list → extract → chunk/embed/
    store, parser_pinecone_storage.py:185-216) as ONE lazy Spark lineage:
    documents → chunk → embed → metadata-project → per-doc summary.
    No XCom, no temp files: stage boundaries are Spark stages. The whole
    pipeline is narrow until the final per-doc aggregation (one shuffle).
    Cites: A1→A15 restatement, SURVEY §3.1.

    Oracle-checkable because the pipeline's observable summary is
    deterministic: n_chunks is the chunker arithmetic, and the embedder
    L2-normalizes, so every non-empty chunk's norm is exactly 1.0 —
    the oracle therefore ALSO verifies the normalization invariant
    end-to-end through the real pandas-UDF path.
    """
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, FIXTURE_CHUNK_SIZE, FIXTURE_CHUNK_OVERLAP)
    embedded = chunks.select(
        "doc_id",
        "chunk_id",
        hash_embed_udf("chunk_text").alias("embedding"),
    )
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        embedded.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.round(
                F.avg(F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x * x))), 3
            ).alias("avg_norm"),
        )
        .orderBy("doc_id")
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for the fixed 3-term query over `documents` —
    per-term tf COLUMNS over the token array (no explode; each term is a
    `size(filter(toks))` expression inside codegen), corpus stats
    (N, avglen, per-term df) as one tiny scalar aggregate broadcast
    back. BM25 k1=1.2, b=0.75, RSJ idf. Shared by
    rag_hybrid_bm25_cosine and rag_rrf_fusion."""
    terms = list(QUERY_TERMS)
    k1, b = 1.2, 0.75

    d = (
        table(spark, sf_dir, "documents")
        # doc 0 is the QUERY document (its embedding is the vec_id=0
        # query every cosine side excludes) — it must not occupy a BM25
        # rank slot or inflate the corpus stats either, or it skews
        # every fused ranking while being unretrievable itself
        .filter(F.col("doc_id") != 0)
        .select(
            "doc_id",
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("toks"),
        )
    )

    def tf_of(term):
        # NB: a 2-arg lambda would be treated as (element, index) by
        # F.filter — close over the term instead
        return F.size(F.filter(F.col("toks"), lambda x: x == term))

    tf_cols = [tf_of(t).alias(f"tf{i + 1}") for i, t in enumerate(terms)]
    tf = d.select("doc_id", F.size("toks").alias("dl"), *tf_cols)
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avglen"),
        *[
            F.count(F.when(F.col(f"tf{i + 1}") > 0, 1)).alias(f"df{i + 1}")
            for i in range(len(terms))
        ],
    )
    joined = tf.crossJoin(F.broadcast(stats))
    bm25 = None
    for i in range(len(terms)):
        tf_i, df_i = F.col(f"tf{i + 1}"), F.col(f"df{i + 1}")
        idf = F.log(1 + (F.col("n") - df_i + 0.5) / (df_i + 0.5))
        part = idf * tf_i * (k1 + 1) / (tf_i + k1 * (1 - b + b * F.col("dl") / F.col("avglen")))
        bm25 = part if bm25 is None else bm25 + part
    return joined.select("doc_id", bm25.alias("bm25"))


def _cosine_to_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cos) — cosine of every OTHER corpus vector against the
    query vector (vec_id=0), query broadcast (A18's scoring, in-engine).
    The query row itself is excluded, matching rag_search_format /
    vec_cosine_similarity — retrieving the query's own document as a
    perfect self-match would pollute every fused ranking."""
    from .vectors import as_double, cosine

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id"),
            cosine(as_double("embedding"), as_double("q_emb")).alias("cos"),
        )
    )


# Shared oracle CTE fragments for the retrieval-fusion family: BM25
# (fixed 3-term query) and cosine-to-query-vector scores. Kept as one
# source of truth so rag_hybrid_bm25_cosine and rag_rrf_fusion can't
# drift apart on the scoring definition.
_BM25_CTES = f"""tok AS (SELECT doc_id,
                        LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> x <> '') AS toks
                 FROM documents
                 WHERE doc_id <> 0),
    tf AS (SELECT doc_id,
                  LEN(toks) AS dl,
                  LEN(LIST_FILTER(toks, x -> x = '{QUERY_TERMS[0]}')) AS tf1,
                  LEN(LIST_FILTER(toks, x -> x = '{QUERY_TERMS[1]}')) AS tf2,
                  LEN(LIST_FILTER(toks, x -> x = '{QUERY_TERMS[2]}')) AS tf3
           FROM tok),
    stats AS (SELECT COUNT(*) AS n,
                     AVG(dl)  AS avglen,
                     COUNT(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
                     COUNT(CASE WHEN tf2 > 0 THEN 1 END) AS df2,
                     COUNT(CASE WHEN tf3 > 0 THEN 1 END) AS df3
              FROM tf),
    scored AS (SELECT doc_id,
                      LN(1 + (n - df1 + 0.5) / (df1 + 0.5))
                        * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avglen))
                    + LN(1 + (n - df2 + 0.5) / (df2 + 0.5))
                        * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avglen))
                    + LN(1 + (n - df3 + 0.5) / (df3 + 0.5))
                        * tf3 * 2.2 / (tf3 + 1.2 * (0.25 + 0.75 * dl / avglen)) AS bm25
               FROM tf, stats),
    vec AS (SELECT e.vec_id,
                   LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cos
            FROM embeddings e
            CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id <> 0)"""


@register(
    "rag_hybrid_bm25_cosine",
    oracle=f"""
    WITH {_BM25_CTES},
    mx AS (SELECT MAX(bm25) AS mb FROM scored)
    SELECT s.doc_id,
           ROUND(s.bm25 / mx.mb, 6)                           AS bm25_norm,
           ROUND(v.cos, 6)                                    AS cos_sim,
           ROUND(0.5 * s.bm25 / mx.mb + 0.5 * v.cos, 6)       AS hybrid_score
    FROM scored s, mx, vec v
    WHERE v.vec_id = s.doc_id
    ORDER BY hybrid_score DESC, s.doc_id
    LIMIT 10
    """,
)
def rag_hybrid_bm25_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — BM25 keyword relevance fused 50/50 with vector
    cosine, the ranking production RAG actually serves (pure-vector
    search misses exact-term matches; pure-BM25 misses paraphrase).
    Generalizes the reference's pure-cosine rag_search
    (ra/agent.py:108-133, top_k at :117, cosine metric at :25).

    Spark shape: BM25 as per-term tf COLUMNS over the token array (no
    explode — 3 query terms → 3 `size(filter(...))` expressions inside
    codegen), corpus statistics (N, avg length, per-term df, max score)
    as two tiny scalar aggregates broadcast back via crossJoin, vector
    side joined on id with the broadcast query vector. The corpus is
    scanned narrow, shuffles only for the two scalar aggregates and the
    final top-10 — at 100 TB the stats come from a metadata pass and
    everything else stays next to the scan. BM25: k1=1.2, b=0.75,
    idf=ln(1+(N-df+0.5)/(df+0.5)) (Robertson-Sparck Jones form)."""
    scored = _bm25_scores(spark, sf_dir)
    mx = scored.agg(F.max("bm25").alias("mb"))
    vec = _cosine_to_query(spark, sf_dir)
    return (
        scored.crossJoin(F.broadcast(mx))
        .join(vec, scored.doc_id == vec.vec_id)
        .select(
            "doc_id",
            F.round(F.col("bm25") / F.col("mb"), 6).alias("bm25_norm"),
            F.round("cos", 6).alias("cos_sim"),
            F.round(0.5 * F.col("bm25") / F.col("mb") + 0.5 * F.col("cos"), 6).alias(
                "hybrid_score"
            ),
        )
        .orderBy(F.col("hybrid_score").desc(), "doc_id")
        .limit(10)
    )


@register(
    "rag_rrf_fusion",
    oracle=f"""
    WITH {_BM25_CTES},
    rb AS (SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY ROUND(bm25, 6) DESC, doc_id) AS r_bm25
           FROM scored),
    rc AS (SELECT vec_id,
                  ROW_NUMBER() OVER (ORDER BY ROUND(cos, 6) DESC, vec_id) AS r_cos
           FROM vec)
    SELECT rb.doc_id,
           CAST(rb.r_bm25 AS BIGINT) AS r_bm25,
           CAST(rc.r_cos  AS BIGINT) AS r_cos,
           ROUND(1.0 / (60 + rb.r_bm25) + 1.0 / (60 + rc.r_cos), 6) AS rrf_score
    FROM rb JOIN rc ON rc.vec_id = rb.doc_id
    ORDER BY rrf_score DESC, rb.doc_id
    LIMIT 10
    """,
)
def rag_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR'09; k=60) of the
    BM25 ranking and the vector-cosine ranking — the OTHER standard
    hybrid-retrieval combiner (rag_hybrid_bm25_cosine is the linear
    score fusion; RRF is what Elasticsearch/Vespa/Weaviate default to
    because it needs no score normalization, only ranks).

    Spark shape: both score frames come from the shared helpers
    (_bm25_scores / _cosine_to_query — narrow, codegen'd), each ranked
    with a row_number window; given identical rankings, integer ranks
    make the fused score bit-identical across engines — so cross-engine
    agreement reduces to the rankings themselves. Both rankings order
    on ROUND(score, 6) with doc_id as tie-break: near-equal scores
    whose last ulp differs between DuckDB's LN and the JVM's Math.log
    could flip adjacent ranks cross-engine (ADVICE r1, low); rounding
    shrinks that flip window from every-ulp-boundary to the rare pair
    straddling a 1e-6 boundary. NOT fully eliminated — parity holds at
    fixture scale, and the tie-break keeps any residual flip
    deterministic within each engine. The two global rank
    windows are single-partition at fixture scale; in production each
    query ranks only its own candidate pool (top-k per retriever,
    exactly how RRF is served), so the window is per-query-partition,
    never corpus-global.
    Reference provenance: generalizes A18's single-ranker top-k
    (ra/agent.py:115-119) to multi-ranker fusion."""
    from pyspark.sql.window import Window as W

    scored = _bm25_scores(spark, sf_dir)
    vec = _cosine_to_query(spark, sf_dir)
    rb = scored.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.round(F.col("bm25"), 6).desc(), "doc_id"))
        .cast("bigint")
        .alias("r_bm25"),
    )
    rc = vec.select(
        "vec_id",
        F.row_number()
        .over(W.orderBy(F.round(F.col("cos"), 6).desc(), "vec_id"))
        .cast("bigint")
        .alias("r_cos"),
    )
    rrf = 1.0 / (F.lit(60) + F.col("r_bm25")) + 1.0 / (F.lit(60) + F.col("r_cos"))
    return (
        rb.join(rc, rb.doc_id == rc.vec_id)
        .select("doc_id", "r_bm25", "r_cos", F.round(rrf, 6).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )


# Shared retrieval block for rag_answer_select / rag_context_pack —
# BM25 global top-5 (rounded-rank window) joined back to documents and
# chunk-exploded with (doc_id, doc_rank) carried. ONE definition each
# side so the retrieval convention (k, tie-break, rounding, stride)
# cannot drift between the two consumers.
_TOP5_STRIDE = FIXTURE_CHUNK_SIZE - FIXTURE_CHUNK_OVERLAP
_TOP5_CHUNKS_CTES = f"""{_BM25_CTES},
    top5 AS (
      SELECT doc_id, doc_rank FROM (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY ROUND(bm25, 6) DESC, doc_id)
                    AS INTEGER) AS doc_rank
        FROM scored)
      WHERE doc_rank <= 5
    ),
    starts AS (
      SELECT d.doc_id, t.doc_rank, d.text,
             UNNEST(generate_series(0,
                                    GREATEST(LENGTH(d.text)
                                             - {FIXTURE_CHUNK_OVERLAP + 1}, 0),
                                    {_TOP5_STRIDE})) AS start
      FROM documents d JOIN top5 t USING (doc_id)
    ),
    chunks AS (
      SELECT doc_id, doc_rank,
             CAST(start // {_TOP5_STRIDE} AS INTEGER)         AS chunk_id,
             SUBSTRING(text, CAST(start AS INTEGER) + 1,
                       {FIXTURE_CHUNK_SIZE})                  AS chunk_text
      FROM starts
    )"""


def _bm25_top5_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of _TOP5_CHUNKS_CTES: (doc_id, doc_rank,
    chunk_id, chunk_text) for the BM25 top-5 documents."""
    from pyspark.sql.window import Window as W

    scored = _bm25_scores(spark, sf_dir)
    top5 = scored.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.round(F.col("bm25"), 6).desc(), "doc_id"))
        .alias("doc_rank"),
    ).filter(F.col("doc_rank") <= 5)
    docs = table(spark, sf_dir, "documents").join(F.broadcast(top5), "doc_id")
    return chunk_text(
        docs, FIXTURE_CHUNK_SIZE, FIXTURE_CHUNK_OVERLAP, carry=("doc_id", "doc_rank")
    )


@register(
    "rag_answer_select",
    oracle=f"""
    WITH {_TOP5_CHUNKS_CTES},
    cscore AS (
      SELECT doc_id, doc_rank, chunk_id, chunk_text,
             CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(chunk_text), ' '),
                                  x -> x IN {tuple(QUERY_TERMS)!r}))
                  AS INTEGER) AS n_match
      FROM chunks
    )
    SELECT doc_rank, doc_id, chunk_id AS answer_chunk, chunk_text AS answer, n_match
    FROM (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY n_match DESC, chunk_id) AS rn
          FROM cscore)
    WHERE rn = 1
    ORDER BY doc_rank
    """,
)
def rag_answer_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractive Q&A over retrieved chunks — the reference frontend's
    Q&A panel posts to /ask_question
    (copilot-app/app/components/QandAInteraction/QandAInteraction.tsx:23)
    but no backend implements it (SURVEY §0: the missing second
    backend); this op models it deterministically: retrieve the top-5
    documents by BM25 (the shared _bm25_scores helper — fixed 3-term
    query), chunk each with the fixture RAG chunker (120/20, same
    stride as rag_chunk_text), score every chunk by lexical overlap
    with the query terms, and return the best chunk per document as
    the extractive answer span.

    Spark shape: the corpus-wide work is exactly the BM25 scoring scan
    (narrow, codegen); the global top-5 rank window is the same
    candidate-pool-sized window as rag_rrf_fusion (per-query in
    production, never corpus-global); everything after it touches FIVE
    documents — broadcast-joined back to `documents`, chunk-exploded
    in place (no shuffle), and the best-chunk window partitions by
    doc_id over ≤5 × ~4 chunks. n_match is an integer, so the pick is
    bit-identical cross-engine; ties break on chunk_id.
    """
    from pyspark.sql.window import Window as W

    terms = list(QUERY_TERMS)
    chunks = _bm25_top5_chunks(spark, sf_dir)
    n_match = F.size(
        F.filter(
            F.split(F.lower("chunk_text"), " "), lambda x: x.isin(terms)
        )
    )
    cscore = chunks.select(
        "doc_id", "doc_rank", "chunk_id", "chunk_text", n_match.alias("n_match")
    )
    best = W.partitionBy("doc_id").orderBy(F.col("n_match").desc(), "chunk_id")
    return (
        cscore.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            "doc_rank",
            "doc_id",
            F.col("chunk_id").alias("answer_chunk"),
            F.col("chunk_text").alias("answer"),
            "n_match",
        )
        .orderBy("doc_rank")
    )


@register(
    "rag_context_pack",
    oracle=f"""
    WITH {_TOP5_CHUNKS_CTES},
    toks AS (
      SELECT doc_id, doc_rank, chunk_id, chunk_text,
             CAST(LEN(LIST_FILTER(STRING_SPLIT(chunk_text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM chunks
    ),
    packed AS (
      -- CAST AS BIGINT: DuckDB's windowed SUM over BIGINT is HUGEINT →
      -- float64 in its pandas conversion, vs Spark's non-null int64 —
      -- the r6 driver hash-FAIL on this op (the only dtype-divergent
      -- column in the output; values matched exactly)
      SELECT doc_rank, doc_id, chunk_id, n_tokens, chunk_text,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_rank, chunk_id) AS BIGINT)
               AS cum_tokens,
             CAST(ROW_NUMBER() OVER (ORDER BY doc_rank, chunk_id) AS INTEGER)
               AS ctx_rank
      FROM toks
    )
    SELECT ctx_rank, doc_rank, doc_id, chunk_id, n_tokens, cum_tokens, chunk_text
    FROM packed WHERE cum_tokens <= 160
    ORDER BY ctx_rank
    """,
)
def rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted context assembly — the step between retrieval and
    the LLM call that the reference performs implicitly by truncating
    matches to top-k and concatenating (ra/agent.py:117-129, k=100
    straight into the prompt): retrieve the top-5 documents by BM25
    (shared _bm25_scores), chunk them with the fixture chunker, and
    greedily pack chunks in (doc_rank, chunk_id) order until the next
    chunk would push the running whitespace-token total past the
    160-token context budget. Cumulative totals are integer token
    counts, so the cut is bit-exact cross-engine.

    Spark shape: identical corpus-side plan to rag_answer_select (BM25
    scoring scan + global top-5 rank window); the packing window orders
    ~25 chunk rows of FIVE broadcast-joined documents — per-query scale
    in production, never corpus-global. The cumsum-prefix filter is
    monotone, so `cum <= budget` IS the greedy fill.
    """
    from pyspark.sql.window import Window as W

    budget = 160
    chunks = _bm25_top5_chunks(spark, sf_dir)
    n_tokens = F.size(
        F.filter(F.split("chunk_text", " "), lambda x: x != "")
    ).cast("long")
    toks = chunks.select(
        "doc_rank", "doc_id", "chunk_id", "chunk_text", n_tokens.alias("n_tokens")
    )
    pack_order = W.orderBy("doc_rank", "chunk_id")
    packed = toks.select(
        F.row_number().over(pack_order).alias("ctx_rank"),
        "doc_rank",
        "doc_id",
        "chunk_id",
        "n_tokens",
        F.sum("n_tokens").over(pack_order.rowsBetween(W.unboundedPreceding, 0))
        .alias("cum_tokens"),
        "chunk_text",
    )
    return (
        packed.filter(F.col("cum_tokens") <= budget)
        .select("ctx_rank", "doc_rank", "doc_id", "chunk_id",
                "n_tokens", "cum_tokens", "chunk_text")
        .orderBy("ctx_rank")
    )
