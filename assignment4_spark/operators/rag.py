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

CHUNK_SIZE = 3000  # reference default, parser_pinecone_storage.py:133
CHUNK_OVERLAP = 200
FIXTURE_CHUNK_SIZE = 120
FIXTURE_CHUNK_OVERLAP = 20
EMBED_DIM = 64  # fixture embedding dim (FIXTURES.md §3)


def chunk_text(docs: DataFrame, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """(doc_id, text) → (doc_id, chunk_id, chunk_text); stride size-overlap.

    Chunk starts at 0, stride, 2*stride, … while start < len(text); the
    final chunk may be short. Pure built-ins: sequence → posexplode →
    substring. Narrow (shuffle-free) at any scale.
    """
    stride = size - overlap
    starts = F.sequence(
        F.lit(0), F.greatest(F.length("text") - F.lit(1), F.lit(0)), F.lit(stride)
    )
    return (
        docs.select("doc_id", "text", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            "chunk_id",
            F.expr(f"substring(text, start + 1, {size})").alias("chunk_text"),
        )
    )


@register(
    "rag_chunk_text",
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             UNNEST(generate_series(0, GREATEST(LENGTH(text) - 1, 0), 100)) AS start
      FROM documents
    )
    SELECT doc_id,
           CAST(start // 100 AS INTEGER)                    AS chunk_id,
           SUBSTRING(text, CAST(start AS INTEGER) + 1, 120) AS chunk_text
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
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             UNNEST(generate_series(0, GREATEST(LENGTH(text) - 1, 0), 100)) AS start
      FROM documents
    )
    SELECT doc_id,
           CAST(start // 100 AS INTEGER)                 AS chunk_id,
           SUBSTRING(text, 1, 50)                        AS title,
           SUBSTRING(SUBSTRING(text, CAST(start AS INTEGER) + 1, 120), 1, 200) AS snippet,
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
    stride = FIXTURE_CHUNK_SIZE - FIXTURE_CHUNK_OVERLAP
    starts = F.sequence(
        F.lit(0), F.greatest(F.length("text") - F.lit(1), F.lit(0)), F.lit(stride)
    )
    return docs.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_id", "start")
    ).select(
        "doc_id",
        "chunk_id",
        F.substring("text", 1, 50).alias("title"),
        F.substring(
            F.expr(f"substring(text, start + 1, {FIXTURE_CHUNK_SIZE})"), 1, 200
        ).alias("snippet"),
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


@register("rag_embed_hash")  # embedder output is engine-defined → rows-only; unit-tested
def rag_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunks → L2-normalized array<float> embeddings (dim 64)."""
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, FIXTURE_CHUNK_SIZE, FIXTURE_CHUNK_OVERLAP)
    return chunks.select(
        "doc_id", "chunk_id", hash_embed_udf("chunk_text").alias("embedding")
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
             ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rank
      FROM scored QUALIFY rank <= 5
    )
    SELECT STRING_AGG(
             '**Document Title**: ' || SUBSTRING(d.text, 1, 50) ||
             chr(10) || '**Content**: ' || SUBSTRING(d.text, 1, 200),
             chr(10) || chr(10) || '---' || chr(10) || chr(10)
             ORDER BY t.rank
           ) AS context
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
    oracle="""
    SELECT doc_id,
           CAST(LEN(GENERATE_SERIES(0, GREATEST(LENGTH(text) - 1, 0), 100)) AS BIGINT)
             AS n_chunks,
           CAST(1.0 AS DOUBLE) AS avg_norm
    FROM documents
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
        F.substring("chunk_text", 1, 200).alias("snippet"),
        F.lit("text").alias("content_type"),
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
