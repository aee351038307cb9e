"""UDF / UDAF / UDTF surface (SURVEY.md §2 B.10).

One operator per Python-extension mechanism, each with a note on when it
is the WRONG tool (the reference ran everything row-at-a-time in Python;
the engine treats Python as the escape hatch, not the path):

  * plain Python UDF — row-at-a-time serde; kept ONLY as the
    deterministic id-formatter (A11's replacement) to demonstrate the
    API. Never in a hot loop.
  * pandas UDF (Series→Series) — Arrow-vectorized, the acceptable path.
  * applyInPandas grouped map — per-group pandas, shuffles the group.
  * pandas UDAF (grouped agg) — partial-agg-free; whole group in memory.
  * Python UDTF (Spark 4) — table function, lateral-joined.
"""

from __future__ import annotations

# typing.Iterator/Tuple (not collections.abc / PEP 585): with postponed
# annotations Spark resolves UDF type hints from MODULE globals via
# typing.get_type_hints, and its signature matcher wants typing generics.
from typing import Iterator, Tuple  # noqa: UP035

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf

from ..io_util import table
from ..registry import register


@register(
    "udf_python_scalar",
    oracle="""
    SELECT doc_id,
           doc_id || '_text_chunk_' || n_chars AS vec_id_str
    FROM documents
    ORDER BY doc_id
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic vector-id formatter — replaces the reference's
    wall-clock-salted f"{doc}_text_chunk_{timestamp}" (A11,
    parser_pinecone_storage.py:147) with content-derived ids."""

    @F.udf(T.StringType())
    def make_id(doc_id, n_chars):
        # NULL propagates like the oracle's || (an f-string would
        # render the literal 'None' — a non-NULL string the oracle
        # never produces)
        if doc_id is None or n_chars is None:
            return None
        return f"{doc_id}_text_chunk_{n_chars}"

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", make_id("doc_id", "n_chars").alias("vec_id_str")).orderBy(
        "doc_id"
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS discounted
    FROM lineitem
    WHERE l_orderkey < 2000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: numpy does the same IEEE multiply the
    SQL engine would, so no rounding is needed for parity."""

    @F.pandas_udf(T.DoubleType())
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6) AS v_norm
    FROM events
    ORDER BY event_id
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped map): the whole group
    arrives as one pandas frame. pandas std(ddof=1) == STDDEV_SAMP, and
    a 1-row group (std undefined) emits NULL exactly like STDDEV_SAMP —
    nullable Float64, not the NaN a plain float64 series would smuggle
    through Arrow. Rounding happens Spark-side: pandas .round is
    half-even, F.round is SQL's half-away (same rule as udf_pandas_iter)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        sd = v.std(ddof=1)
        if pd.isna(sd):
            pdf["v_norm"] = pd.array([pd.NA] * len(v), dtype="Float64")
        else:
            pdf["v_norm"] = ((v - v.mean()) / sd).astype("Float64")
        return pdf[["event_id", "event_type", "v_norm"]]

    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return (
        ev.groupBy("event_type")
        .applyInPandas(normalize, schema="event_id long, event_type string, v_norm double")
        .withColumn("v_norm", F.round("v_norm", 6))
        .orderBy("event_id")
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value * TRY_CAST(json_extract_string(props, '$.k') AS INTEGER))
                 / SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)), 6)
             AS weighted_mean
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas UDAF (GROUPED_AGG): weighted mean of value by the JSON
    props weight. Unlike built-in aggregates there is NO partial
    aggregation — the whole group ships to one worker; fine for bounded
    groups, a skew hazard otherwise (prefer sum(v*w)/sum(w) built-ins at
    scale — which is exactly what the oracle does)."""

    @F.pandas_udf(T.DoubleType())
    def wmean(v: pd.Series, w: pd.Series) -> float:
        den = w.sum()  # pandas sum skips NaN; all-NULL weights → 0.0
        if pd.isna(den) or den == 0:
            return None  # SUM(v*k)/SUM(k) is NULL when no usable weight
        return float((v * w).sum() / den)

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        # try_cast (cond_try_cast's poisoned-row rule): untrusted JSON
        F.get_json_object("props", "$.k").try_cast("int").alias("k"),
    )
    return (
        ev.groupBy("event_type")
        .agg(F.round(wmean("value", "k"), 6).alias("weighted_mean"))
        .orderBy("event_type")
    )


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice) * (1 - l_discount), 6) AS scored
    FROM lineitem
    WHERE l_orderkey < 2000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator pandas UDF (Iterator[Series]→Iterator[Series]): the
    shape for per-worker one-time init (model/tokenizer load) amortized
    across every Arrow batch of the partition — the init here is a
    stand-in constant, the point is it runs once per partition, not once
    per batch or row. numpy sqrt/multiply are the same IEEE ops the SQL
    engine does; rounded like the rest of the float surface."""
    @F.pandas_udf(T.DoubleType())
    def scored_iter(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        weight = 1.0  # one-time per-partition init point
        for price, disc in it:
            # unrounded: pandas .round is half-even, F.round below is SQL's
            yield np.sqrt(price) * (1 - disc) * weight

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(scored_iter("l_extendedprice", "l_discount"), 6).alias("scored"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 + l_tax) AS gross
    FROM lineitem
    WHERE l_quantity > 45
    ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (Iterator[DataFrame]→Iterator[DataFrame]): whole-row
    batch transform that can change cardinality — the per-partition
    filter+derive here is what the multimodal decode path uses for real
    work. Filtering inside the UDF means the parquet scan can NOT push
    the quantity predicate down — acceptable only when the predicate
    genuinely needs Python; the oracle's WHERE shows the pushdown-able
    equivalent."""
    def gross_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[pdf["l_quantity"] > 45].copy()
            # unrounded on purpose: numpy does the identical IEEE ops, so
            # raw doubles match the oracle exactly; ROUND here would trip
            # the Spark-rounds-shortest-repr vs DuckDB-rounds-binary trap
            out["gross"] = out["l_extendedprice"] * (1 + out["l_tax"])
            yield out[["l_orderkey", "l_linenumber", "l_quantity", "gross"]]

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax"
    )
    return (
        li.mapInPandas(
            gross_batches,
            schema="l_orderkey long, l_linenumber int, l_quantity double, gross double",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@udtf(returnType="chunk_id int, chunk string")
class SplitChunksUDTF:
    """Python UDTF (Spark 4): emit fixed-size chunks of the input text —
    the UDTF form of the A9 splitter. One process-side generator per row;
    use the pure-SQL chunker (rag_chunk_text) when the logic fits
    expressions."""

    def eval(self, text: str):  # noqa: D102 — contract defined by Spark
        if text is None:
            # match the SQL/DataFrame chunkers: GREATEST(NULL-21, 0)=0
            # on both engines, so NULL text yields ONE (0, NULL) chunk
            # row — returning nothing here was a row-count divergence
            yield 0, None
            return
        size, overlap = 120, 20
        stride = size - overlap
        # same suffix rule as rag.chunk_text: no start inside the final
        # `overlap` chars — such a chunk is a strict suffix of the
        # previous one (fully redundant)
        i, chunk_id = 0, 0
        while i <= max(len(text) - overlap - 1, 0):
            yield chunk_id, text[i : i + size]
            chunk_id += 1
            i += stride


@register(
    "udtf_split_explode",
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             UNNEST(generate_series(0, GREATEST(LENGTH(text) - 21, 0), 100)) AS start
      FROM documents
      WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(start // 100 AS INTEGER)                    AS chunk_id,
           SUBSTRING(text, CAST(start AS INTEGER) + 1, 120) AS chunk
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
)
def udtf_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF lateral join producing the same rows as the SQL chunker."""
    spark.udtf.register("split_chunks", SplitChunksUDTF)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk
        FROM docs_for_udtf d, LATERAL split_chunks(d.text) c
        ORDER BY d.doc_id, c.chunk_id
        """
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem
    WHERE l_discount >= 0.08
    ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Iterator[RecordBatch]→Iterator[RecordBatch]): the
    zero-copy sibling of mapInPandas — batches stay columnar Arrow end
    to end, no pandas materialization, which matters when the Python
    step is itself vectorized (pyarrow.compute here) and the columns are
    wide binary/multimodal payloads pandas would copy. Same caveat as
    mapInPandas: the in-UDF filter forgoes parquet pushdown, justified
    only when the logic genuinely needs Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def net_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            t = pa.Table.from_batches([batch])
            t = t.filter(pc.greater_equal(t["l_discount"], pa.scalar(0.08)))
            net = pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
            out = pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_linenumber": t["l_linenumber"],
                    "net": net,
                }
            )
            yield from out.to_batches()

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(
        net_batches, schema="l_orderkey long, l_linenumber int, net double"
    ).orderBy("l_orderkey", "l_linenumber")


@udtf(returnType="tok_idx: int, token: string, char_start: int")
class TokenOffsetsUDTF:
    """Tokenizer-with-offsets table function: one row per
    space-delimited token with its position and CHARACTER OFFSET into
    the original text — the running-state-per-row shape a UDTF
    expresses naturally (the offset accumulates across yielded rows;
    a pure projection cannot carry it without a window). Single-space
    split by construction so the DuckDB oracle reproduces offsets with
    a windowed length sum."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        pos = 0
        for i, tok in enumerate(text.split(" ")):
            yield i, tok, pos
            pos += len(tok) + 1


@register(
    "udtf_token_offsets",
    oracle="""
    WITH parts AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks
      FROM documents WHERE doc_id < 20
    ), exploded AS (
      SELECT doc_id,
             CAST(i - 1 AS INTEGER) AS tok_idx,
             toks[i]                AS token
      FROM parts, UNNEST(generate_series(1, LEN(toks))) AS t(i)
    )
    SELECT doc_id, tok_idx, token,
           CAST(COALESCE(SUM(LENGTH(token) + 1) OVER (
                  PARTITION BY doc_id ORDER BY tok_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS INTEGER) AS char_start
    FROM exploded
    ORDER BY doc_id, tok_idx
    """,
)
def udtf_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second UDTF face (B.10): LATERAL tokenization with character
    offsets — content-dependent fan-out where each yielded row carries
    RUNNING STATE (the cumulative offset), the shape that separates a
    table function from a projection+explode (udtf_split_explode's
    chunker is fixed-stride and stateless). The oracle reproduces the
    offsets with a windowed length sum — same rows, two idioms, which
    is itself the point: span annotations (NER offsets, PII spans,
    highlight ranges) need exactly this token→offset map.
    Scale: the UDTF runs inside the lateral join per partition — no
    shuffle before the presentation sort; fan-out bounded by document
    length.
    Reference provenance: Docling's per-document span extraction (A3)
    as a pluggable table function."""
    spark.udtf.register("token_offsets", TokenOffsetsUDTF)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "docs_for_token_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.tok_idx, s.token, s.char_start
        FROM docs_for_token_udtf d, LATERAL token_offsets(d.text) s
        ORDER BY d.doc_id, s.tok_idx
        """
    )
