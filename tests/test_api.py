"""The composable api.* functions over NON-fixture DataFrames (custom
column names, inline data) — proves the public API is not silently
coupled to the fixture schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment4_spark import api


def test_chunk_and_embed_compose(spark):
    docs = spark.createDataFrame(
        [(7, "alpha beta gamma " * 30)], "doc_id long, text string"
    )
    chunks = api.chunk_text(docs, size=100, overlap=10)
    out = chunks.select(
        "doc_id", "chunk_id", api.hash_embed_udf("chunk_text").alias("emb")
    ).collect()
    assert len(out) > 3
    assert all(len(r.emb) == 64 for r in out)


def test_knn_topk_custom_columns(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(20)],
        "item_id long, vec array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "qid long, qvec array<double>"
    )
    hits = api.knn_topk(
        corpus,
        queries,
        k=3,
        id_col="item_id",
        emb_col="vec",
        query_id_col="qid",
        query_emb_col="qvec",
    ).collect()
    assert len(hits) == 3
    assert hits[0].neighbor_id == 0 and abs(hits[0].sim_r - 1.0) < 1e-9


def test_minhash_pairs_custom_columns(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = [
        (1, base),
        (2, base + "with one extra tail"),  # near-dup of 1
        (3, "completely different content about spark catalyst tungsten " * 5),
    ]
    df = spark.createDataFrame(rows, "uid long, body string")
    pairs = api.minhash_lsh_pairs(df, id_col="uid", text_col="body").collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
    assert pairs[0].jaccard > 0.6


def test_simhash_pairs_custom_columns(spark):
    base = "one two three four five six seven eight nine ten " * 6
    df = spark.createDataFrame(
        [(1, base), (2, base + "eleven"), (3, "zzz yyy xxx www vvv " * 10)],
        "uid long, body string",
    )
    pairs = api.simhash_pairs(df, id_col="uid", text_col="body").collect()
    assert (1, 2) in {(r.doc_a, r.doc_b) for r in pairs}


def test_cosine_reusable_expression(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [3.0, 4.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = df.select(api.cosine(F.col("a"), F.col("b")).alias("s")).collect()
    assert abs(got[0].s - 1.0) < 1e-9
    assert abs(got[1].s) < 1e-9
    assert got[2].s is None  # zero vector → NULL, never DIVIDE_BY_ZERO
