"""The composable api.* functions over NON-fixture DataFrames (custom
column names, inline data) — proves the public API is not silently
coupled to the fixture schema."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from assignment4_spark import api


@pytest.mark.slow
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


def test_interpolate_single_hour_key_no_crash(spark):
    """A key whose observations all fall inside one hour (first not on
    the hour) has ceil_hour(t0) > t1; Spark's sequence() throws on
    inverted bounds, so the grid must gate it and return an empty grid
    for that key instead of raising (ADVICE r3, medium). Keys spanning
    hours are unaffected."""
    from assignment4_spark import api

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:15:00", 1.0),
            (1, "2024-01-01 10:45:00", 3.0),
            (2, "2024-01-01 10:30:00", 2.0),
            (2, "2024-01-01 12:30:00", 6.0),
        ],
        "user_id int, ts string, value double",
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "value")
    rows = api.interpolate_linear(df).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    assert 1 not in by_key  # no on-grid instants exist for key 1
    assert len(by_key[2]) == 2  # 11:00 and 12:00
    interp = {str(r.grid_ts): r.value_interp for r in by_key[2]}
    assert abs(interp["2024-01-01 11:00:00"] - 3.0) < 1e-9
    assert abs(interp["2024-01-01 12:00:00"] - 5.0) < 1e-9


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


def test_sessionize_composable(spark):
    MIN = 60 * 1_000_000  # µs
    rows = [
        ("u1", 0 * MIN), ("u1", 10 * MIN), ("u1", 50 * MIN),  # gap>30m → 2 sessions
        ("u2", 5 * MIN),
    ]
    df = spark.createDataFrame(rows, "uid string, t long")
    got = {
        (r.uid, r.session_id): (r.n_events, r.duration_us)
        for r in api.sessionize(df, key_col="uid", ts_us_col="t").collect()
    }
    assert got == {
        ("u1", 1): (2, 10 * MIN),
        ("u1", 2): (1, 0),
        ("u2", 1): (1, 0),
    }


def test_bottomk_by_hash_deterministic(spark):
    df = spark.createDataFrame([(i, f"g{i % 3}") for i in range(500)], "k long, grp string")
    a = api.bottomk_by_hash(df, key_col="k", k=10, keep_cols=["grp"]).collect()
    b = api.bottomk_by_hash(df.repartition(13), key_col="k", k=10, keep_cols=["grp"]).collect()
    assert [r.k for r in a] == [r.k for r in b]  # partitioning-invariant
    assert [r.rk for r in a] == list(range(1, 11))


def test_quantize_int8_audit_bounds(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [10.0])],
        "vid long, v array<float>",
    )
    rows = {r.vid: r for r in api.quantize_int8_audit(df, id_col="vid", vec_col="v").collect()}
    assert 2 not in rows  # zero vector excluded
    assert rows[3].q_sum == 127 and rows[3].max_abs_err == 0.0
    assert rows[1].n_dims == 3
    # dequantization error bounded by one quantization step = 1/scale
    assert rows[1].max_abs_err <= 2.0 / 127 + 1e-9


def test_phash_buckets_duplicates_share_hash(spark):
    df = spark.createDataFrame(
        [(1, "same bytes"), (2, "same bytes"), (3, "different bytes")],
        "pid long, blob string",
    )
    rows = {r.pid: r for r in api.phash_buckets(df, id_col="pid", blob_col="blob").collect()}
    assert rows[1].phash == rows[2].phash and rows[1].n_bucket == 2
    assert len(rows[1].phash) == 64 and set(rows[1].phash) <= {"0", "1"}


def test_phash_buckets_custom_decoder_real_lumas(spark):
    """The decoder-hook path: blobs decoded by a caller-supplied
    bytes->64-lumas function through the Arrow mapInPandas stage, with
    the same threshold/bucket algebra as the fake path. Raw 64-byte
    "grayscale images": a flat image thresholds to all zeros (no cell
    exceeds the mean); a half-bright image sets exactly its bright
    cells; duplicates share buckets."""
    flat = bytes([7] * 64)
    half = bytes([200] * 32 + [10] * 32)
    df = spark.createDataFrame(
        [(1, flat), (2, half), (3, half)], "pid long, blob binary"
    )
    rows = {
        r.pid: r
        for r in api.phash_buckets(
            df, id_col="pid", blob_col="blob", decoder=lambda b: list(b[:64])
        ).collect()
    }
    assert rows[1].phash == "0" * 64  # v*64 > sum is false when all equal
    assert rows[2].phash == "1" * 32 + "0" * 32
    assert rows[2].n_bucket == 2 and rows[2].phash == rows[3].phash
    assert rows[1].n_bucket == 1


def test_phash_buckets_pil_decoder(spark):
    """True PIL decode on a generated 8x8 PNG — skipped where Pillow is
    not installed (this CI container); the hook itself is real code."""
    import io

    pytest.importorskip("PIL")
    from PIL import Image

    from assignment4_spark.operators.multimodal import pil_luma_decoder

    def png(lumas):
        img = Image.new("L", (8, 8))
        img.putdata(lumas)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    bright_half = [200] * 32 + [10] * 32
    df = spark.createDataFrame(
        [(1, png(bright_half)), (2, png([50] * 64))], "pid long, blob binary"
    )
    rows = {
        r.pid: r
        for r in api.phash_buckets(
            df, id_col="pid", blob_col="blob", decoder=pil_luma_decoder
        ).collect()
    }
    assert rows[1].phash == "1" * 32 + "0" * 32
    assert rows[2].phash == "0" * 64


def test_upsert_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """upsert_merge_parquet must leave parquet files in buckets with no
    updated keys byte-for-byte untouched (mtime+size), rewrite the
    touched buckets, and produce latest-wins contents."""
    import os

    from pyspark.sql import functions as F

    from assignment4_spark.operators.vectors import upsert_merge_parquet

    out = str(tmp_path / "target")
    n_buckets = 4
    base = spark.createDataFrame(
        [(k, 1, f"v{k}") for k in range(1, 9)], "k long, ver long, payload string"
    )
    base.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("k")), F.lit(n_buckets))
    ).write.partitionBy("bucket").parquet(out)

    updates = spark.createDataFrame([(3, 2, "v3-new")], "k long, ver long, payload string")
    touched = {
        r[0]
        for r in updates.select(
            F.pmod(F.xxhash64(F.col("k")), F.lit(n_buckets))
        ).collect()
    }

    def snapshot():
        snap = {}
        for root, _, files in os.walk(out):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    snap[p] = (st.st_mtime_ns, st.st_size)
        return snap

    before = snapshot()
    upsert_merge_parquet(out, updates, "k", "ver", "payload", n_buckets=n_buckets)
    after = snapshot()

    for p, meta in before.items():
        bucket = int(p.split("bucket=")[1].split("/")[0])
        if bucket not in touched:
            assert after.get(p) == meta, f"untouched bucket {bucket} was rewritten: {p}"
    rows = {r.k: r for r in spark.read.parquet(out).collect()}
    assert rows[3].payload == "v3-new" and rows[3].ver == 2
    assert len(rows) == 8 and rows[1].payload == "v1"


def test_pagerank_source_only_vertex_keeps_teleport(spark):
    """On a general directed edge list, a vertex with out-edges but no
    in-edges must stay in the result with exactly the teleport mass
    (ADVICE r3: the inner-join loop used to drop it after round 1)."""
    df = spark.createDataFrame([(10, 20), (20, 30), (30, 20)], "src long, dst long")
    ranks = {r.v: r.rank for r in api.pagerank(df, iters=3).collect()}
    assert set(ranks) == {10, 20, 30}
    assert abs(ranks[10] - 0.15) < 1e-12
    # mass flowing 10->20 and 30->20 makes 20 the heaviest
    assert ranks[20] > ranks[30] > ranks[10]


def test_rest_feed_reader_retry_pacing_and_isolation():
    """Reader-direct (no Spark): 429 pages are retried exactly once and
    succeed; calls within a reader respect the min-interval pacer; a
    permanently-failing page yields one error row instead of raising."""
    import time as _time

    from assignment4_spark.sources.rest_feed import (
        RestFeedReader,
        _PageRange,
        fake_fetch,
    )

    r = RestFeedReader({"pages": "10", "rate_per_sec": "200", "max_retries": "2"})
    rows = list(r.read(_PageRange(0, 10)))
    # 100 records total, ids 0..99; malformed where id % 7 == 3
    assert len(rows) == 100
    good = [x for x in rows if x[3] is None]
    bad = [x for x in rows if x[3] == "malformed item"]
    assert len(bad) == len([i for i in range(100) if i % 7 == 3])
    assert all(x[1] == f"Item {x[0]}" for x in good)
    # retry: pages 0 and 5 rate-limit their first attempt -> 12 calls
    assert len(r.call_log) == 12
    assert [(p, a) for p, a, _ in r.call_log if a == 1] == [(0, 1), (5, 1)]
    # pacing: consecutive calls at least ~1/rate apart (scheduler slack down)
    gaps = [b[2] - a[2] for a, b in zip(r.call_log, r.call_log[1:])]
    assert min(gaps) >= (1.0 / 200) * 0.8, gaps

    def dead_fetch(page, attempt):
        return 503, ""

    r2 = RestFeedReader({"pages": "1", "max_retries": "2"}, fetch=dead_fetch)
    rows2 = list(r2.read(_PageRange(0, 1)))
    assert rows2 == [(None, None, 0, "fetch failed: status 503")]
    assert len(r2.call_log) == 3  # initial + 2 retries, then isolation

    # default fetcher is deterministic: same page, same attempt, same body
    assert fake_fetch(2, 0) == fake_fetch(2, 0)


def test_rest_feed_reader_isolates_weird_payload_shapes():
    """A fetcher handing back a list body, a string items field, or
    non-dict items must produce error ROWS — never an uncaught
    TypeError/AttributeError killing the task."""
    import json

    from assignment4_spark.sources.rest_feed import RestFeedReader, _PageRange

    def weird_fetch(page, attempt):
        bodies = {
            0: json.dumps([1, 2, 3]),  # list body -> ['items'] TypeError
            1: json.dumps({"items": "oops"}),  # items not a list
            2: json.dumps({"items": ["str-item", {"id": 20, "title": "T"}]}),
        }
        return 200, bodies[page]

    r = RestFeedReader({"pages": "3"}, fetch=weird_fetch)
    rows = list(r.read(_PageRange(0, 3)))
    assert [x[3] is not None for x in rows[:2]] == [True, True]  # pages 0,1 -> payload errors
    assert rows[2] == (None, None, 2, "malformed item")
    assert rows[3] == (20, "T", 2, None)


def test_phash_buckets_decoder_isolates_bad_blobs(spark):
    """NULL blobs and decoder exceptions become NULL-phash rows, not
    task failures; healthy rows in the same batch are unaffected."""
    def decoder(b):
        if len(b) < 64:
            raise ValueError("truncated image")
        return list(b[:64])

    df = spark.createDataFrame(
        [(1, bytes([9] * 64)), (2, None), (3, b"tiny")],
        "pid long, blob binary",
    )
    rows = {
        r.pid: r
        for r in api.phash_buckets(
            df, id_col="pid", blob_col="blob", decoder=decoder
        ).collect()
    }
    assert rows[1].phash == "0" * 64
    assert rows[2].phash is None and rows[3].phash is None


def test_bloom_prefilter_no_false_negatives(spark):
    fact = spark.createDataFrame([(i,) for i in range(2000)], "fk long")
    dim = spark.createDataFrame([(i,) for i in range(0, 2000, 100)], "dk long")
    kept = {r.fk for r in api.bloom_prefilter(fact, "fk", dim, "dk").collect()}
    assert set(range(0, 2000, 100)) <= kept  # every true match survives
    assert len(kept) < 2000  # and the filter actually sheds rows


def test_pagerank_known_graph(spark):
    """Star graph a-b, a-c, a-d (undirected): the hub must outrank the
    leaves, all ranks positive, and by symmetry the three leaves tie."""
    und = [("a", "b"), ("a", "c"), ("a", "d")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    ranks = {r.v: r.rank for r in api.pagerank(edges, iters=3).collect()}
    assert set(ranks) == {"a", "b", "c", "d"}
    assert all(v > 0 for v in ranks.values())
    assert ranks["a"] > ranks["b"]
    assert abs(ranks["b"] - ranks["c"]) < 1e-12 and abs(ranks["c"] - ranks["d"]) < 1e-12


def test_triangle_count_known_graphs(spark):
    """K4 has exactly 4 triangles; adding a pendant edge changes nothing."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4, "u long, v long")
    assert api.triangle_count(edges).collect()[0].n_triangles == 4
    edges2 = spark.createDataFrame(k4 + [(3, 9)], "u long, v long")
    assert api.triangle_count(edges2).collect()[0].n_triangles == 4


def test_weighted_sample_ares_biased_and_custom_columns(spark):
    """With weights 1000 vs 1, heavy rows must dominate the sample; the
    function must work over non-fixture column names."""
    rows = [(i, 1000 if i % 2 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "item long, wt long")
    got = api.weighted_sample_ares(df, id_col="item", weight_col="wt", k=50).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.wt == 1000)
    assert heavy >= 45, f"expected heavy rows to dominate, got {heavy}/50"


def test_canonical_url_expression(spark):
    """Scheme and host are case-insensitive (lowercased); the PATH is
    case-sensitive per RFC 3986 and must survive untouched — /A/b and
    /a/b are distinct resources a whole-URL lowercase would merge.
    Query string and fragment strip; scheme-less strings keep their
    case (no host to normalize)."""
    df = spark.createDataFrame(
        [
            ("HTTPS://EX.com/A/b?q=1#frag",),
            ("https://ex.com/a/b",),
            ("EX.com/NoScheme",),
        ],
        "u string",
    )
    got = [r.c for r in df.select(api.canonical_url(F.col("u")).alias("c")).collect()]
    assert got == ["https://ex.com/A/b", "https://ex.com/a/b", "EX.com/NoScheme"]


def test_interpolate_linear_midpoint(spark):
    """Two observations one hour apart, value 0→10: grid points at the
    endpoints reproduce the observations exactly (the ceil-hour grid
    starts at the first obs when it is already on the hour)."""
    df = spark.createDataFrame(
        [("s1", "2024-01-01 00:00:00", 0.0), ("s1", "2024-01-01 01:00:00", 10.0)],
        "series string, at string, reading double",
    ).select("series", F.col("at").cast("timestamp").alias("at"), "reading")
    out = api.interpolate_linear(
        df, key_col="series", ts_col="at", value_col="reading"
    ).collect()
    vals = {str(r.grid_ts): r.value_interp for r in out}
    assert vals["2024-01-01 00:00:00"] == 0.0
    assert vals["2024-01-01 01:00:00"] == 10.0
    assert len(out) == 2


def test_compose_pdf_structure():
    """compose_pdf emits a structurally valid PDF: every xref offset
    lands exactly on its 'N 0 obj' header, the trailer points at the
    xref table, and the declared stream length matches the stream."""
    from assignment4_spark.operators.multimodal import compose_pdf

    pdf = compose_pdf([("Title", ""), ("Section", "Body text (with parens)")])
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert pdf[xref_at:].startswith(b"xref")
    entries = pdf[xref_at:].split(b"\n")[3:8]  # 5 object entries
    for i, ent in enumerate(entries, 1):
        off = int(ent.split(b" ")[0])
        assert pdf[off:].startswith(f"{i} 0 obj".encode()), (i, ent)
    length = int(pdf.split(b"/Length ", 1)[1].split(b" ", 1)[0].split(b">>")[0])
    stream = pdf.split(b"stream\n", 1)[1].rsplit(b"\nendstream", 1)[0]
    assert len(stream) == length
    assert rb"\(with parens\)" in pdf  # escaping applied


def test_weighted_median_custom_columns(spark):
    # group 'g': values 1..4 with weight 1 except value 4 carries half
    # the total mass alone -> crossing lands on 4's cumulative row only
    # when weights say so.
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 9.0),
            ("h", 10.0, 1.0), ("h", 20.0, 1.0)]
    df = spark.createDataFrame(rows, "grp string, val double, wt double")
    out = {r.grp: r for r in api.weighted_median(df, ["grp"], "val", "wt").collect()}
    assert out["g"].weighted_median == 4.0  # 9/12 of the mass sits on 4
    assert out["g"].total_weight == 12.0
    assert out["h"].weighted_median == 10.0  # cw=1 >= tw/2=1 at the first row
    assert out["h"].total_weight == 2.0


def test_char_entropy_custom_columns(spark):
    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "row_id long, body string"
    )
    out = {r.row_id: r for r in api.char_entropy(df, "row_id", "body").collect()}
    assert out[1].entropy_bits == 0.0 and out[1].n_distinct == 1
    assert abs(out[2].entropy_bits - 1.0) < 1e-12  # two equiprobable chars
    assert abs(out[3].entropy_bits - 2.0) < 1e-12  # four equiprobable chars
    assert out[3].n_chars == 4
    # mixed distribution: 2/4,1/4,1/4 -> 1.5 bits
    df2 = spark.createDataFrame([(9, "aabc")], "row_id long, body string")
    r = api.char_entropy(df2, "row_id", "body").collect()[0]
    assert abs(r.entropy_bits - 1.5) < 1e-12


def test_weighted_median_binned_path_matches_simple(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (f"g{i % 4}", round(rnd.uniform(0, 5000), 2), float(rnd.randint(1, 9)))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "grp string, val double, wt double")
    simple = {
        r.grp: (r.weighted_median, r.total_weight)
        for r in api.weighted_median(df, ["grp"], "val", "wt").collect()
    }
    binned = {
        r.grp: (r.weighted_median, r.total_weight)
        for r in api.weighted_median(
            df, ["grp"], "val", "wt", bin_width=250.0
        ).collect()
    }
    assert simple.keys() == binned.keys()
    for g in simple:
        assert simple[g][0] == binned[g][0], g  # identical crossing value
        assert abs(simple[g][1] - binned[g][1]) < 1e-9, g


def test_weighted_median_fractional_weights_knife_edge(spark):
    """Ten 0.1-weights summing to 0.999…/1.000…2 depending on
    accumulation order used to flip the cw >= tw/2 crossing between the
    plain and binned paths (5.0 vs 6.0); the 9-dp-rounded crossing
    contract makes both paths return the textbook 5.0."""
    rows = [("g", float(v), 0.1) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, val double, wt double")
    plain = api.weighted_median(df, ["grp"], "val", "wt").collect()[0]
    binned = api.weighted_median(
        df, ["grp"], "val", "wt", bin_width=2.5
    ).collect()[0]
    assert plain.weighted_median == 5.0
    assert binned.weighted_median == 5.0


def test_binary_extract_text_utf8_roundtrip(spark):
    """Default (plain-text) parser round-trips blobs; NULL and
    undecodable-parser rows isolate to NULL instead of killing the
    task (the A28 per-record rule)."""
    df = spark.createDataFrame(
        [(1, "hello spark".encode()), (2, "".encode()), (3, None)],
        "bid long, payload binary",
    )
    rows = {
        r.bid: r
        for r in api.binary_extract_text(df, id_col="bid", blob_col="payload").collect()
    }
    assert rows[1].text == "hello spark" and rows[1].n_chars == 11
    assert rows[2].text == "" and rows[2].n_chars == 0
    assert rows[3].text is None and rows[3].n_chars is None


def test_binary_extract_text_raising_parser_isolates(spark):
    def explode_on_two(b: bytes) -> str:
        if b == b"two":
            raise ValueError("corrupt document")
        return b.decode()

    df = spark.createDataFrame(
        [(1, b"one"), (2, b"two")], "bid long, payload binary"
    )
    rows = {
        r.bid: r
        for r in api.binary_extract_text(
            df, id_col="bid", blob_col="payload", parser=explode_on_two
        ).collect()
    }
    assert rows[1].text == "one"
    assert rows[2].text is None and rows[2].n_chars is None


def test_binary_extract_text_pypdf_parser(spark):
    """True PDF parse through the same mapInPandas stage — the PDF is
    generated by compose_pdf (the engine's own sink), so the test is
    a full write→parse round trip. Skipped where pypdf is absent
    (this CI container), same convention as the PIL decoder test."""
    pytest.importorskip("pypdf")
    pdf_bytes = api.compose_pdf([("Title", ""), ("Findings", "spark wins")])
    df = spark.createDataFrame([(1, pdf_bytes)], "bid long, payload binary")
    out = api.binary_extract_text(
        df, id_col="bid", blob_col="payload", parser=api.pypdf_text_parser
    ).collect()[0]
    assert "spark wins" in out.text


def test_compose_markdown_structure():
    md = api.compose_markdown(
        [("Report", ""), ("Intro", "body a"), ("End", "body b")]
    )
    assert md.startswith("# Report")
    assert "## Intro\n\nbody a" in md and "## End\n\nbody b" in md


def test_binary_extract_text_rejects_reserved_id_col(spark):
    """id_col colliding with the fixed output columns must fail fast
    instead of yielding an ambiguous duplicate column downstream."""
    df = spark.createDataFrame([("a", b"x")], "text string, payload binary")
    with pytest.raises(ValueError, match="reserved output column"):
        api.binary_extract_text(df, id_col="text", blob_col="payload")
    df2 = spark.createDataFrame([("a", b"x")], "n_chars string, payload binary")
    with pytest.raises(ValueError, match="reserved output column"):
        api.binary_extract_text(df2, id_col="n_chars", blob_col="payload")


def test_table_cache_evicts_stopped_sessions(spark):
    """A stopped session's cached plans must not be pinned for process
    lifetime: entries whose session no longer has a live JVM context are
    evicted on the next table() access (a WeakKeyDictionary could never
    fire here — the cached DataFrames strongly reference their session)."""
    from assignment4_spark import io_util

    class _Stopped:
        @property
        def sparkContext(self):
            raise RuntimeError("stopped")

    io_util._TABLE_CACHE[-1] = (_Stopped(), {})
    io_util.table(spark, "/root/testdata/sf0.001", "region")
    assert -1 not in io_util._TABLE_CACHE
    assert id(spark) in io_util._TABLE_CACHE


def test_scan_binary_files_content_matches_length_metadata(spark, sf_oracle):
    """Pins the roundtrip equivalence scan_binary_files relies on: the
    loaded blob's content length equals the filesystem length metadata
    for every file (the op's total_bytes sums content, so a broken
    content load could not silently pass on metadata alone)."""
    from assignment4_spark import registry
    from assignment4_spark.operators.scans import _adir

    registry.load_all()
    registry.QUERIES["scan_binary_files"](spark, sf_oracle).collect()
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(_adir(sf_oracle, "documents_text_single"))
    )
    mismatch = blobs.filter(F.length("content") != F.col("length")).count()
    assert mismatch == 0


def test_footer_stats_manifest_edge_files(tmp_path):
    """The shared zone-map manifest builder must survive the two footer
    shapes a planner can meet in the wild: a zero-row part file (omitted
    outright — it contributes no rows, so never opening it is exact) and
    a column chunk written without statistics (None bounds — always-keep
    at plan time, excluded from span arithmetic)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from assignment4_spark.operators.scans import _footer_stats_manifest

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    tbl = pa.table({"k": pa.array([3, 9, 5], type=pa.int64())})
    pq.write_table(tbl, data_dir / "part-normal.parquet")
    pq.write_table(tbl.slice(0, 0), data_dir / "part-empty.parquet")
    pq.write_table(
        tbl, data_dir / "part-nostats.parquet", write_statistics=False
    )
    manifest_path = tmp_path / "manifest.json"
    _footer_stats_manifest(
        str(data_dir), str(manifest_path), {"k": ("min", "max")}
    )
    files = json.load(open(manifest_path))["files"]
    by_name = {e["file"].rsplit("/", 1)[-1]: e for e in files}
    assert "part-empty.parquet" not in by_name
    assert by_name["part-normal.parquet"]["min"] == 3
    assert by_name["part-normal.parquet"]["max"] == 9
    assert by_name["part-nostats.parquet"]["min"] is None
    assert by_name["part-nostats.parquet"]["max"] is None
    assert not manifest_path.with_suffix(".json.tmp").exists()


def test_ks_2sample_custom_columns(spark):
    # A = {1,2,3}, B = {3,4,5}: max CDF gap 2/3 first attained at 2
    rows = [(v, 1) for v in (1.0, 2.0, 3.0)] + [(v, 0) for v in (3.0, 4.0, 5.0)]
    df = spark.createDataFrame(rows, "reading double, from_model_a int")
    out = api.ks_2sample(df, "reading", "from_model_a").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.ks_at_value == 2.0  # tie with 3.0 broken toward the smaller value
    assert abs(r.ks_d - 0.666667) < 1e-9


def test_psi_binned_custom_columns_and_empty_bin(spark):
    # ref mass in bins {0,0,1}, cur mass in {1,2,2}; bin 2 empty on the
    # ref side and bin 0 empty on the cur side — smoothing keeps both
    # finite and the two mirrored bins contribute identical terms.
    rows = [(0, 1, 0), (0, 1, 0), (1, 1, 0), (1, 0, 1), (2, 0, 1), (2, 0, 1)]
    df = spark.createDataFrame(rows, "bucket int, in_ref int, in_cur int")
    out = api.psi_binned(df, 3, bin_col="bucket", ref_col="in_ref", cur_col="in_cur").collect()
    assert [r.bin_id for r in out] == [0, 1, 2]
    assert [r.n_ref for r in out] == [2, 1, 0]
    assert [r.n_cur for r in out] == [0, 1, 2]
    terms = [r.psi_term for r in out]
    assert abs(terms[0] - 0.715306) < 1e-9 and terms[0] == terms[2]
    assert terms[1] == 0.0
    assert all(abs(r.psi_total - 1.430612) < 1e-9 for r in out)


def test_mutual_information_custom_columns(spark):
    # perfectly dependent 2x2 → MI = ln 2 (each cell term rounds to
    # 0.346574 before summing, so the total is 0.693148); independent → 0
    dep = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2)], "label string, feat int"
    )
    out = api.mutual_information(dep, "label", "feat").collect()
    assert {(r.label, r.feat, r.n_xy) for r in out} == {("a", 1, 2), ("b", 2, 2)}
    assert all(abs(r.mi_total - 0.693148) < 1e-9 for r in out)
    indep = spark.createDataFrame(
        [(x, y) for x in ("a", "b") for y in (1, 2)], "label string, feat int"
    )
    out2 = api.mutual_information(indep, "label", "feat").collect()
    assert len(out2) == 4
    assert all(r.mi_total == 0.0 for r in out2)


def test_binary_extract_tables_fake_parser(spark):
    """The pluggable bytes→tables hook: default fake parser output is
    replayed in pure Python as the exact oracle — table count, 1-BASED
    keys, shapes and flattened cells must all match; NULL blobs and
    zero-table blobs contribute no rows without killing the task."""
    from assignment4_spark.operators.multimodal import fake_tables_parser

    blobs = [(1, b"\x02abcdef\x05"), (2, b"\x00xy\x01"), (3, None), (4, b"\x01Q\x02")]
    df = spark.createDataFrame(blobs, "bid long, payload binary")
    got = sorted(
        (
            (r.bid, r.table_no, r.s3_key, r.n_rows, r.n_cols, r.cells_csv)
            for r in api.binary_extract_tables(
                df, id_col="bid", blob_col="payload"
            ).collect()
        )
    )
    want = []
    for bid, blob in blobs:
        if blob is None:
            continue
        for t_no, tbl in enumerate(fake_tables_parser(blob), start=1):
            want.append(
                (
                    bid,
                    t_no,
                    f"doc_{bid}/table_{t_no}.csv",
                    len(tbl),
                    max(len(r) for r in tbl),
                    "\n".join(",".join(r) for r in tbl),
                )
            )
    assert got == sorted(want)
    assert any(t[0] == 1 for t in got), "blob with tables must emit rows"
    assert all(t[0] != 2 for t in got), "zero-table blob emits no rows"
    assert all(t[1] >= 1 for t in got), "table keys are 1-based"


def test_binary_extract_tables_raising_parser_isolates(spark):
    def explode_on_two(b: bytes):
        if b == b"two":
            raise ValueError("corrupt layout")
        return [[["a", "b"], ["c", "d"]]]

    df = spark.createDataFrame([(1, b"one"), (2, b"two")], "bid long, payload binary")
    rows = api.binary_extract_tables(
        df, id_col="bid", blob_col="payload", parser=explode_on_two
    ).collect()
    assert [r.bid for r in rows] == [1]
    assert rows[0].cells_csv == "a,b\nc,d" and rows[0].n_rows == 2


def test_binary_extract_tables_docling_parser(spark):
    """True layout-analysis parse through the same mapInPandas stage.
    Skipped where docling is absent (this CI container), same
    convention as the pypdf/PIL hooks."""
    pytest.importorskip("docling")
    pdf_bytes = api.compose_pdf([("Title", ""), ("Findings", "spark wins")])
    df = spark.createDataFrame([(1, pdf_bytes)], "bid long, payload binary")
    # a text-only PDF has zero tables; the assertion is that the real
    # parser runs through the plumbing without error
    out = api.binary_extract_tables(
        df, id_col="bid", blob_col="payload", parser=api.docling_tables_parser
    ).collect()
    assert all(r.table_no >= 1 for r in out)


def test_binary_extract_tables_rejects_reserved_id_col(spark):
    df = spark.createDataFrame([("a", b"x")], "s3_key string, payload binary")
    with pytest.raises(ValueError, match="reserved output column"):
        api.binary_extract_tables(df, id_col="s3_key", blob_col="payload")


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(
    blobs=st.lists(
        st.one_of(st.none(), st.binary(min_size=0, max_size=64)),
        min_size=1,
        max_size=10,
    )
)
def test_binary_extract_tables_replay_property(spark, blobs):
    """For ANY blob list (including NULLs and empty blobs) the hook's
    output equals a pure-Python replay of the same parser — table
    count, 1-based numbering, shapes, flattened cells."""
    from assignment4_spark.operators.multimodal import fake_tables_parser

    rows = [(i, b) for i, b in enumerate(blobs)]
    df = spark.createDataFrame(rows, "bid long, payload binary")
    got = sorted(
        (r.bid, r.table_no, r.n_rows, r.n_cols, r.cells_csv)
        for r in api.binary_extract_tables(
            df, id_col="bid", blob_col="payload"
        ).collect()
    )
    want = []
    for i, b in rows:
        if b is None:
            continue
        for t_no, tbl in enumerate(fake_tables_parser(b), start=1):
            want.append(
                (
                    i,
                    t_no,
                    len(tbl),
                    max(len(r) for r in tbl),
                    "\n".join(",".join(r) for r in tbl),
                )
            )
    assert got == sorted(want)


def test_interpolate_linear_null_value_observation(spark):
    """A NULL-value observation must be transparent to the bracketing:
    its timestamp may not anchor the slope (the pre-fix bug paired the
    surviving previous VALUE with the skipped NULL row's TIMESTAMP,
    bending the line). Grid points between (00:30, 5) and (03:30, 9)
    with a NULL at 01:30 must sit exactly on the 00:30→03:30 line."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:30:00", 5.0),
        (1, "2024-01-01 01:30:00", None),
        (1, "2024-01-01 03:30:00", 9.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts_s string, value double").select(
        "k", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    out = {
        r.grid_ts.strftime("%H:%M"): r.value_interp
        for r in api.interpolate_linear(df, key_col="k").collect()
    }
    slope_per_h = 4.0 / 3.0
    assert abs(out["01:00"] - (5.0 + 0.5 * slope_per_h)) < 1e-9, out
    assert abs(out["02:00"] - (5.0 + 1.5 * slope_per_h)) < 1e-9, out
    assert abs(out["03:00"] - (5.0 + 2.5 * slope_per_h)) < 1e-9, out


def test_connected_components_self_loop_singleton(spark):
    """The documented self-loop contract: a node appearing ONLY in
    (u,u) edges returns as its own singleton component instead of
    silently vanishing in the normalize step; a node with both a
    self-loop and real edges carries its real component."""
    edges = spark.createDataFrame(
        [(1, 2), (5, 5), (2, 2)], "src long, dst long"
    )
    got = {
        r.node: r.comp_id
        for r in api.connected_components(edges, "src", "dst").collect()
    }
    assert got == {1: 1, 2: 1, 5: 5}


def test_weighted_median_rejects_nonpositive_bin_width(spark):
    df = spark.createDataFrame([(1, 1.0, 1.0)], "g int, v double, w double")
    with pytest.raises(ValueError, match="bin_width must be positive"):
        api.weighted_median(df, group_cols=["g"], value_col="v", weight_col="w",
                            bin_width=0)


def test_bottomk_by_hash_reserved_name_collision(spark):
    df = spark.createDataFrame([(1, "x")], "k long, _bk_h string")
    with pytest.raises(ValueError, match="collide"):
        api.bottomk_by_hash(df, key_col="k", k=1, keep_cols=["_bk_h"])


def test_weighted_sample_ares_positive_weight_contract(spark):
    """A-ES is defined for w > 0: negative-weight rows would flip the
    priority sign and deterministically outrank every valid row; they
    (and w=0 rows) must be dropped, not sampled."""
    rows = [(1, 100.0), (2, 100.0), (3, -5.0), (4, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r.doc_id for r in
           api.weighted_sample_ares(df, weight_col="w", k=10).collect()]
    assert set(got) == {1, 2}, got


def test_pagerank_iters_zero_covers_all_vertices(spark):
    """The documented contract — a rank for EVERY vertex in the edge
    list — must hold at iters=0 too: in-only vertices normally enter
    via round 1's aggregation, so the seed has to union them in."""
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.v: r.rank for r in api.pagerank(edges, iters=0).collect()}
    assert got == {1: 1.0, 2: 1.0}
    with pytest.raises(ValueError, match="checkpoint_interval"):
        api.pagerank(edges, checkpoint_interval=0)


def test_bloom_prefilter_contract_guards(spark):
    """No-false-negatives must survive the two contract holes: a
    non-multiple-of-64 m_bits (bits past the last full word previously
    crashed the build or NULLed the probe and DROPPED matching rows)
    and a fact/dim key type mismatch (xxhash64 is type-sensitive while
    the join coerces — every probe became a false negative)."""
    dim = spark.createDataFrame([(i,) for i in range(50)], "dk long")
    fact = spark.createDataFrame(
        [(i, f"r{i}") for i in range(100)], "fk int, payload string"
    )  # fk is INT on purpose: dim key is LONG
    kept = api.bloom_prefilter(fact, "fk", dim, "dk", m_bits=1000).collect()
    kept_ids = {r.fk for r in kept}
    assert set(range(50)) <= kept_ids, "false negatives: matching rows dropped"


def test_ks_2sample_null_values_and_empty_side(spark):
    """NULL metric values are not observations (they inflated n and
    formed a phantom CDF step whose position even differed cross-
    engine), and an empty side yields ks_d NULL instead of an ANSI
    DIVIDE_BY_ZERO kill."""
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (None, 1), (1.5, 0), (None, 0)],
        "v double, f int",
    )
    row = api.ks_2sample(df, "v", "f").collect()[0]
    assert (row.n_a, row.n_b) == (2, 1), row
    one_sided = spark.createDataFrame([(1.0, 1), (2.0, 1)], "v double, f int")
    row2 = api.ks_2sample(one_sided, "v", "f").collect()[0]
    assert row2.ks_d is None and row2.n_b == 0


def test_phash_buckets_corrupt_blobs_are_singletons(spark):
    """Undecodable blobs must NOT bucket together: 3 distinct corrupt
    images are 3 singletons (n_bucket=1, NULL phash), never one
    3-strong 'duplicate' bucket a dedup consumer would collapse."""
    def explode_always(b):
        raise ValueError("corrupt")

    df = spark.createDataFrame(
        [(1, b"a"), (2, b"b"), (3, b"c")], "pid long, blob binary"
    )
    rows = api.phash_buckets(
        df, id_col="pid", blob_col="blob", decoder=explode_always
    ).collect()
    assert all(r.phash is None and r.n_bucket == 1 for r in rows), rows


def test_phash_buckets_rejects_reserved_id_col(spark):
    df = spark.createDataFrame([("a", b"x")], "phash string, blob binary")
    with pytest.raises(ValueError, match="reserved"):
        api.phash_buckets(df, id_col="phash", blob_col="blob")
