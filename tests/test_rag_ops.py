"""Unit tests for the rows-only (non-oracle) RAG/dedup/vector operators
(SURVEY.md §5.2.3/5.2.5): determinism, semantics the DuckDB oracle can't
check, and recall/error bounds for approximate ops."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from assignment4_spark import registry
from assignment4_spark.operators.rag import chunk_text

registry.load_all()


def test_chunk_reassembly_property(spark):
    """Property (SURVEY §5.2.5): concatenating chunks with the overlap
    removed reconstructs the original text exactly."""
    texts = [
        ("short", "tiny"),
        ("exact", "x" * 120),
        ("plus1", "y" * 121),
        ("long", "the quick brown fox jumps over the lazy dog " * 20),
        ("empty-ish", "a"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_text(df, size=120, overlap=20).orderBy("doc_id", "chunk_id").collect()
    by_doc: dict[int, list[str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    for i, (_, t) in enumerate(texts):
        chunks = by_doc[i]
        rebuilt = chunks[0] + "".join(c[20:] for c in chunks[1:])
        assert rebuilt == t, f"doc {i}: reassembly mismatch"
        # every chunk except the last is exactly `size` long
        for c in chunks[:-1]:
            assert len(c) == 120


def test_hash_embedder_deterministic_and_normalized(spark, sf_small):
    from assignment4_spark import api

    out1 = api.embed_chunks(spark, sf_small).limit(50).collect()
    out2 = api.embed_chunks(spark, sf_small).limit(50).collect()
    assert [r.embedding for r in out1] == [r.embedding for r in out2], "not deterministic"
    for r in out1:
        norm = sum(x * x for x in r.embedding) ** 0.5
        assert abs(norm - 1.0) < 1e-5, f"not L2-normalized: {norm}"
        assert len(r.embedding) == 64


def test_rag_embed_hash_flat_summary_matches_array_form(spark, sf_small):
    """The registered rag_embed_hash face must be a FLAT projection of
    embed_chunks (no array<float> — the r6 driver canonicalizer ERR):
    dim/l2_norm/md5 per chunk, md5 recomputable from the array form, and
    the md5 deterministic across runs. The Python replay formats
    through Decimal HALF_UP, because Spark's format_string('%.6f') /
    F.round round HALF_UP while Python's '%.6f' and round() are
    half-even — an embedding component sitting exactly on a 6th-decimal
    tie (e.g. 0.0078125 = 2^-7, representable in float32) would
    otherwise flake the md5 comparison."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from assignment4_spark import api

    def f6(x: float) -> str:
        return str(
            Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    flat = {
        (r.doc_id, r.chunk_id): r
        for r in registry.QUERIES["rag_embed_hash"](spark, sf_small).collect()
    }
    arrays = api.embed_chunks(spark, sf_small).collect()
    assert len(flat) == len(arrays) > 0
    for a in arrays:
        r = flat[(a.doc_id, a.chunk_id)]
        assert r.dim == 64
        want_norm = float(f6(sum(float(x) * float(x) for x in a.embedding) ** 0.5))
        assert abs(r.l2_norm - want_norm) < 1e-9
        joined = ",".join(f6(x) for x in a.embedding)
        assert r.emb_md5 == hashlib.md5(joined.encode()).hexdigest()
    again = {
        (r.doc_id, r.chunk_id): r.emb_md5
        for r in registry.QUERIES["rag_embed_hash"](spark, sf_small).collect()
    }
    assert again == {k: r.emb_md5 for k, r in flat.items()}


def test_approx_distinct_error_bound(spark, sf_oracle):
    """approx_count_distinct rsd=0.01 must stay within 5% of exact
    (FIXTURES §5: error bounds unit-tested since no oracle applies)."""
    approx = {
        r.event_type: r.approx_users
        for r in registry.QUERIES["agg_approx_distinct"](spark, sf_oracle).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in registry.QUERIES["agg_count_distinct"](spark, sf_oracle).collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(1, 0.05 * exact[k])


def test_hll_distinct_error_bound(spark, sf_oracle):
    """agg_hll_distinct (HLL++, rsd=0.01) must stay within 5% of exact —
    the independent-reimplementation pin for this rows-only op (sketch
    bytes are engine-specific, so no cross-engine oracle applies)."""
    approx = {
        r.event_type: r.approx_users
        for r in registry.QUERIES["agg_hll_distinct"](spark, sf_oracle).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in registry.QUERIES["agg_count_distinct"](spark, sf_oracle).collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(1, 0.05 * exact[k])


def test_bpe_apply_replace_chain_matches_fold(spark, sf_oracle):
    """text_bpe_apply's chained-REPLACE encode must equal the greedy
    leftmost BPE fold symbol-for-symbol over the ENTIRE fixture
    vocabulary — the independent pure-Python pin for the delimiter
    trick (module constant _BPE_APPLY_MODEL)."""
    from assignment4_spark.operators.textstats import (
        _BPE_APPLY_MODEL,
        _RS,
        _US,
    )

    words = {
        r.w
        for r in spark.read.parquet(f"{sf_oracle}/documents.parquet")
        .selectExpr("explode(filter(split(text, ' '), t -> t != '')) AS w")
        .distinct()
        .collect()
    }

    def fold(w):
        sym = list(w)
        for left, right in _BPE_APPLY_MODEL:
            out = []
            for c in sym:
                if out and out[-1] == left and c == right:
                    out[-1] = left + right
                else:
                    out.append(c)
            sym = out
        return sym

    def replace_chain(w):
        s = "".join(_US + c + _RS for c in w)
        for left, right in _BPE_APPLY_MODEL:
            s = s.replace(_US + left + _RS + _US + right + _RS, _US + left + right + _RS)
        return [t[:-1] for t in s.split(_US)[1:]]

    assert words, "empty vocabulary"
    for w in words:
        assert fold(w) == replace_chain(w), w


def test_pca_matches_driver_side_numpy(spark, sf_oracle):
    """vec_pca_project's distributed Gram-statistic fit must equal a
    plain driver-side numpy PCA over the collected vectors (different
    computation path: full matrix vs partition-folded sufficient
    statistic) to 1e-9 per projection, with orthonormal components and
    descending explained variance — the SURVEY §5.2.6 pin for this
    rows-only op."""
    import numpy as np

    from assignment4_spark.operators.vectors import pca_fit, pca_project
    from assignment4_spark.io_util import table as load_table

    e = load_table(spark, sf_oracle, "embeddings")
    comps, mean, explained = pca_fit(e, k=4)
    # invariants
    eye = np.asarray(comps) @ np.asarray(comps).T
    assert np.allclose(eye, np.eye(4), atol=1e-9), eye
    assert all(
        explained[i] >= explained[i + 1] - 1e-12 for i in range(3)
    ), explained
    for c in comps:  # deterministic sign rule
        assert c[int(np.argmax(np.abs(c)))] > 0

    rows = e.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    m = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    mu = m.mean(axis=0)
    cov = np.cov(m.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    ref = evecs[:, order].T.copy()
    for i in range(4):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i][j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(np.abs(ref), np.abs(np.asarray(comps)), atol=1e-8)
    ref_proj = {i: (v - mu) @ np.asarray(comps).T for i, v in zip(ids, m)}

    got = {r.vec_id: (r.pc1, r.pc2, r.pc3, r.pc4)
           for r in pca_project(e, comps, mean).collect()}
    assert set(got) == set(ref_proj)
    for i, exp in ref_proj.items():
        assert np.allclose(got[i], exp, atol=1e-9), (i, got[i], exp)


def test_simhash_finds_planted_near_dups(spark, sf_oracle):
    """The fixture corpus plants near-dup pairs with shingle-Jaccard
    ≥ 0.9 at sf0.01 (measured); SimHash at hamming ≤ 6 must recover a
    solid majority of them and be deterministic."""
    jac_pairs = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_minhash_lsh"](spark, sf_oracle).collect()
    }
    sim_pairs = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_simhash"](spark, sf_oracle).collect()
    }
    assert jac_pairs, "fixture should contain planted near-dups"
    recall = len(jac_pairs & sim_pairs) / len(jac_pairs)
    assert recall >= 0.6, f"simhash recall too low: {recall} ({len(sim_pairs)} pairs)"


def test_connected_components_long_chain_log_rounds(spark):
    """large-star/small-star must converge in O(log^2 n) rounds on a
    long chain — the structure where min-label propagation degrades to
    diameter rounds (127 here). Also checks disjoint components keep
    separate minima as their ids."""
    import pyspark.sql.functions as F

    from assignment4_spark.operators.dedup import connected_components

    chain = spark.range(127).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    tri = spark.createDataFrame(
        [(200, 201), (201, 202), (202, 200)], "src long, dst long"
    )
    rounds: list = []
    comp = connected_components(chain.union(tri), _rounds_out=rounds)
    groups: dict = {}
    for r in comp.collect():
        groups.setdefault(r.comp_id, set()).add(r.node)
    assert groups[0] == set(range(128))
    assert groups[200] == {200, 201, 202}
    assert rounds and rounds[0] <= 12, rounds


@pytest.mark.slow
def test_connected_components_random_vs_union_find(spark):
    """Seeded random graphs cross-checked against a plain Python
    union-find — independent evidence the star contraction computes the
    same partition (the chain test pins rounds; this pins correctness
    over denser shapes: multi-component, cycles, self-dups)."""
    import random

    from assignment4_spark.operators.dedup import connected_components

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n, m = 40, 55
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in edges:
            if a != b:
                touched.add(a)
                touched.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in touched}
        # canonical min-id per component
        mins: dict = {}
        for x, r in want.items():
            mins[r] = min(mins.get(r, x), x)
        want = {x: mins[r] for x, r in want.items()}

        df = spark.createDataFrame(
            [(a, b) for a, b in edges if a != b], "src long, dst long"
        )
        got = {r.node: r.comp_id for r in connected_components(df).collect()}
        assert got == want, f"seed {seed}"


def test_upsert_merge_sequential_batches(spark, tmp_path):
    """Three update batches merged sequentially must equal one
    latest-wins pass over base + all updates (merge is associative for
    version-ordered upserts), and re-merging the last batch must be
    idempotent."""
    from pyspark.sql import functions as F

    from assignment4_spark.operators.vectors import upsert_merge_parquet

    out = str(tmp_path / "t")
    base = [(k, 0, f"base{k}") for k in range(10)]
    batches = [
        [(1, 1, "a"), (11, 1, "new11")],
        [(1, 2, "b"), (2, 1, "c")],
        [(2, 2, "d"), (11, 1, "new11-dup")],
    ]
    spark.createDataFrame(base, "k long, ver long, p string").withColumn(
        "bucket", F.pmod(F.xxhash64("k"), F.lit(4))
    ).write.partitionBy("bucket").parquet(out)
    for b in batches + [batches[-1]]:  # replay last batch: idempotence
        upsert_merge_parquet(
            out,
            spark.createDataFrame(b, "k long, ver long, p string"),
            "k", "ver", "p", n_buckets=4,
        )
    got = {r.k: (r.ver, r.p) for r in spark.read.parquet(out).collect()}
    allrows = base + [r for b in batches for r in b]
    want: dict = {}
    for k, ver, p in allrows:
        cur = want.get(k)
        # latest ver wins; ties broken by payload ASC (window orderBy)
        if cur is None or ver > cur[0] or (ver == cur[0] and p < cur[1]):
            want[k] = (ver, p)
    assert got == want


def test_simhash_banded_equals_bruteforce(spark, sf_oracle):
    """The pigeonhole band join is EXACT: over max_hamming+1 disjoint
    bands, any pair within the Hamming budget shares at least one band,
    so the banded candidate set must reproduce the all-pairs scan
    verbatim (ids AND distances)."""
    from assignment4_spark.io_util import table
    from assignment4_spark.operators.dedup import (
        simhash_pairs,
        simhash_pairs_bruteforce,
    )

    docs = table(spark, sf_oracle, "documents")
    banded = {tuple(r) for r in simhash_pairs(docs).collect()}
    brute = {tuple(r) for r in simhash_pairs_bruteforce(docs).collect()}
    assert banded == brute
    assert banded, "fixture should contain simhash pairs"


def test_near_dup_lsh_recall_vs_exact(spark, sf_oracle):
    """The bucketed production near-dup path must (a) return a subset of
    the exact pair set (candidates are re-scored with the exact cosine,
    so no false positives) and (b) recall a solid share of it even on
    the LSH-adversarial uniform-random fixture (theory: ~0.65 at the
    0.4 threshold with 10 tables x 5 bits; deterministic planes make the
    measured value stable run-to-run)."""
    from assignment4_spark.io_util import table
    from assignment4_spark.operators.vectors import (
        near_dup_pairs_exact,
        near_dup_pairs_lsh,
    )

    emb = table(spark, sf_oracle, "embeddings")
    exact = {(r.vec_a, r.vec_b) for r in near_dup_pairs_exact(emb, 0.4).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in near_dup_pairs_lsh(emb, 0.4).collect()}
    assert exact, "fixture should contain near-dup pairs at 0.4"
    assert lsh <= exact
    assert len(exact & lsh) / len(exact) >= 0.5


def test_ivf_ann_recall_vs_exact(spark, sf_oracle):
    """IVF with nprobe=3 of 8 clusters: recall@5 vs the exact scan.
    Fixture embeddings are uniform-random (no cluster structure), so the
    floor is ~nprobe/K = 0.375 from probing alone; the coarse quantizer
    correlation should lift it meaningfully above that."""
    ann = registry.QUERIES["vec_ann_ivf_topk"](spark, sf_oracle).collect()
    by_q: dict[int, set[int]] = {}
    for r in ann:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    # exact top-5 for the same query ids, via the same cosine
    from assignment4_spark.io_util import table
    from assignment4_spark.operators.vectors import as_double, cosine
    from pyspark.sql.window import Window as W

    e = table(spark, sf_oracle, "embeddings")
    q = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(as_double("embedding"), as_double("q_emb")).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5).collect()
    )
    exact_by_q: dict[int, set[int]] = {}
    for r in exact:
        exact_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(by_q.get(qid, set()) & nbrs) / len(nbrs) for qid, nbrs in exact_by_q.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.45, f"IVF recall too low: {recalls}"


def test_rp_lsh_ann_recall_vs_exact(spark, sf_oracle):
    """Random-hyperplane LSH with 8 tables × 6 bits: recall@5 vs the
    exact scan must clear 0.25 on the uniform-random fixture (clustered
    real embeddings collide far more; this floor guards the wiring —
    bucketing, candidate join, re-rank — not LSH theory)."""
    ann = registry.QUERIES["vec_ann_rp_lsh_topk"](spark, sf_oracle).collect()
    by_q: dict[int, set[int]] = {}
    for r in ann:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    exact = registry.QUERIES["vec_knn_topk"](spark, sf_oracle)  # k=10, queries 0-4
    # recompute exact top-5 for query ids 100-104 with the same cosine
    from assignment4_spark.io_util import table
    from assignment4_spark.operators.vectors import knn_topk

    e = table(spark, sf_oracle, "embeddings")
    import pyspark.sql.functions as FF

    q = e.filter((FF.col("vec_id") >= 100) & (FF.col("vec_id") < 105)).select(
        FF.col("vec_id").alias("query_id"), FF.col("embedding").alias("q_embedding")
    )
    exact_rows = knn_topk(e, q, k=5).collect()
    exact_by_q: dict[int, set[int]] = {}
    for r in exact_rows:
        exact_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(by_q.get(qid, set()) & nbrs) / len(nbrs)
        for qid, nbrs in exact_by_q.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.25, f"RP-LSH recall too low: {recalls}"


def test_rp_lsh_multiprobe_dominates_single_probe(spark, sf_oracle):
    """Multi-probe candidates are a strict superset of single-probe's, so
    per-query top-5 similarity sums must be ≥ — and on the adversarial
    uniform fixture the Hamming-1 probes should also find strictly more
    candidate mass for at least one query (sum strictly greater)."""
    single = registry.QUERIES["vec_ann_rp_lsh_topk"](spark, sf_oracle).collect()
    multi = registry.QUERIES["vec_ann_rp_lsh_multiprobe"](spark, sf_oracle).collect()

    def sim_sum_by_q(rows):
        acc: dict[int, float] = {}
        for r in rows:
            acc[r.query_id] = acc.get(r.query_id, 0.0) + r.sim_r
        return acc

    s, m = sim_sum_by_q(single), sim_sum_by_q(multi)
    assert set(m) >= set(s)
    for qid in s:
        assert m[qid] >= s[qid] - 1e-9, f"q{qid}: multiprobe {m[qid]} < single {s[qid]}"
    assert sum(m.values()) > sum(s.values()), "multiprobe found nothing extra"


def test_multimodal_binary_meta_schema_and_batching(spark, sf_small):
    df = registry.QUERIES["multimodal_binary_meta"](spark, sf_small)
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "format",
    ]
    rows = df.collect()
    assert len(rows) == 500
    assert all(r.width >= 64 and r.height >= 64 for r in rows)
    assert all(r.format in ("png", "jpeg", "webp") for r in rows)
    # deterministic across runs
    again = registry.QUERIES["multimodal_binary_meta"](spark, sf_small).collect()
    assert rows == again


def test_report_compose_shape(spark, sf_small):
    rows = registry.QUERIES["report_compose"](spark, sf_small).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.title == "Corpus Research Report"
    for section in ("introduction", "key_findings", "analysis", "conclusion", "sources"):
        assert getattr(r, section)


def test_upsert_latest_wins(spark, sf_small):
    rows = {r.vec_id: (r.ver, r.payload) for r in
            registry.QUERIES["vec_upsert_dedup"](spark, sf_small).collect()}
    assert rows == {1: (3, "a3"), 2: (2, "b2"), 3: (7, "c7"), 4: (1, "d1")}


def test_mmr_rerank_properties(spark, sf_oracle):
    """MMR re-rank (rows-only op): k=5 per query; the first pick is the
    plain cosine top-1; the selected set is no less diverse than plain
    top-5 (lower or equal max pairwise sim); results are deterministic."""
    import numpy as np

    got = registry.QUERIES["vec_mmr_rerank"](spark, sf_oracle)
    rows = got.collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(len(v) for v in by_q.values()) == {5}
    assert sorted(by_q) == [0, 1, 2]

    knn = registry.QUERIES["vec_knn_topk"](spark, sf_oracle).collect()
    top1 = {r.query_id: r.neighbor_id for r in knn if r.rank == 1 and r.query_id < 3}
    for q, picks in by_q.items():
        picks = sorted(picks, key=lambda r: r.mmr_rank)
        assert picks[0].neighbor_id == top1[q], f"query {q}: first MMR pick != top-1"

    # diversity: max pairwise cosine among MMR picks <= among plain top-5 (+eps)
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{sf_oracle}/embeddings.parquet").collect()
    }

    def max_pair_sim(ids):
        vs = [emb[i] / np.linalg.norm(emb[i]) for i in ids]
        return max(
            float(vs[i] @ vs[j]) for i in range(len(vs)) for j in range(i + 1, len(vs))
        )

    top5 = {q: [r.neighbor_id for r in knn if r.query_id == q and r.rank <= 5] for q in by_q}
    for q, picks in by_q.items():
        mmr_ids = [r.neighbor_id for r in picks]
        assert max_pair_sim(mmr_ids) <= max_pair_sim(top5[q]) + 1e-9

    again = registry.QUERIES["vec_mmr_rerank"](spark, sf_oracle).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_kmeans_train_improves_on_seed_assignment(spark, sf_oracle):
    """vec_kmeans_train (rows-only op): 3 Lloyd iterations over the seed
    codebook. Every vector stays assigned (sizes sum to the corpus), at
    most k clusters survive, and the trained codebook's mean cosine is
    no worse than the untrained seed assignment (vec_kmeans_assign) —
    Lloyd's never degrades the objective."""
    trained = registry.QUERIES["vec_kmeans_train"](spark, sf_oracle).collect()
    seed = registry.QUERIES["vec_kmeans_assign"](spark, sf_oracle).collect()

    n_corpus = sum(r.n_members for r in seed)
    assert sum(r.n_members for r in trained) == n_corpus
    assert 0 < len(trained) <= 8

    def mean_sim(rows):
        return sum(r.avg_sim * r.n_members for r in rows) / sum(
            r.n_members for r in rows
        )

    assert mean_sim(trained) >= mean_sim(seed) - 1e-9, (
        f"training degraded the objective: {mean_sim(trained)} < {mean_sim(seed)}"
    )

    again = registry.QUERIES["vec_kmeans_train"](spark, sf_oracle).collect()
    assert [tuple(r) for r in trained] == [tuple(r) for r in again]


def _bpe_reference(word_counts: dict, num_merges: int):
    """Pure-Python BPE trainer (Sennrich ACL'16): max-count pair per
    round, ties lexicographically smallest (left, right), greedy
    leftmost-first merge — the spec text_bpe_train must match."""
    v = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for _ in range(num_merges):
        pc = {}
        for sym, c in v.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        mx = max(pc.values())
        left, right = sorted(p for p, n in pc.items() if n == mx)[0]
        out.append((left, right, mx))
        nv = {}
        for sym, c in v.items():
            merged = []
            for s in sym:
                if merged and merged[-1] == left and s == right:
                    merged[-1] = left + right
                else:
                    merged.append(s)
            nv[tuple(merged)] = nv.get(tuple(merged), 0) + c
        v = nv
    return out


def test_bpe_train_matches_python_reference(spark):
    """bpe_train on a hand-built word-count frame must reproduce the
    reference trainer exactly, including the multi-char-symbol rounds
    (rule 3 merges 'ab'+'c' — a pair only expressible AFTER rule 1)."""
    from assignment4_spark.operators.textstats import bpe_train

    counts = {"abcabc": 10, "abcd": 7, "bcd": 5, "xy": 3, "x": 2}
    words = spark.createDataFrame(list(counts.items()), "w string, wc bigint")
    got = bpe_train(words, num_merges=5)
    assert got == _bpe_reference(counts, 5)


def test_bpe_train_registered_head_is_pair_counts_top1(spark, sf_oracle):
    """The rank-1 merge rule must equal text_bpe_pair_counts' top row —
    the two ops are the same count by construction (pair_counts weights
    by distinct-word frequency; train's round 1 runs on unmerged
    single-char symbols, where a symbol pair IS a 2-char substring)."""
    from assignment4_spark import registry

    top = registry.QUERIES["text_bpe_pair_counts"](spark, sf_oracle).head(1)[0]
    r1 = registry.QUERIES["text_bpe_train"](spark, sf_oracle).head(1)[0]
    assert r1.rank == 1
    assert r1.left + r1.right == top.pair


def test_incremental_index_readmission(spark, sf_oracle):
    """The index must actually LEARN the admitted batch: running the
    face builds corpus index (v1) and merges the batch in (v2);
    re-admitting the same batch postings against the UPDATED index
    must surface every original cross-side pair PLUS each batch doc's
    identity pair (jaccard 1.0 with itself) — proof the merge landed
    and the candidate path reads the new rows."""
    from assignment4_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _shingles,
        minhash_band_postings,
    )
    from assignment4_spark.operators.lakehouse import (
        latest_version,
        read_snapshot,
    )
    from assignment4_spark.operators.scans import _adir
    from assignment4_spark.io_util import table

    first = registry.QUERIES["dedup_incremental_index"](spark, sf_oracle)
    first_pairs = {(r.doc_a, r.doc_b) for r in first.collect()}
    base_dir = _adir(sf_oracle, "dedup_index_table")
    assert latest_version(base_dir) == 2

    docs = table(spark, sf_oracle, "documents").select("doc_id", "text")
    s = docs.select("doc_id", _shingles().alias("sh")).persist()
    batch_post = minhash_band_postings(s.filter(F.col("doc_id") % 3 == 0))
    idx = read_snapshot(spark, base_dir)
    cand = (
        batch_post.join(idx.select("band_key", "docs"), "band_key")
        .select(F.explode("docs").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    again = {
        (r.doc_a, r.doc_b)
        for r in cand.join(sa, "doc_a").join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    }
    batch_ids = {r.doc_id for r in batch_post.select("doc_id").distinct().collect()}
    assert first_pairs <= again, "updated index lost original pairs"
    identity = {(b, b) for b in batch_ids}
    assert identity <= again, "batch docs must now match themselves"


def test_ann_recall_report_floors_and_dominance(spark, sf_oracle):
    """The registered eval op must report the same quality the §5.2.6
    pins assert directly: IVF macro recall clears its ~nprobe/K-derived
    floor, RP-LSH clears its wiring floor, multiprobe macro-dominates
    single-probe (candidate superset), and every method reports the
    full 5-query panel (zero-hit queries count as 0.0, not as missing
    rows)."""
    rows = {
        r.method: r
        for r in registry.QUERIES["vec_ann_recall_report"](
            spark, sf_oracle
        ).collect()
    }
    assert set(rows) == {"ivf_flat", "rp_lsh", "rp_lsh_multiprobe"}
    assert all(r.n_queries == 5 for r in rows.values())
    assert rows["ivf_flat"].macro_recall_at5 >= 0.45
    assert rows["rp_lsh"].macro_recall_at5 >= 0.25
    assert (
        rows["rp_lsh_multiprobe"].macro_recall_at5
        >= rows["rp_lsh"].macro_recall_at5
    )
    for r in rows.values():
        assert 0.0 <= r.min_query_recall <= r.macro_recall_at5 <= 1.0
