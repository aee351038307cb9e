"""Property-based tests (SURVEY §5.2.5) via hypothesis.

Spark session startup dominates example runtime, so properties are
tested by building ONE batch of hypothesis-generated rows per test and
running the operator once over the whole batch — each generated row is
still an independent example, the engine just evaluates them together
(which is also the honest way to test a vectorized engine)."""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from assignment4_spark import registry
from assignment4_spark.operators.rag import chunk_text
from assignment4_spark.operators.vectors import as_double, cosine

registry.load_all()

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" "),
        min_size=1,
        max_size=400,
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(texts=texts_strategy, size=st.integers(40, 200), overlap=st.integers(0, 39))
def test_chunk_reassembly_roundtrip(spark, texts, size, overlap):
    """concat(chunks with overlap stripped) == original text, for any
    text/size/overlap with overlap < size."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = chunk_text(df, size=size, overlap=overlap).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text
    for i, t in enumerate(texts):
        chunks = [c for _, c in sorted(by_doc[i].items())]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == t


@settings(max_examples=5, deadline=None)
@given(
    vecs=st.lists(
        st.lists(st.floats(-10, 10, allow_nan=False), min_size=8, max_size=8),
        min_size=2,
        max_size=12,
    )
)
@pytest.mark.slow
def test_cosine_symmetry_and_self_similarity(spark, vecs):
    """sim(a,b) == sim(b,a) within 1e-9; sim(a,a) == 1 for nonzero a."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vid long, emb array<double>")
    a = df.select(F.col("vid").alias("va"), F.col("emb").alias("ea"))
    b = df.select(F.col("vid").alias("vb"), F.col("emb").alias("eb"))
    sims = (
        a.crossJoin(b)
        .select("va", "vb", cosine(as_double("ea"), as_double("eb")).alias("s"))
        .collect()
    )
    m = {(r.va, r.vb): r.s for r in sims}
    for (x, y), s in m.items():
        t = m[(y, x)]
        if s is not None and t is not None:
            assert abs(s - t) < 1e-9
        else:
            assert s is None and t is None  # zero-norm rows on both sides
        if x == y and s is not None:
            assert abs(s - 1.0) < 1e-9


def test_dedup_exact_idempotent(spark, sf_oracle):
    """Running exact dedup on its own survivors changes nothing."""
    first = registry.QUERIES["dedup_exact"](spark, sf_oracle)
    survivors = first.select(F.col("keep_doc_id").alias("doc_id"), "fp")
    again = (
        survivors.groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    assert again.filter(F.col("n_copies") > 1).count() == 0
    assert again.count() == first.count()


def test_minhash_pairs_subset_of_bruteforce_threshold(spark, sf_oracle):
    """Every LSH-verified pair must genuinely have Jaccard >= 0.5 (the
    verification step guarantees no false positives by construction —
    this guards the wiring, e.g. a band-key collision slipping through)."""
    pairs = registry.QUERIES["dedup_minhash_lsh"](spark, sf_oracle).collect()
    assert pairs, "fixture should contain planted near-dups"
    assert all(r.jaccard >= 0.5 for r in pairs)


def test_temperature_weights_normalize_and_flatten(spark, sf_oracle):
    """sample_temperature: resampled shares sum to 1, and flattening is
    real. The true up/down-weight crossover for p^α/Z is p* = Z^(-1/(1-α))
    (≥ 1/L, strictly so for non-uniform distributions) — NOT the mean
    share 1/L: a language slightly above the mean can legitimately be
    upweighted (ADVICE r1, low). Assert only the guaranteed directions:
    below-mean languages gain share, languages above the true crossover
    lose it, and the argmax language strictly loses share."""
    from assignment4_spark import registry

    alpha = 0.3
    rows = registry.QUERIES["sample_temperature"](spark, sf_oracle).collect()
    assert abs(sum(r.p_resampled for r in rows) - 1.0) < 1e-4
    z = sum(r.p_raw**alpha for r in rows)
    crossover = z ** (-1.0 / (1.0 - alpha))
    top = max(rows, key=lambda r: r.p_raw)
    # The operator rounds p_raw/p_resampled to 6 decimals, so p* computed
    # from rounded inputs carries up to ~5e-7 error per language amplified
    # through p^α and Z^(-1/(1-α)); guards below use a 1e-5 dead zone to
    # match (ADVICE r2) — a 1e-9 epsilon would make the classification
    # data-sensitive near the crossover.
    ROUND_EPS = 1e-5
    # argmax's true shift can round to equality on near-uniform data;
    # assert strictly only when its share clears the mean by > ROUND_EPS.
    if top.p_raw - 1.0 / len(rows) > ROUND_EPS:
        assert top.p_resampled < top.p_raw, f"{top.lang} (argmax) should be downweighted"
    else:
        assert top.p_resampled <= top.p_raw, f"{top.lang} (argmax) must not gain share"
    for r in rows:
        if r.p_raw <= 1.0 / len(rows) - ROUND_EPS:
            # clearly below the mean → guaranteed gain, up to rounding
            assert r.p_resampled >= r.p_raw - ROUND_EPS, f"{r.lang} should be upweighted"
        elif r.p_raw > crossover + ROUND_EPS:
            assert r.p_resampled < r.p_raw, f"{r.lang} above crossover should be downweighted"


def test_ewma_ramp_equals_first_observation(spark, sf_oracle):
    """ts_ewma: on each series' first row the normalized truncated EWMA
    has exactly one present term, so ewma == cnt (the ramp correction);
    and every ewma lies within [min, max] of its series' counts so far
    (convexity of the normalized weights)."""
    from collections import defaultdict

    from assignment4_spark import registry

    rows = registry.QUERIES["ts_ewma"](spark, sf_oracle).collect()
    seen = defaultdict(list)
    for r in rows:  # rows arrive ordered (event_type, day)
        prior = seen[r.event_type]
        if not prior:
            assert abs(r.ewma - r.cnt) < 1e-9, f"{r.event_type} first-row ramp"
        window = (prior + [r.cnt])[-8:]
        assert min(window) - 1e-9 <= r.ewma <= max(window) + 1e-9
        prior.append(r.cnt)


def test_interval_overlap_bounded_by_incident_window(spark, sf_oracle):
    """Each overlapping incident contributes at most its own 30-min
    window; total overlap seconds per (user, day) is therefore bounded
    by n_incidents * 1800 (and is non-negative)."""
    from assignment4_spark import registry

    rows = registry.QUERIES["join_interval_overlap"](spark, sf_oracle).collect()
    assert rows, "fixture should produce overlaps"
    for r in rows:
        assert 0.0 <= r.overlap_s <= r.n_incidents * 1800.0 + 1e-6, r


def test_weighted_sample_biased_toward_long_docs(spark, sf_oracle):
    """A-ES with weight = n_chars must pull the sample's mean length
    above the corpus mean (deterministic fixture ⇒ stable fact)."""
    from assignment4_spark import registry
    from assignment4_spark.io_util import table
    from pyspark.sql import functions as F

    sample = registry.QUERIES["sample_weighted_ares"](spark, sf_oracle).collect()
    corpus_mean = (
        table(spark, sf_oracle, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_cms_never_underestimates(spark, sf_oracle):
    """Count-min is one-sided by construction: the estimate is a sum of
    the true count plus colliding mass, so est >= exact for EVERY
    token — an estimator regression (wrong bucket width, min over the
    wrong axis) breaks this before it breaks the oracle."""
    rows = registry.QUERIES["agg_cms_heavy_hitters"](spark, sf_oracle).collect()
    assert rows, "heavy hitters must be non-empty on the fixture"
    for r in rows:
        assert r.est_cnt >= r.exact_cnt, f"{r.token}: CMS underestimated"


def test_containment_bounds_and_direction(spark, sf_oracle):
    """Containment is a ratio of shared to |A|'s shingles: 0 < c <= 1,
    and n_shared can never exceed the pair's reported numerator base."""
    rows = registry.QUERIES["dedup_containment_pairs"](spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.containment <= 1.0 + 1e-9, r
        assert r.n_shared >= 1, r


def test_ivf_pq_matches_numpy_reference(spark, sf_oracle):
    """Replay the ENTIRE IVF-PQ pipeline (coarse assignment, PQ codes,
    3-probe candidate generation, LUT-based ADC scoring, top-5 rank) in
    plain numpy from the parquet fixture and require exact agreement
    with the registered op — an independent implementation check in the
    spirit of the BPE trainer's pure-Python pin. (Recall-vs-exact is
    NOT asserted: the fixture's embedding space is near-uniform, where
    coarse pruning + 4×16 quantization legitimately has low recall —
    the oracle already pins the output values.)"""
    import numpy as np

    rows = (
        spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    assert list(ids) == list(range(len(ids))), "reference assumes dense ids"

    cents, cb = M[:8], M[:16]
    norms = np.linalg.norm(M, axis=1)

    def coarse_sorted(i):
        sims = np.round((cents @ M[i]) / (np.linalg.norm(cents, axis=1) * norms[i]), 6)
        return np.lexsort((np.arange(8), -sims))  # sim desc, cid asc

    def sub_d(v, c, j):
        return round(np.sqrt(np.sum((v[j * 16 : j * 16 + 16] - c[j * 16 : j * 16 + 16]) ** 2)), 6)

    assigned = np.array([coarse_sorted(i)[0] for i in range(len(M))])
    codes = [
        [min(range(16), key=lambda cc: (sub_d(M[i], cb[cc], j), cc)) for j in range(4)]
        for i in range(len(M))
    ]
    expect = []
    for q in range(100, 105):
        probes = set(coarse_sorted(q)[:3])
        lut = [[sub_d(M[q], cb[c], j) for c in range(16)] for j in range(4)]
        est = {
            i: round(
                np.sqrt(
                    ((lut[0][codes[i][0]] ** 2 + lut[1][codes[i][1]] ** 2)
                     + lut[2][codes[i][2]] ** 2) + lut[3][codes[i][3]] ** 2
                ),
                6,
            )
            for i in range(len(M))
            if assigned[i] in probes and i != q
        }
        for rank, i in enumerate(sorted(est, key=lambda i: (est[i], i))[:5], 1):
            expect.append((q, int(ids[i]), est[i], rank))
    got = [
        (r.query_id, r.neighbor_id, r.est_dist, r.rank)
        for r in registry.QUERIES["vec_ann_ivf_pq_topk"](spark, sf_oracle).collect()
    ]
    assert got == expect, f"IVF-PQ diverges from numpy reference:\n{got}\nvs\n{expect}"


def test_dsir_target_docs_score_higher(spark, sf_oracle):
    """The DSIR score is a log-likelihood ratio toward the lang='en'
    target: the top-50 must be dominated by en documents (the signal
    the resampler exists to produce)."""
    rows = registry.QUERIES["text_dsir_importance"](spark, sf_oracle).collect()
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_oracle}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    en = sum(1 for r in rows if docs[r.doc_id] == "en")
    base = sum(1 for v in docs.values() if v == "en") / len(docs)
    # hashed 1024-bucket features mix languages, so the lift is real but
    # modest: require the top-50 en share to clear the corpus base rate
    # (~0.44 at sf0.01) by 8 points, not dominance
    assert en / len(rows) >= base + 0.08, (
        f"{en}/{len(rows)} en in top-50 vs base rate {base:.2f} — no lift"
    )


def test_exact_substring_profile_consistency(spark, sf_oracle):
    """dup_frac must equal n_dup_grams/n_grams and duplicated spans are
    symmetric: every reported doc shares each counted gram with some
    OTHER doc, so no doc can have dup_frac > 0 alone."""
    rows = registry.QUERIES["dedup_exact_substring"](spark, sf_oracle).collect()
    assert len(rows) >= 2, "fixture contains near-identical docs; expect >= 2"
    for r in rows:
        assert abs(r.dup_frac - r.n_dup_grams / r.n_grams) < 1e-6, r
        assert 0 < r.n_dup_grams <= r.n_grams, r


def test_cdc_apply_tombstoned_keys_absent(spark, sf_oracle):
    """A key whose LATEST change is a tombstone must not appear in the
    applied state; a key that appears must carry its latest value."""
    from assignment4_spark.io_util import table as _table

    state = {
        r.user_id: r.final_value
        for r in registry.QUERIES["ts_cdc_apply"](spark, sf_oracle).collect()
    }
    ev = (
        _table(spark, sf_oracle, "events")
        .orderBy("ts", "event_id")
        .select("user_id", "event_type", "value")
        .collect()
    )
    last = {}
    for r in ev:
        last[r.user_id] = r
    for uid, r in last.items():
        if r.event_type == "error":
            assert uid not in state, f"tombstoned key {uid} survived"
        else:
            assert uid in state and abs(state[uid] - round(r.value, 6)) < 1e-6, uid


def test_bfs_layers_structure(spark, sf_oracle):
    """BFS layer invariants: layer 0 equals the source-set size, layers
    are contiguous from 0, and every layer is non-empty (a gap would
    mean the frontier loop dropped a round)."""
    from assignment4_spark.io_util import table as _table

    rows = registry.QUERIES["graph_bfs_layers"](spark, sf_oracle).collect()
    layers = [r.layer for r in rows]
    assert layers == list(range(len(layers))), f"non-contiguous layers {layers}"
    n_sources = (
        _table(spark, sf_oracle, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select("s_suppkey")
        .distinct()
        .count()
    )
    assert rows[0].n_vertices == n_sources, "layer 0 must be exactly the sources"
    assert all(r.n_vertices > 0 for r in rows)
    # bipartite parity: even layers are suppliers (odd ids), odd layers parts
    for r in rows:
        if r.layer % 2 == 0:
            assert r.min_v % 2 == 1 and r.max_v % 2 == 1, r
        else:
            assert r.min_v % 2 == 0 and r.max_v % 2 == 0, r


def test_bpe_apply_token_count_bounds(spark, sf_oracle):
    """Shipped-model BPE encode invariants over the whole fixture:
    every word is at least one token and no token can exceed its word,
    so n_words ≤ n_tokens ≤ non-space chars; chars_per_token is exactly
    their quotient; merges only ever REDUCE the raw char tokenization."""
    rows = registry.QUERIES["text_bpe_apply"](spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r.n_words <= r.n_tokens, r
        assert r.n_tokens >= 0, r
        if r.n_tokens:
            # chars-no-space recoverable from the quotient
            n_chars_ns = round(r.chars_per_token * r.n_tokens)
            assert r.n_tokens <= n_chars_ns, r


def test_answer_select_spans_come_from_their_documents(spark, sf_oracle):
    """Extractive guarantee: every answer is a literal substring of its
    own document's text, ranks are distinct 1..k (k ≤ 5), and the
    chosen chunk has the maximal term-overlap among that document's
    chunks (ties to the earliest chunk)."""
    from assignment4_spark.io_util import table as load_table

    out = registry.QUERIES["rag_answer_select"](spark, sf_oracle).collect()
    assert 1 <= len(out) <= 5
    assert sorted(r.doc_rank for r in out) == list(range(1, len(out) + 1))
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_oracle, "documents")
        .filter(F.col("doc_id").isin([r.doc_id for r in out]))
        .collect()
    }
    terms = {"vector", "join", "scan"}
    for r in out:
        text = docs[r.doc_id]
        assert r.answer in text, (r.doc_id, r.answer[:40])
        # reference best chunk: same stride/window as the operator
        best = (-1, None)
        starts = range(0, max(len(text), 1), 100)
        for ci, s0 in enumerate(starts):
            chunk = text[s0 : s0 + 120]
            score = sum(1 for t in chunk.lower().split(" ") if t in terms)
            if score > best[0]:
                best = (score, ci)
        assert r.n_match == best[0] and r.answer_chunk == best[1], (r, best)


def test_kmv_estimator_branch_matches_replay(spark):
    """The n >= k estimator branch of agg_approx_distinct is dead at
    fixture cardinalities (max 150 distinct < k=256), so pin it here:
    a synthetic group with 1000 distinct hashes must yield exactly
    (k-1) * 2^32 / h_(k) computed by a pure-Python replay, and a small
    group must take the exact-count fallback."""
    import hashlib

    from assignment4_spark.operators.aggregates import _KMV_K, kmv_estimate

    def h32(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    big = [("big", h32(i)) for i in range(1000)]
    small = [("small", h32(i)) for i in range(40)]
    df = spark.createDataFrame(big + small, "g string, hv long").distinct()
    got = {r.g: r.approx_users for r in kmv_estimate(df, "g", "hv").collect()}

    kth = sorted(h for _, h in big)[_KMV_K - 1]
    want_big = round((_KMV_K - 1) * 4294967296.0 / kth, 2)
    assert got["big"] == want_big
    assert got["small"] == 40.0
    # sanity: the estimate is within 15% of truth for 1000 distinct
    assert abs(got["big"] - 1000) / 1000 < 0.15


def test_ks_drift_matches_pure_python(spark, sf_oracle):
    """agg_ks_drift must equal a brute-force numpy two-sample KS on the
    same fixture rows: D = sup_v |F_a(v) - F_b(v)| evaluated at every
    observed value, and the reported argmax is the smallest value
    attaining it."""
    import numpy as np
    import pandas as pd

    ev = pd.read_parquet(f"{sf_oracle}/events.parquet", columns=["event_type", "value"])
    a = np.sort(ev.loc[ev.event_type == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev.event_type == "purchase", "value"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    gap = np.abs(fa - fb)
    d_ref = gap.max()
    at_ref = grid[np.argmax(gap)]  # argmax returns the FIRST max → smallest value

    row = registry.QUERIES["agg_ks_drift"](spark, sf_oracle).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.ks_d - d_ref) < 1e-6
    assert row.ks_at_value == at_ref


def test_psi_drift_replay_and_zero_identity(spark, sf_oracle):
    """agg_psi_drift must equal the pure-Python smoothed-PSI replay on
    the fixture, and PSI of a window against itself must be exactly 0
    (every term's p_cur == p_ref)."""
    import math

    import pandas as pd

    ev = pd.read_parquet(f"{sf_oracle}/events.parquet", columns=["ts", "value"])
    bins = ev["value"].floordiv(50).clip(upper=9).astype(int)
    ref = bins[ev.ts < pd.Timestamp("2024-01-15")].value_counts().reindex(range(10), fill_value=0)
    cur = bins[ev.ts >= pd.Timestamp("2024-01-15")].value_counts().reindex(range(10), fill_value=0)
    p_ref = (ref + 0.5) / (ref.sum() + 5.0)
    p_cur = (cur + 0.5) / (cur.sum() + 5.0)
    terms = [round((pc - pr) * math.log(pc / pr), 6) for pr, pc in zip(p_ref, p_cur)]

    out = registry.QUERIES["agg_psi_drift"](spark, sf_oracle).collect()
    assert [r.bin_id for r in out] == list(range(10))
    for r, t in zip(out, terms):
        assert abs(r.psi_term - t) < 1e-9, (r.bin_id, r.psi_term, t)
    assert abs(out[0].psi_total - round(sum(terms), 6)) < 1e-9
    # identity THROUGH THE OPERATOR: every row weighted 1 in BOTH
    # windows → per-bin n_ref == n_cur and equal totals, so p_ref ==
    # p_cur and every term (and the total) must be exactly 0.0
    from assignment4_spark import api

    same = spark.createDataFrame(
        [(i % 3, 1, 1) for i in range(12)], "b int, r int, c int"
    )
    out0 = api.psi_binned(same, 3, bin_col="b", ref_col="r", cur_col="c").collect()
    assert len(out0) == 3
    assert all(r.psi_term == 0.0 and r.psi_total == 0.0 for r in out0)


def test_mutual_information_replay_and_nonnegative(spark, sf_oracle):
    """agg_mutual_information must equal the pure-Python plug-in MI
    replay on the fixture joint counts; the total is ≥ 0 up to the
    per-term 6 dp rounding (MI is nonnegative analytically)."""
    import json
    import math

    import pandas as pd

    ev = pd.read_parquet(f"{sf_oracle}/events.parquet", columns=["event_type", "props"])
    k = ev["props"].map(lambda s: json.loads(s)["k"]) // 25
    joint = pd.crosstab(ev["event_type"], k)
    n = joint.values.sum()
    terms = {}
    for x in joint.index:
        for y in joint.columns:
            nxy = joint.loc[x, y]
            if nxy:
                terms[(x, int(y))] = round(
                    (nxy / n) * math.log(nxy * n / (joint.loc[x].sum() * joint[y].sum())), 6
                )
    out = registry.QUERIES["agg_mutual_information"](spark, sf_oracle).collect()
    assert len(out) == len(terms)
    for r in out:
        assert abs(r.mi_term - terms[(r.event_type, r.k_bucket)]) < 1e-9
    total = round(sum(terms.values()), 6)
    assert abs(out[0].mi_total - total) < 1e-9
    assert out[0].mi_total >= -1e-5 * len(terms)


def test_context_pack_greedy_prefix(spark, sf_oracle):
    """rag_context_pack output must be a contiguous greedy prefix:
    ctx_rank = 1..n with no holes, n_tokens is the whitespace token
    count of its own chunk_text, cum_tokens is the exact running sum,
    and the budget (160) is respected while non-trivially used."""
    out = registry.QUERIES["rag_context_pack"](spark, sf_oracle).collect()
    assert [r.ctx_rank for r in out] == list(range(1, len(out) + 1))
    run = 0
    for r in out:
        assert r.n_tokens == len([t for t in r.chunk_text.split(" ") if t])
        run += r.n_tokens
        assert r.cum_tokens == run
    assert 0 < run <= 160


def test_attribution_lasttouch_replay(spark, sf_oracle):
    """ts_attribution_lasttouch vs a pure-pandas replay: for every
    purchase, the attributed click must be the user's latest click at
    or before the purchase (ties by event_id) IFF it falls inside the
    7-day lookback, with the exact integer-truncated gap."""
    import pandas as pd

    ev = pd.read_parquet(
        f"{sf_oracle}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    ev = ev[ev.event_type.isin(["click", "purchase"])].sort_values(
        ["user_id", "ts", "event_id"]
    )
    want = {}
    last_click = {}
    for r in ev.itertuples():
        if r.event_type == "click":
            last_click[r.user_id] = (r.event_id, r.ts)
        else:
            lc = last_click.get(r.user_id)
            gap_us = (r.ts - lc[1]).value // 1000 if lc else None  # ns → µs
            if lc and gap_us <= 7 * 86400 * 1_000_000:
                want[r.event_id] = (lc[0], gap_us // 1_000_000)
            else:
                want[r.event_id] = (None, None)
    out = registry.QUERIES["ts_attribution_lasttouch"](spark, sf_oracle).collect()
    assert len(out) == len(want)
    for r in out:
        assert (r.attr_click_id, r.gap_s) == want[r.purchase_id], r.purchase_id


def test_matryoshka_eval_numpy_replay(spark, sf_oracle):
    """vec_matryoshka_eval vs a numpy replay of the exact truncated
    cosine argmax (6-dp-rounded score, neighbor-id tie-break) at every
    level; level 64 must always agree with itself."""
    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"{sf_oracle}/embeddings.parquet")
    M = np.array([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    out = registry.QUERIES["vec_matryoshka_eval"](spark, sf_oracle).collect()
    by_key = {(r.level, r.query_id): r for r in out}
    for q in range(5):
        qv = M[ids == q][0]
        for lv in (8, 16, 32, 64):
            a, b = M[:, :lv], qv[:lv]
            denom = np.linalg.norm(a, axis=1) * np.linalg.norm(b)
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = np.where(denom != 0, a @ b / denom, np.nan)
            cand = [
                (round(float(s), 6), int(i))
                for s, i in zip(sims, ids)
                if i != q and not np.isnan(s)
            ]
            best = max(cand, key=lambda t: (t[0], -t[1]))
            r = by_key[(lv, q)]
            assert (r.top1_id, r.sim_r) == (best[1], best[0]), (lv, q)
        assert by_key[(64, q)].agree_full == 1


def test_tv_drift_bounds_and_counts(spark, sf_oracle):
    """stream_tv_drift_daily invariants: tv_dist ∈ [0, 1] for every
    day, per-day n_day totals reconcile with the raw event counts, and
    the reference window's own days score near zero (they ARE the
    reference mass)."""
    import pandas as pd

    out = registry.QUERIES["stream_tv_drift_daily"](spark, sf_oracle).collect()
    ev = pd.read_parquet(f"{sf_oracle}/events.parquet", columns=["ts"])
    want_counts = ev.ts.dt.floor("D").value_counts()
    assert len(out) == len(want_counts)
    for r in out:
        assert 0.0 <= r.tv_dist <= 1.0, r
        assert r.n_day == int(want_counts[pd.Timestamp(r.day)]), r
        assert 1 <= r.n_bins_present <= 10
    ref_days = [r for r in out if pd.Timestamp(r.day) < pd.Timestamp("2024-01-15")]
    assert ref_days and all(r.tv_dist < 0.2 for r in ref_days)


def test_embedding_drift_numpy_replay(spark, sf_oracle):
    """vec_embedding_drift vs a numpy replay of the exact-decimal
    per-dim means and the integer-micro centroid cosine."""
    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"{sf_oracle}/embeddings.parquet")
    M = np.array([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    lo, hi = M[emb.label < 5], M[emb.label >= 5]
    # replay the op's arithmetic: round each component to 6 dp, exact sums
    m_lo = np.round(np.round(lo, 6).sum(axis=0) / len(lo), 6)
    m_hi = np.round(np.round(hi, 6).sum(axis=0) / len(hi), 6)
    lo_u = np.round(m_lo * 1e6).astype(np.int64)
    hi_u = np.round(m_hi * 1e6).astype(np.int64)
    cos = round(
        float(
            (lo_u * hi_u).sum()
            / (np.sqrt(float((lo_u * lo_u).sum())) * np.sqrt(float((hi_u * hi_u).sum())))
        ),
        6,
    )
    out = registry.QUERIES["vec_embedding_drift"](spark, sf_oracle).collect()
    assert len(out) == 64
    for r in out:
        assert abs(r.mean_lo - m_lo[r.dim - 1]) < 1e-9, r.dim
        assert abs(r.mean_hi - m_hi[r.dim - 1]) < 1e-9, r.dim
        assert abs(r.centroid_cosine - cos) < 1e-9


@pytest.mark.slow
def test_cluster_representative_is_max_quality_member(spark, sf_oracle):
    """Each cluster's representative is a member of that cluster with
    the maximum quality (min doc_id on ties), and cluster membership /
    sizes agree with dedup_connected_components."""
    comps = {
        r.doc_id: (r.comp_id, r.comp_size)
        for r in registry.QUERIES["dedup_connected_components"](
            spark, sf_oracle
        ).collect()
    }
    quality = {
        r.doc_id: r.quality
        for r in registry.QUERIES["text_quality_score"](spark, sf_oracle).collect()
    }
    reps = registry.QUERIES["dedup_cluster_representative"](spark, sf_oracle).collect()
    assert {r.comp_id for r in reps} == {c for c, _ in comps.values()}
    for r in reps:
        assert comps[r.rep_doc_id] == (r.comp_id, r.comp_size)
        members = [d for d, (c, _) in comps.items() if c == r.comp_id]
        best_q = max(quality[d] for d in members)
        assert r.rep_quality == best_q
        assert r.rep_doc_id == min(d for d in members if quality[d] == best_q)


def test_fertility_is_ratio_of_bpe_apply_sums(spark, sf_oracle):
    """text_fertility_by_lang must equal the per-lang ratio of
    text_bpe_apply's per-doc token/word sums — corpus-weighted, never
    an average of per-doc ratios."""
    import pandas as pd

    per_doc = registry.QUERIES["text_bpe_apply"](spark, sf_oracle).toPandas()
    langs = pd.read_parquet(f"{sf_oracle}/documents.parquet", columns=["doc_id", "lang"])
    j = per_doc.merge(langs, on="doc_id")
    out = registry.QUERIES["text_fertility_by_lang"](spark, sf_oracle).collect()
    assert sum(r.n_docs for r in out) == len(per_doc)
    for r in out:
        g = j[j.lang == r.lang]
        assert r.total_words == int(g.n_words.sum())
        assert r.total_tokens == int(g.n_tokens.sum())
        assert r.fertility == round(
            int(g.n_tokens.sum()) / max(int(g.n_words.sum()), 1), 6
        )


def test_curriculum_order_partitions_and_positions(spark, sf_oracle):
    """Every document appears exactly once; stages agree with the
    shared quality score's literal band edges; positions are dense
    1..n per (stage, shard) and ordered by the md5 shuffle key."""
    import pandas as pd

    out = registry.QUERIES["sample_curriculum_order"](spark, sf_oracle).toPandas()
    docs = pd.read_parquet(f"{sf_oracle}/documents.parquet", columns=["doc_id"])
    assert sorted(out.doc_id) == sorted(docs.doc_id)
    assert set(out.stage) <= {1, 2, 3, 4}
    for (_, _), g in out.groupby(["stage", "shard"]):
        assert sorted(g.pos_in_shard) == list(range(1, len(g) + 1))
    q = {
        r.doc_id: r.quality
        for r in registry.QUERIES["text_quality_score"](spark, sf_oracle).collect()
    }
    for r in out.itertuples():
        band = 1 if q[r.doc_id] < 0.25 else 2 if q[r.doc_id] < 0.5 else 3 if q[r.doc_id] < 0.75 else 4
        assert r.stage == band


def test_label_propagation_pure_python_replay(spark, sf_oracle):
    """graph_label_propagation vs a dict-based replay of 3 synchronous
    most-frequent/min-tie rounds over the same bipartite edges."""
    from collections import Counter, defaultdict

    import pandas as pd

    li = pd.read_parquet(f"{sf_oracle}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    pairs = {(int(p) * 2, int(s) * 2 + 1) for p, s in zip(li.l_partkey, li.l_suppkey)}
    adj = defaultdict(list)
    for p, s in pairs:
        adj[p].append(s)
        adj[s].append(p)
    labels = {v: v for v in adj}
    for _ in range(3):
        new = {}
        for v, nbrs in adj.items():
            cnt = Counter(labels[u] for u in nbrs)
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        labels = new
    sizes = Counter(labels.values())
    want = sorted(((n, c) for c, n in sizes.items()), key=lambda t: (-t[0], t[1]))[:20]
    out = registry.QUERIES["graph_label_propagation"](spark, sf_oracle).collect()
    assert [(r.n_vertices, r.community) for r in out] == want


@pytest.mark.slow
def test_cluster_holdout_no_straddling_edges(spark, sf_oracle):
    """sample_cluster_holdout's leak-freedom invariant: no edge of the
    near-dup match graph (the dedup_connected_components clusters) may
    straddle a split boundary, every doc gets exactly one split, and
    the per-split (n_keys, n_docs) aggregate matches a driver-side
    recount of the same assignment."""
    from assignment4_spark.io_util import table

    comps = {
        r.doc_id: r.comp_id
        for r in registry.QUERIES["dedup_connected_components"](
            spark, sf_oracle
        ).collect()
    }
    import hashlib

    def split_of(key: int) -> str:
        h = hashlib.md5(str(key).encode()).hexdigest()[0]
        return {"c": "val", "d": "val", "e": "test", "f": "test"}.get(h, "train")

    doc_ids = [
        r.doc_id for r in table(spark, sf_oracle, "documents").select("doc_id").collect()
    ]
    assign = {d: split_of(comps.get(d, d)) for d in doc_ids}
    # leak-freedom: clustered docs inherit their cluster's split, so two
    # docs in one component can never differ
    by_comp: dict = {}
    for d, c in comps.items():
        by_comp.setdefault(c, set()).add(assign[d])
    assert all(len(s) == 1 for s in by_comp.values())

    rows = registry.QUERIES["sample_cluster_holdout"](spark, sf_oracle).collect()
    got = {r.split: (r.n_keys, r.n_docs) for r in rows}
    want: dict = {}
    keys: dict = {}
    for d in doc_ids:
        sp = assign[d]
        want[sp] = want.get(sp, 0) + 1
        keys.setdefault(sp, set()).add(comps.get(d, d))
    assert got == {sp: (len(keys[sp]), n) for sp, n in want.items()}


def test_profile_enrich_processor_pure_replay(spark, sf_oracle):
    """The transformWithStateInPandas processor (_ProfileEnrich) cannot
    execute in this container (its state protocol imports protobuf), so
    its logic is pinned here without the runtime: micro-batch slices in
    (ts, event_id) order are fed through handleInputRows with fake
    per-key ValueState/MapState objects, and the concatenated output
    must equal stream_profile_enrich's batch two-window declaration
    row-for-row — the same end-of-stream contract the skipped
    equivalence test asserts where protobuf exists."""
    import pandas as pd

    from assignment4_spark.io_util import table
    from assignment4_spark.streaming.stream_impl import _ProfileEnrich

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeMapState:
        def __init__(self):
            self._m = {}

        def containsKey(self, k):
            return k in self._m

        def updateValue(self, k, v):
            self._m[k] = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, FakeValueState())

        def getMapState(self, name, ks, vs, ttlDurationMs=None):
            return self.states.setdefault(name, FakeMapState())

    ev = (
        table(spark, sf_oracle, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    n_slices = 6
    step = (len(ev) + n_slices - 1) // n_slices
    procs: dict = {}
    outs = []
    for i in range(n_slices):
        batch = ev.iloc[i * step : (i + 1) * step]
        for uid, grp in batch.groupby("user_id"):
            if uid not in procs:
                p = _ProfileEnrich()
                p.init(FakeHandle())
                procs[uid] = p
            outs.extend(procs[uid].handleInputRows((uid,), iter([grp]), None))
    got = (
        pd.concat(outs, ignore_index=True)
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = (
        registry.QUERIES["stream_profile_enrich"](spark, sf_oracle)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "event_id", "purchase_total", "n_types_seen"]],
        want[["user_id", "event_id", "purchase_total", "n_types_seen"]],
        check_dtype=False,
    )


def test_stateful_rounding_matches_spark_half_up(spark):
    """The Python stateful processors round running totals with
    _round2_half_up; on exactly-representable 2-dp ties (.125, .375 …)
    Python's built-in round() (half-even) diverges from Spark's
    F.round (HALF_UP on the shortest decimal rendering) by 0.01 — the
    exact drift the batch/stream equivalence contract forbids. Pin the
    helper against Spark itself on the tie values, where round() is
    known-wrong."""
    from assignment4_spark.streaming.stream_impl import _round2_half_up

    ties = [0.125, 0.375, 1.125, 2.625, -0.125, 1000.875, 0.005, 2.675]
    got = [_round2_half_up(x) for x in ties]
    want = [
        r[0]
        for r in spark.createDataFrame([(x,) for x in ties], "x double")
        .select(F.round("x", 2).alias("r"))
        .collect()
    ]
    assert got == want, list(zip(ties, got, want))
    # and the built-in would indeed have diverged on the half-even ties
    assert round(0.125, 2) != _round2_half_up(0.125)


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 30),                      # key
            st.one_of(st.none(), st.integers(-50, 50)),  # v1
            st.one_of(st.none(), st.integers(-50, 50)),  # v2
        ),
        min_size=1,
        max_size=40,
    )
)
def test_expectations_gate_partitions_batch_exactly(spark, rows):
    """_gate_expectations is an exact partition of the batch: every row
    lands in passing XOR quarantined, a row passes iff EVERY predicate
    is exactly TRUE (NULL violates), the reason column is the sorted
    comma-joined failed names, and the stats counters equal the
    per-row replay."""
    from assignment4_spark.operators.lakehouse import (
        QUARANTINE_REASON_COL,
        _gate_expectations,
    )

    df = spark.createDataFrame(
        [(i, k, v1, v2) for i, (k, v1, v2) in enumerate(rows)],
        "rid long, k long, v1 long, v2 long",
    )
    exp = {"v1_nonneg": "v1 >= 0", "v2_small": "v2 < 25"}
    passing, quarantined, stats = _gate_expectations(df, exp)
    got_pass = {r.rid for r in passing.collect()}
    quar_rows = {r.rid: r[QUARANTINE_REASON_COL] for r in quarantined.collect()}

    def failed(v1, v2):
        out = []
        if not (v1 is not None and v1 >= 0):
            out.append("v1_nonneg")
        if not (v2 is not None and v2 < 25):
            out.append("v2_small")
        return out

    want_pass, want_quar, by = set(), {}, {"v1_nonneg": 0, "v2_small": 0}
    for i, (k, v1, v2) in enumerate(rows):
        f = failed(v1, v2)
        for name in f:
            by[name] += 1
        if f:
            want_quar[i] = ",".join(sorted(f))
        else:
            want_pass.add(i)
    assert got_pass == want_pass
    assert quar_rows == want_quar
    assert stats["n_batch"] == len(rows)
    assert stats["quarantined"] == len(want_quar)
    assert stats["by_expectation"] == by
    assert stats["checked"] == ["v1_nonneg", "v2_small"]
