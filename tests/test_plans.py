"""Physical-plan quality gates (SURVEY §4.2: "verify with df.explain()
in tests").

Correctness says what a query returns; these tests pin HOW it runs —
the properties that decide whether the same plan survives a 1000×
scale-up: filters reaching the parquet scan, column pruning, broadcast
for small dims, rank-limit pushdown, and whole-stage codegen coverage.
A regression here (e.g. a schema change breaking pushdown, or an
accidental UDF wrapping a filter) would pass the oracle and silently
become the bottleneck at scale."""

from __future__ import annotations

import contextlib
import io

import pytest

from assignment4_spark import registry

registry.load_all()


def formatted_plan(spark, name: str, sf: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        registry.QUERIES[name](spark, sf).explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "name,pushed_fragment",
    [
        ("agg_groupby_basic", "LessThanOrEqual(l_shipdate"),
        ("filter_conjunct", "GreaterThan(l_quantity,30.0)"),
        ("proj_select_alias", "LessThanOrEqual(l_orderkey,1000)"),
        ("join_broadcast", "LessThanOrEqual(p_size,20)"),
    ],
)
def test_filters_reach_parquet_scan(spark, sf_oracle, name, pushed_fragment):
    plan = formatted_plan(spark, name, sf_oracle)
    assert pushed_fragment in plan, f"{name}: predicate not pushed to scan"


def test_column_pruning_q1(spark, sf_oracle):
    """The flagship aggregation must read 7 of lineitem's 16 columns."""
    plan = formatted_plan(spark, "agg_groupby_basic", sf_oracle)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read and "l_shipinstruct" not in read
    n_cols = read.count(":")  # struct<a:t,b:t,...> → one ':' per column
    assert n_cols <= 8, f"scan reads too many columns: {read}"


def test_small_dim_joins_broadcast(spark, sf_oracle):
    for name in ("join_broadcast", "join_inner_shuffle"):
        plan = formatted_plan(spark, name, sf_oracle)
        assert "BroadcastHashJoin" in plan, f"{name}: expected broadcast join"
        assert "SortMergeJoin" not in plan


def test_topk_per_group_uses_window_group_limit(spark, sf_oracle):
    """Spark 4's InferWindowGroupLimit must prune rank>k before the
    shuffle — the difference between shuffling k rows per group and the
    whole table."""
    plan = formatted_plan(spark, "win_topk_per_group", sf_oracle)
    assert "WindowGroupLimit" in plan


def test_narrow_ops_do_not_shuffle(spark, sf_oracle):
    """Pure per-row ops (chunking, embedding, metadata projection) must
    stay narrow: no Exchange anywhere in the plan."""
    for name in ("rag_chunk_text", "rag_embed_hash", "rag_metadata_project"):
        plan = formatted_plan(spark, name, sf_oracle)
        assert "Exchange" not in plan, f"{name}: unexpected shuffle"


def test_partition_pruning_reaches_scan(spark, sf_oracle):
    """The date filter must land in PartitionFilters (directory pruning),
    not as a row-level filter over every partition's files."""
    plan = formatted_plan(spark, "scan_partition_pruning", sf_oracle)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_date" in pf and "2024-01-03" in pf, pf


def test_bucketed_join_is_colocated(spark, sf_oracle):
    """Joining the two bucketed tables must be a sort-merge join with NO
    exchange on the join keys — the buckets are the shuffle, paid once
    at write time."""
    plan = formatted_plan(spark, "join_bucketed_colocated", sf_oracle)
    assert "SortMergeJoin" in plan
    assert "hashpartitioning(o_custkey" not in plan
    assert "hashpartitioning(c_custkey" not in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_whole_stage_codegen_covers_flagship(spark, sf_oracle):
    """AQE hides codegen spans until the plan is final (and the engine's
    ensure_confs keeps AQE on by design), so execute the query and
    inspect the final adaptive plan for WholeStageCodegen spans."""
    df = registry.QUERIES["agg_groupby_basic"](spark, sf_oracle)
    df.collect()
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark operators inside a WholeStageCodegen subtree
    assert "*(" in final_plan, final_plan[:500]
    assert "isFinalPlan=true" in final_plan


def test_theta_range_join_is_hash_not_nested_loop(spark, sf_oracle):
    """The time-bucketed rewrite must plan as a hash/sort-merge equi join
    on (user, bucket) — a BroadcastNestedLoopJoin or CartesianProduct
    here means the rewrite regressed to the quadratic form."""
    plan = formatted_plan(spark, "join_theta_range", sf_oracle)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_sql_pushdown_and_pruning(spark, sf_oracle):
    """The SQL face goes through the same Catalyst pipeline: Q6's three
    filters must reach the lineitem scan, and Q1 must prune to the 7
    needed columns."""
    plan = formatted_plan(spark, "sql_q6_forecast_revenue", sf_oracle)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1]
    plan = formatted_plan(spark, "sql_q1_pricing_summary", sf_oracle)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_pivot_plan_shape(spark, sf_oracle):
    """Catalyst's pivot rewrite is two chained aggregations
    (groupBy(day,type) → pivot_first over day) plus the orderBy
    exchange — exactly 3 Exchanges. More would mean the rewrite
    regressed (the other pivot hazard — a missing value list triggering
    an eager distinct() job — happens at DataFrame build time and is
    excluded by construction: the operator passes explicit values)."""
    import re

    plan = formatted_plan(spark, "agg_pivot", sf_oracle)
    # formatted output repeats each node in tree + detail; count details
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 3, plan


def test_sampling_is_single_pass(spark, sf_oracle):
    """Hash-split ops are a narrow projection + one partial aggregation:
    a single shuffle for the final tiny group-by and nothing else."""
    import re

    for name in ("sample_split_hash", "sample_stratified_hash"):
        plan = formatted_plan(spark, name, sf_oracle)
        # one Exchange for the group-by, one for the orderBy (detail
        # entries counted once; formatted output repeats tree + detail)
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges <= 2, f"{name}: extra shuffle\n{plan}"


def test_kmeans_assign_broadcasts_centroids(spark, sf_oracle):
    """The corpus side must never shuffle for the assignment: centroids
    arrive via BroadcastExchange and the join is a broadcast join."""
    plan = formatted_plan(spark, "vec_kmeans_assign", sf_oracle)
    assert "BroadcastExchange" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_edit_distance_dedup_is_blocked_join(spark, sf_oracle):
    """The blocking key must make the self-join an equi join (hash or
    SMJ) — a nested-loop plan would mean the brand key fell out of the
    join condition and the comparison went O(N²)."""
    plan = formatted_plan(spark, "dedup_edit_distance", sf_oracle)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hybrid_bm25_has_no_explode(spark, sf_oracle):
    """BM25 term frequencies must stay per-term COLUMNS over the token
    array (size(filter(...)) inside codegen) — a Generate (explode) node
    would mean the corpus fans out |tokens|× before aggregating."""
    plan = formatted_plan(spark, "rag_hybrid_bm25_cosine", sf_oracle)
    assert "Generate" not in plan


def test_pii_redact_is_narrow_scan(spark, sf_oracle):
    """Redaction is a pure projection: the only Exchange allowed is the
    deterministic orderBy at the end."""
    import re

    plan = formatted_plan(spark, "text_pii_redact", sf_oracle)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, plan


def test_dynamic_partition_pruning_fires(spark, sf_oracle):
    """The dim-join filter must reach the partitioned fact scan at
    RUNTIME via a dynamicpruningexpression subquery — static
    PartitionFilters are impossible here (the surviving dates are only
    known after the dim's own filter runs)."""
    plan = formatted_plan(spark, "scan_dynamic_partition_prune", sf_oracle)
    assert "dynamicpruning" in plan.lower(), plan[:800]


def test_contamination_join_is_broadcast(spark, sf_oracle):
    """dedup_contamination: the eval-posting side must reach the training
    side as a BroadcastHashJoin (inverted index), never a cross join —
    the property that keeps decontamination linear in the train corpus."""
    plan = formatted_plan(spark, "dedup_contamination", sf_oracle)
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_retention_cohort_sizes_join_broadcast(spark, sf_oracle):
    """ts_retention_cohort: the cohort-sizes frame (≤ #weeks rows) joins
    the retention aggregate via broadcast, and the plan contains no
    cartesian fallback."""
    plan = formatted_plan(spark, "ts_retention_cohort", sf_oracle)
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "CartesianProduct" not in plan


def test_rrf_windows_are_rank_only(spark, sf_oracle):
    """rag_rrf_fusion: exactly the two ranking Window nodes and no
    explode — BM25 tf columns stay as codegen'd array expressions (the
    same gate rag_hybrid_bm25_cosine carries)."""
    plan = formatted_plan(spark, "rag_rrf_fusion", sf_oracle)
    assert plan.count("Window") >= 2
    assert "Generate" not in plan, plan[:800]


def test_scd2_windows_share_one_exchange(spark, sf_oracle):
    """ts_scd2_history: lag and lead partition by the same key over the
    same sort, so the plan carries exactly ONE hash-partitioning
    exchange (the final presentation orderBy adds a range exchange, not
    a second hash shuffle)."""
    plan = formatted_plan(spark, "ts_scd2_history", sf_oracle)
    assert plan.count("hashpartitioning(user_id") == 1, plan[:1200]


def _hash_exchange_specs(plan: str) -> list[str]:
    """Partitioning specs of every hash Exchange in a formatted plan
    (the spec lives on an Arguments: line, not the tree line)."""
    import re

    return re.findall(r"hashpartitioning\([^)]*\)", plan)


def test_sessionize_single_exchange(spark, sf_oracle):
    """Both sessionize windows and BOTH rollups (per-session, per-user)
    must ride ONE user_id exchange — the grouping keys are co-located
    within the window partitioning, and a second hashpartitioning would
    mean the raw stream shuffles twice at 100 TB."""
    plan = formatted_plan(spark, "ts_sessionize", sf_oracle)
    specs = _hash_exchange_specs(plan)
    assert len(specs) == 1 and "user_id" in specs[0], specs


def test_reservoir_sample_is_topk_not_sort(spark, sf_oracle):
    """Bottom-k-by-hash must compile to TakeOrderedAndProject (per-
    partition heaps + driver merge), never a full global Sort."""
    plan = formatted_plan(spark, "sample_reservoir_hash", sf_oracle)
    assert "TakeOrderedAndProject" in plan, plan


def test_quantize_int8_no_shuffle_no_python(spark, sf_oracle):
    """The quantization audit is a pure scan-side projection: any
    Exchange or Python worker in this plan is a scale bug."""
    import re

    plan = formatted_plan(spark, "vec_quantize_int8", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    # the final orderBy is presentation; everything before it must be
    # exchange-free and JVM-side
    assert "ArrowEvalPython" not in body and "BatchEvalPython" not in body
    exchanges = re.findall(r"\(\d+\) Exchange", body)
    assert len(exchanges) <= 1, body  # only the final sort's range exchange
    assert not _hash_exchange_specs(body), body  # and it is never a hash shuffle


def test_phash_single_signature_exchange(spark, sf_oracle):
    """Image-dedup bucketing may shuffle the 64-bit signature once; the
    blobs (text col) must not appear in any exchanged schema."""
    plan = formatted_plan(spark, "multimodal_image_phash", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    specs = _hash_exchange_specs(body)
    assert len(specs) == 1 and "phash" in specs[0] and "text" not in specs[0], specs


def test_bloom_prefilter_before_exchange(spark, sf_oracle):
    """The bloom bit-test must run scan-side (below the join's
    exchanges), and the fact side must still merge-join after it."""
    plan = formatted_plan(spark, "join_bloom_prefilter", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" in body
    # the literal-bitset probe shows up as shiftright(...) in a Filter
    filter_lines = [l for l in body.splitlines() if "shiftright" in l]
    assert filter_lines, "bloom bit-test missing from plan"


def test_skew_salted_join_is_shuffle_not_broadcast(spark, sf_oracle):
    """Salting only means anything on a SHUFFLE join: Spark's stats
    estimate happily broadcast-hashes the 8×-replicated dim (slow build,
    and a broadcast join has no per-reducer hot key to split), so the
    plan must hold to SortMergeJoin on the widened (key, salt)."""
    plan = formatted_plan(spark, "join_skew_salted", sf_oracle)
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_regr_slope_single_window_pass(spark, sf_oracle):
    """All five sufficient statistics (n, Σx, Σy, Σxy, Σx²) must fuse
    into ONE Window operator over one hash exchange — a second window
    pass would double the sort cost for zero semantic gain."""
    import re

    plan = formatted_plan(spark, "win_regr_slope", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Window", body)) == 1, body
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 2, body  # window + sort


def test_interval_overlap_pushdown_and_pruning(spark, sf_oracle):
    """The incident side's event_type filter must reach its parquet
    scan, and neither scan may read the wide props column."""
    plan = formatted_plan(spark, "join_interval_overlap", sf_oracle)
    assert "EqualTo(event_type,error)" in plan, plan
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads and all("props" not in l for l in reads), reads


def test_interpolate_shares_one_window_sort(spark, sf_oracle):
    """Backward and forward neighbor lookups use the same (user_id;
    ts, is_grid) ordering with different frames: Spark must evaluate
    all four ignore-nulls lookups over ONE sorted window pass (they
    fuse into a single Window operator — frames are per-function), so
    the union is exchanged and sorted exactly once before it."""
    import re

    plan = formatted_plan(spark, "ts_interpolate_linear", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert 1 <= len(re.findall(r"\(\d+\) Window", body)) <= 2, body
    sorts = re.findall(r"\(\d+\) Sort", body)
    assert len(sorts) <= 2, body  # the window sort + the final orderBy


def test_triangle_closure_is_equi_join(spark, sf_oracle):
    """The wedge-closing join is normalized to id order so it stays an
    equi-join — an OR-of-orientations condition would silently become a
    BroadcastNestedLoopJoin and go quadratic on the wedge count."""
    plan = formatted_plan(spark, "graph_triangle_count", sf_oracle)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_audio_windows_arrow_fanout(spark, sf_oracle):
    """The audio decoder stub must run as ONE Arrow-batched python
    stage (MapInPandas) over a doc_id-only scan — the fan-out happens
    inside the worker, never as a Catalyst explode of decoded rows."""
    plan = formatted_plan(spark, "multimodal_audio_windows", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "MapInPandas" in body, body
    read = next(l for l in body.splitlines() if "ReadSchema" in l)
    assert "text" not in read and "lang" not in read, read


def test_streaks_single_data_exchange(spark, sf_oracle):
    """Gaps-and-islands: the lag window, the running-sum window, the
    per-island aggregation AND the per-user rollup must all ride ONE
    user_id exchange (the aggs reuse the window's partitioning) — only
    the presentation sort may add a second exchange."""
    import re

    plan = formatted_plan(spark, "win_streaks_islands", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Window", body)) == 2, body
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 2, body


def test_simhash_banded_join_not_all_pairs(spark, sf_oracle):
    """The banded simhash candidate join must plan as an equi join on
    band_key — a BroadcastNestedLoopJoin or CartesianProduct means the
    pair scan regressed to the O(N²) theta form."""
    plan = formatted_plan(spark, "dedup_simhash", sf_oracle)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pack_sequences_single_data_exchange(spark, sf_oracle):
    """Sequence packing: the per-shard running-sum window and the
    (shard, pack_id) rollup must ride ONE shard exchange — partitioning
    by shard already clusters (shard, pack_id), so only the
    presentation sort may add a second exchange."""
    import re

    plan = formatted_plan(spark, "text_pack_sequences", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Window", body)) == 1, body
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 2, body


def test_near_embedding_blockpair_plan(spark, sf_oracle):
    """The exact near-dup scan must be the distributed block-pair shape:
    broadcast-routed sides into ONE cogrouped Arrow stage — never a
    cartesian/nested-loop pair join, never a driver-side collect (the
    plan has no LocalTableScan of the corpus)."""
    plan = formatted_plan(spark, "dedup_near_embedding", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in body
    assert "BroadcastNestedLoopJoin" not in body
    assert "FlatMapCoGroupsInPandas" in body
    assert "BroadcastHashJoin" in body


def test_shuffle_hash_is_takeordered(spark, sf_oracle):
    """The deterministic global shuffle's top-k must plan as
    TakeOrderedAndProject (per-partition top-k + driver merge) — a
    row_number-over-global-order formulation would single-partition the
    whole corpus."""
    plan = formatted_plan(spark, "sample_shuffle_hash", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "TakeOrderedAndProject" in body, body


def test_dedup_pipeline_no_allpairs_and_broadcast_compmap(spark, sf_oracle):
    """The end-to-end dedup pipeline must keep the LSH candidate
    generation bucketed (no cartesian / nested-loop anywhere in the
    composed plan) and join the component map back onto the corpus as a
    BROADCAST join — the map is bounded by clustered docs, never the
    corpus."""
    plan = formatted_plan(spark, "dedup_pipeline_survivors", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in body, body
    assert "BroadcastNestedLoopJoin" not in body, body
    assert "BroadcastHashJoin" in body, body


def test_class_balance_is_window_group_limit(spark, sf_oracle):
    """Per-class capping must plan as WindowGroupLimit (per-partition
    top-60 heap before the rank filter), not a full per-class sort +
    post-filter."""
    plan = formatted_plan(spark, "sample_class_balance", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "WindowGroupLimit" in body, body


def test_mix_proportions_quota_broadcast(spark, sf_oracle):
    """The quota frame (one row per class) must broadcast onto the
    ranked corpus; the rank itself must be group-limited."""
    plan = formatted_plan(spark, "sample_mix_proportions", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in body, body
    assert "CartesianProduct" not in body, body


def test_repetition_filter_trigram_narrow(spark, sf_oracle):
    """The trigram dup-fraction side is a narrow per-row expression:
    the whole query may shuffle only for the (doc,token) count, the
    per-doc rollup, and the doc_id join — no window, no extra explode
    exchange on the trigram side."""
    import re

    plan = formatted_plan(spark, "text_repetition_filter", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Window", body)) == 0, body
    assert "CartesianProduct" not in body, body


def test_cms_sketch_joins_broadcast(spark, sf_oracle):
    """The 3 CMS sketch frames (≤512 rows each) must broadcast back onto
    the vocabulary, and the top-20 must be a TakeOrderedAndProject —
    never a global sort of the vocab."""
    plan = formatted_plan(spark, "agg_cms_heavy_hitters", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("BroadcastHashJoin") >= 3, body
    assert "TakeOrderedAndProject" in body, body
    assert "SortMergeJoin" not in body, body


def test_dsir_ratio_table_broadcasts(spark, sf_oracle):
    """The 1024-row log-ratio table must broadcast onto the token
    stream (the corpus-sized side never shuffles for the scoring join);
    top-50 is a TakeOrdered."""
    plan = formatted_plan(spark, "text_dsir_importance", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in body, body
    assert "TakeOrderedAndProject" in body, body
    assert "SortMergeJoin" not in body, body


def test_exact_substring_no_allpairs(spark, sf_oracle):
    """The duplicated-gram join must stay an equi hash join on the gram
    hash — never a cartesian/nested-loop — and both aggregation levels
    must be hash aggregates (map-side combinable)."""
    plan = formatted_plan(spark, "dedup_exact_substring", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in body, body
    assert "BroadcastNestedLoopJoin" not in body, body
    assert "HashAggregate" in body, body
    # the explicit repartition on h is the ONE exchange serving both
    # the (h, doc_id) aggregate and the n_docs window (2 Exchange → 1);
    # losing it silently reintroduces the second gram shuffle
    assert "REPARTITION_BY_COL" in body, body


def test_semantic_cluster_pair_join_is_equi(spark, sf_oracle):
    """SemDeDup's within-cluster pair scan must join on centroid_id as
    an equi join (SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin) —
    the only nested-loop joins allowed are the single-row centroid-array
    broadcasts; a CartesianProduct means the cluster bucketing died."""
    plan = formatted_plan(spark, "dedup_semantic_cluster", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in body, body
    assert ("SortMergeJoin" in body) or ("ShuffledHashJoin" in body) or (
        body.count("BroadcastHashJoin") >= 1
    ), body


def test_pq_encode_rowlocal_no_shuffle(spark, sf_oracle):
    """PQ encode is a pure row-local expression pipeline over one scan:
    the only exchanges are the single-row codebook broadcast and the
    presentation sort — no data shuffle, no Python worker."""
    import re

    plan = formatted_plan(spark, "vec_pq_quantize", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Exchange", body)) <= 2, body
    assert "EvalPython" not in body, body
    assert "Generate" not in body, body  # no explode — argmin is in-row


def test_ivf_pq_inverted_list_join_shape(spark, sf_oracle):
    """IVF-PQ: probes and LUTs broadcast (BroadcastHashJoin), the rank
    is WindowGroupLimit-pruned, and the corpus side never enters a
    cartesian — its only exchange is the inverted-list equi join."""
    plan = formatted_plan(spark, "vec_ann_ivf_pq_topk", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("BroadcastHashJoin") >= 2, body
    assert "WindowGroupLimit" in body, body
    assert "CartesianProduct" not in body, body


def test_ltob_windows_share_one_exchange(spark, sf_oracle):
    """LTOB: ntile + the neighbor triangle ride ONE per-series sort, and
    the bucket argmax reuses the event_type hash partitioning (hash on
    event_type clusters (event_type, bucket)) — so the whole operator
    has exactly one data exchange plus the presentation sort, and the
    argmax is WindowGroupLimit-pruned."""
    import re

    plan = formatted_plan(spark, "ts_downsample_ltob", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 2, body
    assert "WindowGroupLimit" in body, body


def test_bigram_count_tables_broadcast(spark, sf_oracle):
    """Bigram LM scoring: the bigram/unigram count tables broadcast onto
    the bigram stream; adjacent pairs come from a window (one per-doc
    exchange), never a positional self-join of the token stream."""
    plan = formatted_plan(spark, "text_bigram_logprob", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("BroadcastHashJoin") >= 2, body
    assert "SortMergeJoin" not in body, body


def test_snapshot_read_pins_v1_files(spark, sf_oracle):
    """The AS-OF-v1 read must scan only commit 1's data files — if the
    v2 batch directory appears in the scan, snapshot isolation is
    broken."""
    plan = formatted_plan(spark, "scan_snapshot_time_travel", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "batch2" not in body, body


def test_cusum_shares_one_series_exchange(spark, sf_oracle):
    """CUSUM: the running sum and the peak rank partition by the same
    key, so they ride one per-series exchange (plus the stats broadcast
    and the presentation sort); the rank is WindowGroupLimit-pruned."""
    import re

    plan = formatted_plan(spark, "ts_changepoint_cusum", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "WindowGroupLimit" in body, body
    assert "BroadcastHashJoin" in body, body
    # stats agg + one data exchange (event_type) + presentation sort
    assert len(re.findall(r"\(\d+\) Exchange", body)) <= 3, body


def test_cdc_apply_single_window_exchange(spark, sf_oracle):
    """CDC apply: latest-pick and change-count share one (user_id)
    exchange — the whole operator is that exchange plus the
    presentation sort. (No WindowGroupLimit: the change-count window
    legitimately needs every row before the rank filter may prune.)"""
    import re

    plan = formatted_plan(spark, "ts_cdc_apply", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Exchange", body)) <= 2, body
    assert len(re.findall(r"\(\d+\) Window", body)) == 2, body


def test_containment_is_postings_join(spark, sf_oracle):
    """Containment pairs: the pair generation must be the inverted-index
    equi join on the shingle — never a cartesian/nested-loop document
    pair scan — and the size frame broadcasts."""
    plan = formatted_plan(spark, "dedup_containment_pairs", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in body, body
    assert "BroadcastNestedLoopJoin" not in body, body
    assert "BroadcastHashJoin" in body, body


def test_rake_topk_and_broadcast_wordstats(spark, sf_oracle):
    """RAKE: the word-stat and phrase-length joins broadcast (vocab- and
    phrase-bounded sides), the top-20 is a TakeOrderedAndProject, and
    nothing degenerates to a nested loop."""
    plan = formatted_plan(spark, "text_rake_keywords", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "TakeOrderedAndProject" in body, body
    assert body.count("BroadcastHashJoin") >= 2, body
    assert "CartesianProduct" not in body, body
    assert "SortMergeJoin" not in body, body


def test_group_holdout_is_pure_aggregation(spark, sf_oracle):
    """Group holdout: split assignment is a narrow projection — the
    whole op must plan as scan + aggregates, no join of any kind."""
    plan = formatted_plan(spark, "sample_group_holdout", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in body, body
    assert "HashAggregate" in body, body


def test_spatial_epsilon_is_grid_equi_join(spark, sf_oracle):
    """The ε-join must be an equi join on the grid cell (the 3×3
    replication is a 9-element explode, not a join) — a nested loop or
    cartesian means the grid decomposition regressed to O(N²)."""
    plan = formatted_plan(spark, "join_spatial_epsilon", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in body, body
    assert "BroadcastNestedLoopJoin" not in body, body
    assert "Generate" in body, body  # the cell-neighborhood explode


def test_ivf_build_stats_rowlocal_assignment(spark, sf_oracle):
    """Build stats: assignment must stay the broadcast row-local argmax
    (no explode of corpus×k, no shuffle before the occupancy agg)."""
    plan = formatted_plan(spark, "vec_ivf_build_stats", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "Generate" not in body, body
    assert "BroadcastExchange" in body, body


def test_tumbling_topk_rank_is_group_limited(spark, sf_oracle):
    """Windowed top-k: the rank must be WindowGroupLimit-pruned and the
    rank exchange must carry the per-window count table, not events
    (two data exchanges: window×user agg, then window rank)."""
    plan = formatted_plan(spark, "stream_tumbling_topk", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "WindowGroupLimit" in body, body


def test_lang_id_eval_single_scan_no_join(spark, sf_oracle):
    """Classifier + eval in one scan: the label rides the row, so the
    plan must contain no join at all."""
    plan = formatted_plan(spark, "text_lang_id_eval", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in body, body


def test_scene_cuts_single_video_exchange(spark, sf_oracle):
    """Scene segmentation: lag + scene-id windows and the scene rollup
    share the per-video partitioning — one data exchange plus the
    presentation sort."""
    import re

    plan = formatted_plan(spark, "multimodal_scene_cuts", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Exchange", body)) <= 2, body


def test_sign_hamming_broadcast_and_group_limit(spark, sf_oracle):
    """Sign-bit ANN: the 3-row query side must broadcast (never a
    shuffled join), and the top-10 rank window must be pruned by
    WindowGroupLimit before its exchange."""
    plan = formatted_plan(spark, "vec_sign_binary_hamming", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" in body or "BroadcastHashJoin" in body, body
    assert "SortMergeJoin" not in body
    assert "WindowGroupLimit" in body, body


def test_jaccard_neighbors_wedge_topk(spark, sf_oracle):
    """Neighborhood Jaccard: size lookups broadcast, the global top-20
    is a TakeOrdered (per-partition top-k + tiny driver merge), never a
    full global sort."""
    plan = formatted_plan(spark, "graph_jaccard_neighbors", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "TakeOrderedAndProject" in body, body
    assert "BroadcastHashJoin" in body, body


def test_weighted_median_sketch_narrows_before_sort(spark, sf_oracle):
    """Binned path: the cumulative window must run over the per-bin
    sketch (HashAggregate BEFORE the first Window), the crossing-bin
    lookup must broadcast, and no sort-merge join may appear — the
    full-data per-group sort is exactly what this plan avoids."""
    plan = formatted_plan(spark, "agg_weighted_median", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in body, body
    assert "SortMergeJoin" not in body, body
    agg_pos = body.find("HashAggregate")
    win_pos = body.find("Window")
    assert agg_pos != -1 and win_pos != -1
    assert agg_pos < win_pos, body


def test_char_entropy_telescoping_aggs(spark, sf_oracle):
    """Entropy must be two cascaded hash aggregations with map-side
    partials — no window, no join: the char explode collapses before
    any exchange."""
    plan = formatted_plan(spark, "text_char_entropy", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in body, body
    assert "Window" not in body, body
    assert "HashAggregate" in body, body


def test_binned_sketch_window_rides_sketch(spark, sf_oracle):
    """The cumulative window must run over the aggregated sketch (rows
    = bins), i.e. AFTER a HashAggregate — and the probe join must be a
    broadcast, never shuffled."""
    plan = formatted_plan(spark, "agg_binned_quantile_sketch", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" not in body, body
    agg_pos = body.find("HashAggregate")
    win_pos = body.rfind("Window")
    assert agg_pos != -1 and win_pos != -1
    # formatted explain numbers operators leaf-first: the bin aggregate
    # must appear BEFORE the cumulative window — a window over raw rows
    # (the O(N) single-partition blowup this gate exists for) would
    # print the other way around
    assert agg_pos < win_pos, body


def test_hard_negatives_broadcast_group_limit(spark, sf_oracle):
    """Hard-negative mining: broadcast query side, rank window pruned
    by WindowGroupLimit, never a shuffled join."""
    plan = formatted_plan(spark, "vec_hard_negatives", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" in body or "BroadcastHashJoin" in body, body
    assert "SortMergeJoin" not in body
    assert "WindowGroupLimit" in body, body


def test_seasonal_profile_telescoping_broadcast(spark, sf_oracle):
    """Seasonal profile: one data exchange (the hourly agg), the
    per-type totals derived from the profile, and the join back must
    broadcast."""
    import re

    plan = formatted_plan(spark, "ts_seasonal_profile", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in body, body
    assert "SortMergeJoin" not in body
    # hourly agg exchange + totals agg exchange + presentation sort;
    # broadcast exchanges excluded from the count
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", body)) <= 2, body


def test_q21_single_lineitem_scan_and_exchange(spark, sf_oracle):
    """Q21 (DataFrame form): the EXISTS / NOT EXISTS probes must ride
    window aggregates over the lineitem⋈orders join's own l_orderkey
    partitioning — one scan of the fact table, one hash exchange of it,
    supplier/nation broadcast. The spark.sql() text planned THREE
    lineitem exchanges (round-4 tripwire, BASELINE.md 3.4×)."""
    import re

    plan = formatted_plan(spark, "sql_q21_waiting_supplier", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("lineitem.parquet") == 1, body
    assert "BroadcastHashJoin" in body, body
    # lineitem side: the orderkey join exchange; orders side: its own;
    # plus the final groupBy(s_name) agg exchange. No more.
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", body)) <= 3, body
    assert "TakeOrderedAndProject" in body, body


def test_answer_select_broadcast_and_narrow_tail(spark, sf_oracle):
    """Extractive Q&A: after the top-5 rank window, the document join
    must broadcast the 5-row candidate frame (never shuffle documents
    against it) and the best-chunk pick must stay a plain window — no
    sort-merge join, no cartesian product anywhere."""
    plan = formatted_plan(spark, "rag_answer_select", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in body, body
    assert "SortMergeJoin" not in body, body
    assert "CartesianProduct" not in body, body


def test_bpe_apply_single_narrow_projection(spark, sf_oracle):
    """Shipped-model BPE encode must be ONE narrow codegen projection:
    no exchange other than the presentation sort, no UDF/Python eval,
    no join, no explode (Generate)."""
    import re

    plan = formatted_plan(spark, "text_bpe_apply", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", body)) == 0, body
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Generate", "Join"):
        assert bad not in body, (bad, body)
    # the whole encode is Project directly over the scan (the one
    # exchange is the presentation sort's rangepartitioning)
    assert re.search(r"Project \(\d+\)\s*\n\s*\+- Scan parquet", body), body


def test_centroid_outliers_telescoping_broadcast(spark, sf_oracle):
    """Centroid-outlier screen: the corpus never shuffles — the only
    exchanges are the two single-row aggregates (centroid, moments),
    both joined back as broadcasts; no sort-merge join."""
    plan = formatted_plan(spark, "vec_centroid_outliers", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" in body or "BroadcastHashJoin" in body, body
    assert "SortMergeJoin" not in body, body
    assert "CartesianProduct" not in body, body


def test_scd2_pointintime_join_free_single_exchange(spark, sf_oracle):
    """AS-OF read: no join operator anywhere — the union + last-non-null
    window replaces it — and every window rides user_id partitioning
    (the presentation sort is the only other exchange)."""
    import re

    plan = formatted_plan(spark, "ts_scd2_pointintime", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in body, body
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", body)) <= 2, body


def test_kmv_window_prunes_map_side(spark, sf_oracle):
    """agg_approx_distinct's k-smallest selection must run as a
    WindowGroupLimit (map-side per-task top-k before the exchange) —
    the literal rank<=k filter is what keeps per-group state bounded at
    any cardinality; a count().over(group) companion window would drag
    the full distinct set into one task per group."""
    plan = formatted_plan(spark, "agg_approx_distinct", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "WindowGroupLimit" in body, body


def test_table_profile_single_scan_expand_agg(spark, sf_oracle):
    """scan_table_profile's one-pass claim: the whole profile (count,
    null counts, four EXACT NDVs, min/max/avg) plans as ONE scan of
    orders feeding ONE Expand-based aggregate — Catalyst's multi-
    COUNT(DISTINCT) rewrite — not one scan per statistic."""
    plan = formatted_plan(spark, "scan_table_profile", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("orders.parquet") == 1, body
    assert "Expand" in body, body
    assert "Join" not in body, body


def test_expectations_gate_single_fact_scan(spark, sf_oracle):
    """All seven expectation counters must ride ONE scan of orders
    (FK probe = broadcast join to the customer key set) — a per-check
    scan would multiply the 100 TB read by the contract size."""
    plan = formatted_plan(spark, "scan_expectations_gate", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("orders.parquet") == 1, body
    assert body.count("customer.parquet") == 1, body
    assert "BroadcastHashJoin" in body, body


def test_nearest_spatial_residual_broadcast(spark, sf_oracle):
    """join_nearest_spatial: the only cartesian is the residual
    fallback, and its BROADCAST side must be the query residual (the
    sparse tail) — the candidate corpus streams. Phase 1 stays an
    equi-join on the grid cell."""
    plan = formatted_plan(spark, "join_nearest_spatial", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin Cross BuildLeft" in body, body
    # phase 1 itself is localCheckpointed (its broadcast grid equi-join
    # materializes behind the ExistingRDD scan), so the residual path is
    # what the final plan must prove: anti-join against the checkpointed
    # winners, then the BuildLeft cross above
    assert "LeftAnti" in body, body
    assert "localCheckpoint" in body, body


def test_paragraph_rewrite_agg_not_window(spark, sf_oracle):
    """dedup_paragraph_rewrite's first-occurrence decision must be the
    map-side-combinable min(struct(doc_id,pos)) AGGREGATE on the
    segment — a window over the raw segment stream would sort every
    replica of a hot segment in one task (the skew the agg form
    avoids)."""
    plan = formatted_plan(spark, "dedup_paragraph_rewrite", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "partial_min" in body, body
    assert "Window" not in body, body


def test_ks_drift_distributed_prefix_sum(spark, sf_oracle):
    """KS drift: the CDF must be the DISTRIBUTED prefix-sum form — the
    local running sums ride a window partitioned on the physical
    partition id (parallel), the offset correction and grand totals
    arrive by BROADCAST join, and the tail is TakeOrdered(1). A
    `Window.orderBy(value)` with no partition key would plan the whole
    distinct-value frame through Exchange SinglePartition — the 100 TB
    bottleneck this gate exists to forbid. (The plan reads the lazily
    checkpointed CDF frame as an RDD scan, so the parquet pushdown is
    not visible here; the IN-filter pushdown idiom is pinned by the
    other scan gates.)"""
    plan = formatted_plan(spark, "agg_ks_drift", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "hashpartitioning(pid" in body, body
    assert "BroadcastHashJoin" in body, body
    assert "BroadcastNestedLoopJoin Cross BuildRight" in body, body  # 1-row totals
    assert "TakeOrderedAndProject" in body, body
    assert "SortMergeJoin" not in body, body


def test_psi_drift_single_scan_partial_agg(spark, sf_oracle):
    """PSI: one scan of events, a map-side partial aggregate on the 10
    literal-edge bins (two HashAggregate nodes), no join anywhere —
    the scan is the whole cost at scale."""
    plan = formatted_plan(spark, "agg_psi_drift", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("events.parquet") == 1, body
    assert body.count("HashAggregate") >= 2, body
    assert "Join" not in body, body


def test_mutual_information_marginals_over_joint(spark, sf_oracle):
    """MI: one scan of events feeding the joint-cell aggregate; both
    marginals and the grand total must be windows over the joint (a
    Window node, no self-join of the aggregate and no second scan)."""
    plan = formatted_plan(spark, "agg_mutual_information", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("events.parquet") == 1, body
    assert "Window" in body, body
    assert "Join" not in body, body


def test_context_pack_broadcast_candidates(spark, sf_oracle):
    """Context packing: the 5-row candidate frame broadcasts against
    documents (same corpus-side plan as rag_answer_select); nothing
    downstream may sort-merge or go cartesian."""
    plan = formatted_plan(spark, "rag_context_pack", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in body, body
    assert "SortMergeJoin" not in body, body
    assert "CartesianProduct" not in body, body


def test_incremental_merge_delta_only_scan(spark, sf_oracle):
    """agg_incremental_merge's refresh claim: the orders FACT scan
    appears ONCE (the delta period, filter pushed to parquet); the
    closed history arrives from the stored MV partial (orders_monthly_mv
    parquet), and the merge is an aggregate over the union of partials —
    no join anywhere."""
    plan = formatted_plan(spark, "agg_incremental_merge", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("orders.parquet") == 1, body
    assert "orders_monthly_mv" in body, body
    assert "Join" not in body, body
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in body, body


def test_gopher_rules_single_scan_no_shuffle(spark, sf_oracle):
    """text_gopher_rules must be scan-bound: one documents scan reading
    only (doc_id, text); the word stats ride ONE array traversal whose
    struct result unpacks through a single fan-out-1 inline Generate
    (the projection-collapse barrier — without it every stat re-splits
    the text); no aggregate exchange, and the only exchange is the
    output sort (rangepartitioning on doc_id)."""
    plan = formatted_plan(spark, "text_gopher_rules", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("documents.parquet") == 1, body
    assert body.count("Generate (") == 1, body  # the single inline unpack
    assert body.count("aggregate(") == 1, body  # ONE words traversal
    assert "HashAggregate" not in body, body
    assert "rangepartitioning(doc_id" in body, body
    assert "hashpartitioning" not in body, body


def test_attribution_lasttouch_join_free_single_exchange(spark, sf_oracle):
    """ts_attribution_lasttouch must be the union+window decomposition,
    not an as-of join: one events scan (type filter pushed), zero Join
    nodes, exactly one hashpartitioning(user_id) exchange feeding the
    carry-forward window, plus only the presentation sort."""
    plan = formatted_plan(spark, "ts_attribution_lasttouch", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("events.parquet") == 1, body
    assert "Join" not in body, body
    assert body.count("hashpartitioning(user_id") == 1, body
    assert "PushedFilters" in body, body
    pushed = body.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "event_type" in pushed, body


def test_matryoshka_eval_single_corpus_scan_broadcast_queries(spark, sf_oracle):
    """vec_matryoshka_eval: corpus scanned ONCE with the 5-query side
    broadcast (BroadcastNestedLoopJoin — the deliberate exact-path
    cross join); the per-level explode happens AFTER the pair
    arithmetic; the top-1 rank window is WindowGroupLimit-pruned
    map-side so the shuffle carries candidates, not the pair frame."""
    plan = formatted_plan(spark, "vec_matryoshka_eval", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("embeddings.parquet") == 2, body  # corpus + broadcast query side
    assert "BroadcastNestedLoopJoin" in body, body
    assert "WindowGroupLimit" in body, body


def test_embedding_drift_single_scan_dim_agg(spark, sf_oracle):
    """vec_embedding_drift: one embeddings scan posexploded to (dim,
    value) feeding ONE hash aggregate keyed on 64 dims (both sides'
    sums and counts as conditional aggs in the same pass — no second
    scan, no join); the exchange carries dim-keyed partials, never
    vectors."""
    plan = formatted_plan(spark, "vec_embedding_drift", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("embeddings.parquet") == 1, body
    assert body.count("Generate (") == 1, body
    assert "Join" not in body, body
    assert "hashpartitioning(dim" in body, body


def test_fertility_single_scan_one_agg_no_join(spark, sf_oracle):
    """text_fertility_by_lang: the whole encode is a narrow codegen
    projection over ONE documents scan feeding ONE map-side-combinable
    hash agg keyed on lang (partial + final around a lang exchange);
    no join, no window, no explode."""
    plan = formatted_plan(spark, "text_fertility_by_lang", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("documents.parquet") == 1, body
    assert "Join" not in body, body
    assert "Window" not in body, body
    assert "Generate (" not in body, body
    assert "hashpartitioning(lang" in body, body


def test_curriculum_order_no_global_window(spark, sf_oracle):
    """sample_curriculum_order: stages come from literal quality edges
    (narrow projection, no corpus rank pass) and positions from a
    window partitioned by (stage, shard) — NEVER a corpus-wide
    single-partition window; one documents scan, no join."""
    plan = formatted_plan(spark, "sample_curriculum_order", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("documents.parquet") == 1, body
    assert "Join" not in body, body
    assert "SinglePartition" not in body, body
    assert "hashpartitioning(stage" in body, body


def test_cluster_representative_broadcasts_membership(spark, sf_oracle):
    """dedup_cluster_representative: the checkpointed component frame
    (stat-less RDD scan) must be EXPLICITLY broadcast onto the
    corpus-sized quality scan — never a SortMergeJoin that shuffles the
    corpus to meet a cluster-members-sized frame; the survivor rank
    window is WindowGroupLimit-pruned."""
    plan = formatted_plan(spark, "dedup_cluster_representative", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" not in body, body
    assert "BroadcastHashJoin" in body, body
    assert "WindowGroupLimit" in body, body
    assert body.count("documents.parquet") == 1, body


def test_label_propagation_window_free_rounds(spark, sf_oracle):
    """graph_label_propagation: every round's per-vertex argmax is a
    max(struct) aggregate, so the WHOLE job plans zero Window nodes;
    the final top-20 is TakeOrdered (never a global sort)."""
    plan = formatted_plan(spark, "graph_label_propagation", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "Window" not in body, body
    assert "TakeOrderedAndProject" in body, body


def test_cluster_holdout_broadcasts_membership(spark, sf_oracle):
    """sample_cluster_holdout: the component membership frame (stat-less
    checkpointed RDD scan out of the CC loop) must be EXPLICITLY
    broadcast onto the corpus doc_id scan — a SortMergeJoin here would
    shuffle the corpus to meet a cluster-members-sized frame; the final
    rollup is a plain hash aggregate, no window anywhere."""
    plan = formatted_plan(spark, "sample_cluster_holdout", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" not in body, body
    assert "BroadcastHashJoin" in body, body
    assert "Window" not in body, body
    assert "HashAggregate" in body, body


def test_merge_upsert_snapshot_read_pruned_narrow(spark, sf_oracle):
    """merge_upsert: the returned plan is the AS-OF snapshot read +
    one hash aggregate. The scan must prune the key column (the agg
    needs only status/ver/price — at 100 TB reading k too is a third
    more I/O), keep the partial-agg before the single status exchange,
    and plan no join/window: MERGE work happens at commit time, never
    on the read path."""
    plan = formatted_plan(spark, "merge_upsert", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    read = next(l for l in body.splitlines() if "ReadSchema" in l)
    assert "struct<ver" in read and "k:" not in read, read
    # exactly the agg exchange + the presentation-sort exchange (count
    # tree nodes "Exchange (n)" — details repeat each name once more)
    import re

    assert len(re.findall(r"Exchange \(\d+\)", body)) == 2, body
    assert "SortMergeJoin" not in body and "Window" not in body, body
    assert "HashAggregate" in body, body


def test_pattern_match_single_data_exchange(spark, sf_oracle):
    """MATCH_RECOGNIZE-lite: the row_number window and the three
    anchor windows (conditional MAX + two last-ignorenulls) must all
    ride ONE user_id exchange — compatible orderings stack on the
    same partitioning; only the presentation sort may add a second
    exchange. No join: the anchor is carried by window state, so a
    SortMergeJoin here means the single-pass reformulation regressed
    to a self-join."""
    import re

    plan = formatted_plan(spark, "win_pattern_match", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Window", body)) == 2, body
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 2, body
    assert "Join" not in body, body


def test_asof_directional_single_exchange_no_join(spark, sf_oracle):
    """Directional as-of: the backward and forward carries must ride
    ONE user_id exchange (two sorts — the two tie orderings — but no
    re-partitioning between them) and contain NO join: a join here
    means the union+window as-of idiom regressed to a range join."""
    import re

    plan = formatted_plan(spark, "join_asof_directional", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Window", body)) == 2, body
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 2, body  # data + sort
    assert "Join" not in body, body


def test_poisson_bootstrap_narrow_fanout(spark, sf_oracle):
    """The 8x replicate fan-out must be a narrow generator explode (no
    shuffle before the aggregate): exactly the partial-agg exchange
    plus the presentation sort, no join, and the scan must prune to
    (doc_id, n_chars) — drawing from the hash never reads the text."""
    import re

    plan = formatted_plan(spark, "sample_poisson_bootstrap", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 2, body
    assert "Join" not in body, body
    read = next(l for l in body.splitlines() if "ReadSchema" in l)
    assert "text" not in read, read


def test_stl_decompose_partitioned_window_pruned_scan(spark, sf_oracle):
    """ts_stl_decompose: the trend window must be PARTITIONED (per
    event_type — no all-to-one-partition global window), and the events
    scan must prune to the three used columns."""
    plan = formatted_plan(spark, "ts_stl_decompose", sf_oracle)
    assert "Window" in plan
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read and "event_id" not in read
    # every window spec must carry the event_type partition key (a
    # global window renders windowspecdefinition(day ASC...) with no
    # partition column — the all-to-one-partition shape)
    specs = [l for l in plan.splitlines() if "windowspecdefinition(" in l]
    assert specs and all(
        "windowspecdefinition(event_type" in l for l in specs
    ), "every window must partition by event_type"
    # the seasonal component is a second window, NOT an agg+self-join:
    # exactly one events scan node in the whole plan (formatted explain
    # prints each node twice — tree line + numbered detail block)
    import re as _re

    assert len(_re.findall(r"\(\d+\) Scan parquet", plan)) == 1, (
        "events must be scanned once"
    )


def test_threshold_sweep_broadcasts_threshold_relation(spark, sf_oracle):
    """dedup_threshold_sweep: the 5-row threshold relation must join
    broadcast (never shuffle the pair list by threshold), and the
    O(N^2) BLAS stage appears once (FlatMapCoGroups), not once per
    threshold."""
    import re as _re

    plan = formatted_plan(spark, "dedup_threshold_sweep", sf_oracle)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert len(_re.findall(r"\(\d+\) FlatMapCoGroupsInPandas", plan)) == 1, (
        "the O(N^2) BLAS stage must appear exactly once in the plan"
    )


def test_kmv_set_ops_window_group_limit_and_broadcast(spark, sf_oracle):
    """agg_kmv_set_ops: the rank<=k window must prune map-side
    (WindowGroupLimit) so per-pair memory is bounded at any
    cardinality, and the type-pair relation must broadcast."""
    plan = formatted_plan(spark, "agg_kmv_set_ops", sf_oracle)
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_sprt_partial_sums_selection_plan(spark, sf_oracle):
    """agg_sprt_sequential (VERDICT r9 item 3): event_type has ~5
    values, so a running-LLR window partitioned by type alone would
    sort one type's ENTIRE history in a single task. The committed
    plan is selection-by-partial-sums: the ONLY window that touches
    raw events partitions on the 2-key (event_type, bkt); every
    type-only window runs either over the O(buckets) summary
    aggregate or over the single candidate bucket sliced out by a
    BROADCAST join (never sort-merge)."""
    import re as _re

    plan = formatted_plan(spark, "agg_sprt_sequential", sf_oracle)
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar priors
    assert "BroadcastHashJoin" in plan  # the candidate-bucket slice
    # the formatted listing numbers nodes in subtree order, so a node
    # is above another iff its id is larger
    bhj_ids = [
        int(m.group(1))
        for m in _re.finditer(r"\((\d+)\) BroadcastHashJoin", plan)
    ]
    # Window details: Arguments: [...], [PARTITION], [ORDER]
    wins = _re.findall(
        r"\((\d+)\) Window\n.*?\nArguments: .*\], \[([^\]]*)\], "
        r"\[([^\]]*)\]",
        plan,
    )
    assert wins, plan
    assert any(
        "event_type#" in part and "bkt#" in part for _, part, _o in wins
    ), f"no (event_type, bkt)-partitioned walk found: {wins}"
    for nid, part, order in wins:
        if "ts#" in order and "bkt#" not in part:
            # a per-row walk partitioned by type ALONE is legal only
            # over the single candidate bucket, i.e. above the slice's
            # broadcast join — never over the raw scan
            assert any(b < int(nid) for b in bhj_ids), (
                f"unbounded type-only walk at node {nid}: [{part}]"
            )


@pytest.mark.parametrize(
    "name", ["agg_group_sequential", "agg_msprt_always_valid"]
)
def test_sequential_family_windows_only_over_summaries(
    spark, sf_oracle, name
):
    """Group-sequential / mSPRT: the only windows run over the
    per-(type, day) HashAggregate SUMMARY (O(days) rows), never over
    raw events — every Window node must sit ABOVE a HashAggregate in
    the same subtree (the formatted listing numbers nodes in subtree
    order), and no sort-merge join or per-row walk may appear."""
    import re as _re

    plan = formatted_plan(spark, name, sf_oracle)
    assert "SortMergeJoin" not in plan
    assert "(1) Window" not in plan and " Window\nInput" in plan, plan
    # summary windows order by the look/day bucket (a post-aggregate
    # column); a per-row walk would order by ts/event_id — forbid it
    specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for s in specs:
        assert "ts#" not in s and "event_id#" not in s, (
            f"{name}: window walks raw event rows: {s[:120]}"
        )


def test_cuped_is_two_hash_aggs_no_join(spark, sf_oracle):
    """agg_cuped_adjustment: one events scan feeding two chained hash
    aggregates — no join, no window (the closed-form variance identity
    is what makes the adjusted-variance re-aggregation unnecessary)."""
    import re as _re

    plan = formatted_plan(spark, "agg_cuped_adjustment", sf_oracle)
    assert len(_re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan and "Window" not in plan


def test_diff_in_diff_single_scan_no_join(spark, sf_oracle):
    """agg_diff_in_diff: one events scan, two chained aggregates, no
    join/window — the 2x2 pivot is conditional MAXes over 4 rows."""
    import re as _re

    plan = formatted_plan(spark, "agg_diff_in_diff", sf_oracle)
    assert len(_re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan and "Window" not in plan


def test_copurchase_equi_join_and_take_ordered(spark, sf_oracle):
    """graph_copurchase_pairs: the self-join must be an equi join on
    the order key (nested-loop would be |parts|^2), and the top-20 a
    TakeOrdered, never a global sort."""
    plan = formatted_plan(spark, "graph_copurchase_pairs", sf_oracle)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_delete_dv_read_broadcasts_bitmap_words(spark, sf_oracle):
    """merge_delete_dv: the returned snapshot read applies the pending
    deletion vectors as a BROADCAST hash join on the coarse
    (file, word-index) key — never a sort-merge join (the word
    relation is O(deleted rows / 64), always broadcastable) — with
    the per-row position test inlined as one AND+compare (shiftleft
    in the filter), no window, and the final status aggregate
    unchanged from the plain-merge read shape."""
    plan = formatted_plan(spark, "merge_delete_dv", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" not in body, body
    assert "BroadcastHashJoin" in body, body
    assert "shiftleft" in body, body
    assert "Window" not in body, body
    assert "HashAggregate" in body, body


def test_replace_where_read_pruned_no_join(spark, sf_oracle):
    """merge_replace_where: the returned snapshot read is the plain
    pinned-version aggregate — the REPLACE work happened at commit
    time, so the read plans no join and no window, keeps the partial
    agg, and prunes the key column from the scan."""
    plan = formatted_plan(spark, "merge_replace_where", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    read = next(l for l in body.splitlines() if "ReadSchema" in l)
    assert "k:" not in read, read
    assert "SortMergeJoin" not in body and "Window" not in body, body
    assert "HashAggregate" in body, body


def test_delete_where_read_pruned_no_join(spark, sf_oracle):
    """merge_delete_where: like the replace face, the returned read is
    the plain pinned-snapshot aggregate — deletion happened physically
    at commit time, so no join, no window, no pending-delete filter."""
    plan = formatted_plan(spark, "merge_delete_where", sf_oracle)
    body = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" not in body and "Window" not in body, body
    assert "BroadcastHashJoin" not in body, (
        "COW delete must leave NO read-side delete filter"
    )
    assert "HashAggregate" in body, body


def test_optimize_compact_sums_price_in_decimal(spark, sf_oracle):
    """merge_optimize_compact's sum_price must aggregate in EXACT
    decimal, not double: its u2 branch (price/2) puts the Z group's
    true sum on the half-cent rounding boundary, where a parallel
    double SUM is a coin flip on BOTH engines (measured: DuckDB at
    threads=8 split 7/8 across .15/.16 over 15 runs of the r10 oracle;
    Spark's answer moved with core count). Decimal addition is
    associative — order-independent, engine-identical. Reverting to a
    double sum re-arms a driver-hash coin flip."""
    from assignment4_spark import registry

    registry.load_all()
    df = registry.QUERIES["merge_optimize_compact"](spark, sf_oracle)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "decimal(30,10)" in plan, plan
    assert "decimal(30,10)" in registry.ORACLES["merge_optimize_compact"].replace(
        "DECIMAL(30,10)", "decimal(30,10)"
    )
