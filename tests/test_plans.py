"""Physical-plan regression guards (SURVEY.md §5.2.4).

These pin the scale-critical plan properties: predicate pushdown, column
pruning, broadcast joins, map-side partial aggregation, top-k short-circuit.
"""

from __future__ import annotations

from distributed_system_mapreduce_spark.plans import assert_in_plan, explain_str
from distributed_system_mapreduce_spark.registry import QUERIES

from conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    plan = explain_str(QUERIES["filter_predicate"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least the range predicates must be pushed
    assert "GreaterThanOrEqual(l_shipdate" in plan or "IsNotNull(l_discount)" in plan, plan


def test_column_pruning_reads_two_columns(spark):
    plan = explain_str(QUERIES["scan_project_prune"](spark, SF_DIR))
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    # none of the other 9 lineitem columns may be read
    for col in ("l_extendedprice", "l_shipdate", "l_returnflag", "l_partkey"):
        assert col not in read_schema, read_schema


def test_map_side_join_broadcasts(spark):
    assert_in_plan(QUERIES["join_map_side"](spark, SF_DIR), "BroadcastHashJoin")


def test_multiway_join_broadcasts_dims(spark):
    plan = explain_str(QUERIES["join_multiway"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_semi_anti_join_shapes(spark):
    assert "LeftSemi" in explain_str(QUERIES["join_semi"](spark, SF_DIR))
    assert "LeftAnti" in explain_str(QUERIES["join_anti"](spark, SF_DIR))


def test_partial_aggregation_present(spark):
    # MapReduce combiner analogue: partial_ aggregate before the exchange
    plan = explain_str(QUERIES["agg_pricing_summary"](spark, SF_DIR))
    assert "partial_" in plan, plan
    assert "Exchange" in plan


def test_topk_short_circuits(spark):
    assert_in_plan(QUERIES["topk_orders"](spark, SF_DIR), "TakeOrderedAndProject")


def test_whole_stage_codegen_covers_flagship(spark):
    df = QUERIES["agg_pricing_summary"](spark, SF_DIR)
    df.collect()  # finalize the AQE plan so codegen spans are visible
    plan = explain_str(df, mode="formatted")
    assert "isFinalPlan=true" in plan
    assert "codegen id" in plan, plan


def test_tokenization_has_no_python_udf(spark):
    for name in ("word_count", "text_tfidf_top", "sim_topk_query", "text_quality_score"):
        plan = explain_str(QUERIES[name](spark, SF_DIR), mode="simple")
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"
        assert "ArrowEvalPython" not in plan, f"{name} fell off the JVM path"


def test_sort_is_range_partitioned(spark):
    plan = explain_str(QUERIES["sort_global"](spark, SF_DIR))
    assert "rangepartitioning" in plan.lower(), plan


def test_interval_overlap_is_hash_join_not_cartesian(spark):
    # equi-prefix (custkey) must carry the join; the interval predicate is a
    # residual — a cartesian/BNLJ here would be quadratic at corpus scale
    plan = explain_str(QUERIES["join_interval_overlap"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_centroid_norms_single_shuffle_partial_agg(spark):
    # element-wise centroid = unrolled scalar avgs in ONE partial-agg
    # shuffle: no explode (posexplode would shuffle n*dim rows), map-side
    # combine present
    plan = explain_str(QUERIES["embed_centroid_norms"](spark, SF_DIR))
    assert "Generate" not in plan, plan
    assert "partial_" in plan, plan
    # formatted mode prints each node in the tree AND the detail section
    assert sum(1 for l in plan.splitlines() if l.lstrip().startswith("+- Exchange")) == 1, plan


def test_dedup_survivors_anti_join(spark):
    plan = explain_str(QUERIES["dedup_survivors"](spark, SF_DIR))
    assert "LeftAnti" in plan, plan


def test_decontaminate_join_is_equi_and_aqe_sized(spark):
    # the contamination check is a shingle equi-join with NO forced
    # broadcast hint (ADVICE r3: this fixture's doc_id%10 eval split is
    # ~10% of corpus shingles — O(corpus), so a forced broadcast would OOM
    # at scale); AQE picks broadcast only when the eval side is measured
    # small. What must hold at any scale: an equi join, never a cartesian.
    plan = explain_str(QUERIES["corpus_decontaminate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sampling_stays_jvm_side(spark):
    # md5-ordered deterministic samplers are pure window/filter plans — no
    # Python crossing anywhere
    for name in ("sample_stratified", "sample_weighted_mix", "sample_token_budget"):
        plan = explain_str(QUERIES[name](spark, SF_DIR), mode="simple")
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"
        assert "ArrowEvalPython" not in plan, f"{name} fell off the JVM path"




def test_simhash64_block_join_is_equi_not_cartesian(spark):
    # the 64-bit variant must keep the (block_id, block_val) equi-join over
    # distinct codes — a cartesian there is quadratic at corpus scale. The
    # only nested-loop joins allowed are the 1-row scalar summary combines.
    plan = explain_str(QUERIES["dedup_simhash64"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_graph_family_joins_are_equi_not_cartesian(spark):
    # edge build (self-join on l_orderkey), wedge join (shared src vertex),
    # and every PageRank round (join on src) are all equi-joins; a
    # cartesian anywhere is quadratic in |E| at corpus scale. The only
    # nested-loop join allowed is triangle_count's 1-row scalar combine.
    for name in ("graph_degree_hist", "graph_pagerank"):
        plan = explain_str(QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
    tri = explain_str(QUERIES["graph_triangle_count"](spark, SF_DIR))
    assert "CartesianProduct" not in tri, tri


def test_triangle_count_avoids_wedge_materialization(spark):
    # counting goes through per-edge adjacency-array intersection: the plan
    # must contain the array_intersect projection and NO wedge-generating
    # self-join output (sum(outdeg^2) rows — 72M at sf0.1 on this graph)
    plan = explain_str(QUERIES["graph_triangle_count"](spark, SF_DIR))
    assert "array_intersect" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_market_share_broadcasts_dims_and_one_conditional_pass(spark):
    plan = explain_str(QUERIES["sql_market_share"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    # conditional-share aggregation: the lineitem fact scan appears once —
    # no self-join of the revenue stream against a filtered copy of itself
    assert plan.count("lineitem.parquet") <= 1 or "Scan parquet" in plan
    scans = [l for l in plan.splitlines() if "lineitem" in l and "Scan" in l]
    assert len(scans) <= 1, scans


def test_gap_fill_grid_is_broadcast(spark):
    # the hourly grid is bounded by the TIME SPAN, not the corpus — it must
    # be the broadcast side, never a shuffle partner of the rollup
    plan = explain_str(QUERIES["events_gap_fill"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_ewma_stays_jvm_side(spark):
    # the sequential fold is an aggregate HOF over a collected array — no
    # Python crossing, no per-row UDF
    plan = explain_str(QUERIES["events_ewma"](spark, SF_DIR), mode="simple")
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# Registry-wide sweep (VERDICT r4 #3): every registered query's physical plan
# is screened for the two scale-killers — cartesian joins and Python row
# evaluation — not just the ~15 queries with bespoke guards above.
# ---------------------------------------------------------------------------

import pytest

from distributed_system_mapreduce_spark.registry import QUERIES as _ALL

#: sf for plan construction: plan SHAPE (join strategy class, Python nodes)
#: is structural, not size-dependent — non-equi joins can only ever plan as
#: BNLJ/cartesian, and Python nodes are in the logical plan — so the
#: cheapest fixture suffices.
_PLAN_SF = "/root/testdata/sf0.001"

#: Queries whose plans legitimately contain a BroadcastNestedLoopJoin. The
#: invariant for membership: the BROADCAST side is bounded by a constant
#: independent of corpus size. Since r14 (VERDICT r13 #7) membership is a
#: DECLARATION of the structural bound class the broadcast branch carries,
#: verified against the physical plan by
#: test_bnlj_build_sides_structurally_bounded — a new entry cannot
#: silently whitelist an unbounded broadcast. Classes (see
#: plans.checks._classify_build_side):
#:   "scalar"        — grouping-free aggregate (1-row combine: corpus size,
#:                     avgdl, span, vocabulary totals, min/max epoch)
#:   "limit"         — explicit limit / ordered top-k (≤ literal rows)
#:   "local"         — literal/cached driver-bounded frame
#:   "probe"         — constant-literal filter on a unique-key column
#:                     (vec_id < k query/centroid grids; ≤ k rows)
#:   "grouped:<col>" — aggregate keyed by a declared bounded-arity column
#: Every observed BNLJ build side must exhibit at least one declared
#: class. Anything NOT listed here that grows a BNLJ fails the sweep.
_SCALAR_COMBINE_BNLJ = {
    "agg_cms_heavy_hitters": {"scalar"},
    "agg_weighted_median": {"scalar"},
    # per-round 1-row merge-rule broadcast into the vocab table (bounded by
    # construction: limit 1)
    "text_bpe_train": {"limit"},
    # two 1-row scalar combines (total tokens, normalizer Z) into the
    # language-cardinality table
    "sample_temperature_mix": {"scalar"},
    "orders_abc_pareto": {"scalar"},
    "cdc_merge_upserts": {"scalar"},
    # same split-scalar crossJoin(broadcast) as cdc_merge_upserts
    "cdc_snapshot_diff": {"scalar"},
    "corpus_lang_mix_kl": {"scalar"},
    # three stacked 1-row rollups (pair counts, doc exposure, corpus size)
    "corpus_dup_threshold_curve": {"scalar"},
    "embed_cosine_histogram": {"probe"},
    # label-arity centroid grid (k×dim rows; label is a bounded enum)
    "eval_confusion_centroid": {"scalar", "local", "grouped:label"},
    "eval_f1_macro": {"scalar", "local", "grouped:label"},
    "eval_topk_accuracy": {"grouped:label"},
    "eval_mrr_at_k": {"probe"},
    "eval_ndcg_at_k": {"probe"},
    "mv_incremental_refresh": {"scalar"},
    "dedup_cluster": {"scalar"},
    "dedup_near_minhash": {"scalar"},
    "dedup_simhash": {"scalar"},
    "dedup_simhash64": {"scalar"},
    # the ≤4096-code deterministic sample arms carry the limit bound
    "dedup_simhash_block_quality": {"scalar", "limit"},
    "events_gap_fill": {"scalar"},
    "events_inactivity_churn": {"scalar"},
    # types x calendar-hours grid broadcast + two type-arity-bounded
    # median tables (same bounded-grid pattern as events_gap_fill)
    "events_mad_outliers": {"scalar"},
    # 1-row marginal-product combine (pe_nn) into the 1-row agreement agg
    "eval_cohens_kappa": {"scalar"},
    # 1-row (n, vbar) scalar combine into the residual scorer
    "eval_regression_metrics": {"scalar"},
    # two 1-row combines (edge count m; community-count/degree-product)
    "graph_modularity": {"scalar"},
    "events_rolling_dau": {"scalar"},
    "events_series_topk": {"scalar"},
    "events_user_features": {"scalar"},
    "filter_above_avg": {"scalar"},
    "funnel_conversion": {"scalar"},
    "graph_triangle_count": {"scalar"},
    "hybrid_rrf_topk": {"scalar", "probe"},
    "knn_label_vote": {"probe"},
    "layout_zorder_cluster": {"scalar"},
    "sim_pq_recall": {"scalar", "probe"},
    "sql_idle_customers": {"scalar"},
    "sim_ivfpq_recall": {"scalar", "probe"},
    "sample_negative_pairs": {"probe"},
    "pipeline_dedup_corpus": {"scalar"},
    "pipeline_dataset_card": {"scalar"},
    "pipeline_mix_rebalance": {"scalar"},
    "pipeline_train_corpus": {"scalar"},
    "sim_ann_ivf": {"probe"},
    "sim_ann_ivf_mp": {"probe"},
    "sim_ann_recall": {"probe"},
    "sim_ivf_nprobe_sweep": {"probe"},
    "sim_quantized_recall": {"probe"},
    "sim_quantized_topk": {"probe"},
    "sim_range_search": {"probe"},
    "sim_topk_query": {"probe"},
    "text_bm25_topk": {"scalar"},
    "text_collocations": {"scalar"},
    "text_keywords_per_doc": {"scalar"},
    "text_tfidf_top": {"scalar"},
    "text_unigram_logprob": {"scalar"},
}

#: Queries where Arrow-batched Python IS the design (per-bucket cosine via
#: applyInPandas; the size-guarded all-pairs fallback; multimodal fake-codec
#: decode via mapInPandas). Row-at-a-time BatchEvalPython is banned even
#: here. Single-sourced in plans.checks (bench.py's wider variance band
#: uses the same set — VERDICT r14 #4).
from distributed_system_mapreduce_spark.plans.checks import (
    ARROW_BATCH_QUERIES as _ARROW_BATCH_OK,
)


@pytest.mark.parametrize("name", sorted(_ALL))
def test_registry_plan_sweep(name, spark):
    plan = explain_str(_ALL[name](spark, _PLAN_SF), mode="simple")
    assert "CartesianProduct" not in plan, f"{name}: raw cartesian"
    if name not in _SCALAR_COMBINE_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: undeclared nested-loop join"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    if name not in _ARROW_BATCH_OK:
        for tok in ("ArrowEvalPython", "MapInPandas",
                    "FlatMapGroupsInPandas"):
            assert tok not in plan, f"{name}: undeclared Python node {tok}"


def test_plan_sweep_whitelists_are_not_stale(spark):
    """Every whitelisted name must still exist — a renamed/removed query
    silently shrinking the sweep's deny-list is itself a regression."""
    assert set(_SCALAR_COMBINE_BNLJ) <= set(_ALL), (
        set(_SCALAR_COMBINE_BNLJ) - set(_ALL)
    )
    assert _ARROW_BATCH_OK <= set(_ALL), _ARROW_BATCH_OK - set(_ALL)


@pytest.mark.parametrize("name", sorted(_SCALAR_COMBINE_BNLJ))
def test_bnlj_build_sides_structurally_bounded(name, spark):
    """VERDICT r13 #7: whitelist membership is a declaration, not a free
    pass — every BroadcastNestedLoopJoin the query's physical plan grows
    must exhibit at least one of the entry's DECLARED structural bound
    classes on its build side (scalar combine, limit, local frame,
    constant key-probe filter, declared bounded-arity group key). A stale
    or over-broad entry whose broadcast branch lost its bound fails
    here."""
    from distributed_system_mapreduce_spark.plans.checks import (
        bnlj_build_classes,
    )

    declared = _SCALAR_COMBINE_BNLJ[name]
    sides = bnlj_build_classes(_ALL[name](spark, _PLAN_SF))
    for i, observed in enumerate(sides):
        assert observed & declared, (
            f"{name} BNLJ #{i}: build side exhibits {sorted(observed)} "
            f"but the whitelist declares {sorted(declared)} — the "
            "broadcast branch carries no declared structural bound"
        )


def test_bnlj_grouped_class_requires_sole_key():
    """ADVICE r14: an aggregate keyed by (label, doc_id) must NOT classify
    as grouped:label — its output scales with the corpus, not with label
    arity. grouped:<col> is emitted only when <col> is the SOLE grouping
    key."""
    from distributed_system_mapreduce_spark.plans.checks import (
        _classify_build_side,
    )

    multi = _classify_build_side(
        "HashAggregate(keys=[label#12, doc_id#34L], functions=[count(1)])"
    )
    assert not any(c.startswith("grouped:") for c in multi), multi
    sole = _classify_build_side(
        "HashAggregate(keys=[label#12], functions=[count(1)])"
    )
    assert "grouped:label" in sole, sole


def test_bnlj_checker_flags_unbounded_counterexample(spark):
    """The checker must report an EMPTY class set (i.e. the sweep would
    fail) for a synthetic unbounded broadcast: a non-equi join whose
    build side is a raw corpus-sized scan — including one 'filtered' by a
    non-key literal predicate, which bounds nothing at scale."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.plans.checks import (
        bnlj_build_classes,
    )
    from distributed_system_mapreduce_spark.sources.io import load

    cust = load(spark, _PLAN_SF, "customer")
    orders = load(spark, _PLAN_SF, "orders")
    bad = orders.join(
        cust.filter(F.col("c_acctbal") < 1000),
        orders["o_totalprice"] > cust["c_acctbal"],
    )
    sides = bnlj_build_classes(bad)
    assert sides, "counter-example did not plan as a BNLJ"
    assert all(not s for s in sides), sides


# ---------------------------------------------------------------------------
# Iterative-query internals (VERDICT r6 #7): driver-loop queries return a
# LocalTableScan, so the sweep above never sees the stages that actually run
# at scale — the per-round peel/assign/recompute frames and the candidate
# pools. Each family exposes its loop body as a helper; screen those plans
# with the same assertions (explicit per-frame allowances for bounded
# broadcast grids and declared Arrow batches).
# ---------------------------------------------------------------------------

def _internal_frames(spark):
    from distributed_system_mapreduce_spark.functions.retrieval import (
        mmr_pools,
    )
    from distributed_system_mapreduce_spark.functions.vectors import (
        gram_partials,
        ivf_assign,
        lloyd_recompute,
        pq_assign,
        pq_recompute,
        pq_subvectors,
    )
    from distributed_system_mapreduce_spark.operators.graph import (
        _symmetric,
        copurchase_pairs,
        kcore_round,
    )
    from distributed_system_mapreduce_spark.sources.io import load
    from pyspark.sql import functions as F

    edges = _symmetric(copurchase_pairs(spark, _PLAN_SF))
    emb = load(spark, _PLAN_SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
    )
    assign = ivf_assign(emb, cents, round_scores=False)
    cand, pw = mmr_pools(spark, _PLAN_SF)
    e_named = emb.select("vec_id", F.col("embedding").alias("e"))
    pq_sub = pq_subvectors(e_named)
    pq_cents = pq_subvectors(e_named.filter(F.col("vec_id") < 4)).select(
        "m", F.col("vec_id").alias("cent_id"), F.col("sv").alias("ce")
    )
    pq_asg = pq_assign(pq_sub, pq_cents)
    return {
        # label: (frame, allow_bnlj, allow_arrow)
        "kcore_round": (kcore_round(edges, 2, 4), False, False),
        "kmeans_assign": (assign, True, False),  # k-row broadcast grid
        "kmeans_recompute": (lloyd_recompute(assign), True, False),
        "mmr_cand_pool": (cand, True, False),  # 1-row query broadcast
        "mmr_pair_pool": (pw, True, False),  # pool x pool, MMR_POOL-bounded
        "pca_gram_partials": (gram_partials(emb), False, True),
        "pq_assign": (pq_asg, False, False),  # equi-join on subspace id
        "pq_recompute": (pq_recompute(pq_asg), False, False),
    }


@pytest.mark.parametrize(
    "label",
    [
        "kcore_round",
        "kmeans_assign",
        "kmeans_recompute",
        "mmr_cand_pool",
        "mmr_pair_pool",
        "pca_gram_partials",
        "pq_assign",
        "pq_recompute",
    ],
)
def test_iterative_internal_plan_sweep(label, spark):
    frame, allow_bnlj, allow_arrow = _internal_frames(spark)[label]
    plan = explain_str(frame, mode="simple")
    assert "CartesianProduct" not in plan, f"{label}: raw cartesian"
    if not allow_bnlj:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{label}: undeclared nested-loop join"
        )
    assert "BatchEvalPython" not in plan, (
        f"{label}: row-at-a-time Python UDF in the plan"
    )
    if not allow_arrow:
        for tok in ("ArrowEvalPython", "MapInPandas",
                    "FlatMapGroupsInPandas"):
            assert tok not in plan, f"{label}: undeclared Python node {tok}"


# ---------------------------------------------------------------------------
# Unpartitioned-window sweep (VERDICT r8 #3): BNLJ and Python nodes were
# already swept, but the global-ntile class — a Window with NO partitionBy
# sorting corpus-sized input in one task — survived four rounds unseen.
# This sweep parses the optimized logical plan tree and flags every
# unpartitioned Window whose input is not structurally bounded (salted
# top-k survivors, chunked-scan metadata rollups, post-limit frames —
# see plans.checks._spine_is_bounded), unless the query is whitelisted
# below with a bounded-rollup justification.
# ---------------------------------------------------------------------------

from distributed_system_mapreduce_spark.plans import global_window_violations

#: Unpartitioned windows over rollups whose cardinality is bounded by a
#: CONSTANT of the data model (not by corpus size), which the structural
#: walk cannot prove. Each entry names the bounding constant:
_BOUNDED_GLOBAL_WINDOW = {
    # scores rounded to fixed resolution before the rollup -> at most
    # 10^resolution distinct score rows under the rank window
    "eval_auc",
    "eval_pr_auc",
    # rank windows over the score-resolution / label-arity marginals
    "eval_spearman_corr",
    # running/total windows over the score-resolution rollup and the
    # <=LIFT_DECILES-row decile rollup
    "eval_lift_deciles",
    # backlog prefix sum over the calendar month grid (span months)
    "orders_backlog_timeline",
    # lag/prefix windows over the calendar-bounded hourly spine (rows =
    # span hours regardless of corpus size; a century < 1M rows)
    "events_acf",
    "events_changepoint",
    "events_cross_correlation",
    # per-channel rollup: marketing channels are an enum (~5 values)
    "events_attribution",
    # per-lifecycle-status rollup: 3 segments
    "events_inactivity_churn",
    # per-calendar-month rollup: months in the data's date span
    "orders_mom_growth",
    # order-count histogram: at most max(orders per customer) rows
    "orders_repeat_purchase_curve",
    # lines-per-order histogram: at most max(lines per order) rows
    "orders_order_size_hist",
    # per-curriculum-band rollup: fixed band count
    "pipeline_curriculum_order",
}

#: Survey window WITNESSES that partition on a constant-cardinality key
#: (5 priority classes) — corpus/5 rows per task at scale. They witness
#: the §2 window semantics, documented here so the trade is explicit;
#: the partitioned-window sweep below cannot (and does not) prove
#: cardinality, so keep this list in sync with COVERAGE.md.
_CONSTANT_GROUP_WITNESSES = {"window_rank", "window_ntile", "window_percent_rank"}


@pytest.mark.parametrize("name", sorted(_ALL))
def test_registry_no_unbounded_global_window(name, spark):
    df = _ALL[name](spark, _PLAN_SF)
    if df.isStreaming:
        pytest.skip("streaming plans are screened in tests/test_streaming.py")
    bad = global_window_violations(df)
    if name in _BOUNDED_GLOBAL_WINDOW:
        assert bad, (
            f"{name} is whitelisted for a bounded global window but has "
            "none — remove the stale whitelist entry"
        )
        return
    assert not bad, (
        f"{name}: unpartitioned Window over unbounded input (single-task "
        f"sort of the full frame at scale): {bad}"
    )


def test_global_window_whitelists_are_not_stale(spark):
    assert _BOUNDED_GLOBAL_WINDOW <= set(_ALL)
    assert _CONSTANT_GROUP_WITNESSES <= set(_ALL)


def test_pagerank_rounds_compile_to_broadcast_joins(spark):
    """r11 (VERDICT r10 #5): below the vertex bound the PageRank loop hints
    the rank broadcast explicitly, so every round is a BroadcastHashJoin in
    the STATIC plan — no round waits for AQE to materialize a shuffle
    before converting, and no SortMergeJoin appears anywhere in the loop."""
    from distributed_system_mapreduce_spark.operators.graph import PR_ITERS

    plan = explain_str(QUERIES["graph_pagerank"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= PR_ITERS, plan
    assert "SortMergeJoin" not in plan, plan


def test_pq_codes_frame_is_memoized_per_session(spark):
    """r11: the tracked code table must be ONE frame per (session, corpus)
    — the codebook LocalRelation under it never canonicalizes equal across
    createDataFrame calls, so without the frame memo every caller persisted
    and re-materialized its own copy of identical codes."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.functions.vectors import pq_codes
    from distributed_system_mapreduce_spark.sources.io import load

    def emb():
        return load(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )

    a = pq_codes(emb())
    b = pq_codes(emb())
    assert a is b  # same tracked DataFrame object, one cache entry


def test_bfs_levels_keep_explicit_repartition(spark):
    """r13 (VERDICT r12 #2): the per-level repartition(level_parts, node)
    ahead of each frontier distinct was AUDITED, not assumed — dropping it
    (plain distinct: default-width exchange per level) measured SLOWER at
    sf0.1 (tools/probe_bfs_r13.py; 64-wide reducers under the
    parallelism-first AQE policy vs the edge-proportional width), and an
    AQE REBALANCE hint was within host noise. The explicit sizing is
    load-bearing, so pin that it stays in the plan: one REPARTITION_BY_NUM
    (or REPARTITION_BY_COL at wider fixtures) per unrolled level."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.operators.graph import (
        BFS_HOPS,
        bfs_level,
        copurchase_pairs,
        _symmetric,
    )

    del BFS_HOPS  # depth no longer appears in the final plan's assertion

    # r16 optimization round: the penultimate frontier is localCheckpointed
    # (diamond dedup — see _BFS_CKPT_GEN), so the REGISTERED query's final
    # plan shows the repartition only for the levels past the checkpoint;
    # the per-level shape that runs at scale is screened on the exposed
    # bfs_level builder (the kcore_round pattern).
    pairs = copurchase_pairs(spark, SF_DIR)
    frontier = _symmetric(pairs).agg(F.min("src").alias("node"))
    lvl = explain_str(
        bfs_level(_symmetric(pairs), frontier, 4), mode="simple"
    )
    assert (
        lvl.count("REPARTITION_BY_NUM") + lvl.count("REPARTITION_BY_COL") >= 1
    ), lvl

    plan = explain_str(QUERIES["graph_bfs_hops"](spark, SF_DIR), mode="simple")
    n_repart = plan.count("REPARTITION_BY_NUM") + plan.count(
        "REPARTITION_BY_COL"
    )
    # levels AFTER the checkpointed hop (BFS_HOPS - 1) remain visible
    assert n_repart >= 1, plan
