"""Plan-shape pins for the round-7 operators: the prefix-filtered
similarity join must never regress to the naive full-inverted-index pair
join, and the RFM histogram twin's windows must stay coarse-range
bounded (never a global single-task window).
"""

from __future__ import annotations

import re

import pytest

from data_ingestion_lambda_spark.plans import all_specs

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_ngram_jaccard_is_prefix_filtered(spark):
    """dedup_ngram_jaccard's r7 rewrite: the candidate self-join meets on
    the PREFIX explode (the `slice` of the rarity-sorted shingle array),
    verification is the per-pair array_intersect (no per-shingle pair
    rows ever aggregate), and no nested-loop/cartesian join appears.
    Regressing any of these re-opens the 112M-candidate shape the
    prefix filter removed (measured 26x candidate reduction at 100x)."""
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "slice(" in plan, f"prefix slice missing from plan:\n{plan}"
    assert "array_intersect" in plan, f"verification must intersect sets:\n{plan}"
    # the old shape's signature: counting shared-shingle rows per pair
    assert not re.search(r"partial_count.*doc_a.*doc_b", plan), (
        f"per-pair shingle-row aggregation has returned:\n{plan}"
    )


def test_rfm_hist_windows_are_coarse_bounded(spark):
    """agg_rfm_segmentation_hist: every window must partition by at least
    (metric) and the bucket-level cumulative sum by (metric, coarse) —
    an unpartitioned window here is the |customers|-sized single-task
    buffer this twin exists to retire. The quartile broadcast must reach
    the scoring join as a BroadcastNestedLoopJoin-free cross of ONE row
    (BroadcastExchange present)."""
    plan = _plan(spark, "agg_rfm_segmentation_hist")
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert specs, f"expected windows in plan:\n{plan}"
    for spec in specs:
        assert "metric" in spec, f"window not partitioned by metric:\n{plan}"
    assert re.search(r"Window \[[^\]]*lcum[^\]]*\], \[metric[^\]]*coarse", plan), (
        f"local cumsum must partition by (metric, coarse):\n{plan}"
    )
    assert "BroadcastExchange" in plan, f"quartiles must broadcast:\n{plan}"
    # exact-percentile aggregate must NOT appear anywhere
    assert "percentile(" not in plan, f"exact percentile buffer returned:\n{plan}"


@pytest.mark.parametrize(
    "name", ["dedup_edit_distance", "dedup_edit_distance_q4"]
)
def test_edit_distance_is_prefix_filtered(spark, name):
    """Both edit-distance lanes (q=3 exact-packed, q=4 hashed — the
    coded scale knob): candidates must meet on the q*d+1-item rarity
    prefix (slice of the sorted (df, g, k) item array), verification must
    be the banded built-in levenshtein (never a Python UDF), the ONLY
    nested-loop join is the broadcast short-doc guard lane (empty on this
    corpus, degenerate-slice-bounded by construction), and the prefix
    relation is persisted so the tokenize->gram->df subtree is built once
    and read by BOTH sides of the candidate self-join."""
    df = all_specs()[name].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "CartesianProduct" not in plan, f"cartesian join appeared:\n{plan}"
    assert plan.count("BroadcastNestedLoopJoin") <= 1, (
        f"only the short-doc guard may nested-loop:\n{plan}"
    )
    assert "levenshtein" in plan, f"banded levenshtein verify missing:\n{plan}"
    # the slice lives inside the persisted prefix relation, so pin it on
    # the logical plan (the physical string hides cached subtrees)
    assert "slice(" in logical, f"prefix slice missing:\n{logical}"
    assert plan.count("InMemoryTableScan") >= 2, (
        f"prefix relation must be persisted and reused by both join sides:\n{plan}"
    )


def test_unigram_surprisal_stays_aggregated_and_jvm_side(spark):
    """text_unigram_surprisal: raw token occurrences must collapse to the
    doc-local (doc_id, tok, tf) aggregate BEFORE any join (map-side
    partials present), the rarity table must be integer bin()-length
    arithmetic (no transcendental, no Python UDF), and no nested-loop or
    cartesian join may appear — the corpus total reaches the plan as a
    literal, not a cross join."""
    df = all_specs()["text_unigram_surprisal"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan, f"tf agg must map-side combine:\n{plan}"
    # the rarity projection fuses into the vocab aggregate's result
    # expressions in the physical string — pin it on the analyzed plan
    assert "bin(" in analyzed, f"integer bit-length rarity missing:\n{analyzed}"
    assert "log(" not in analyzed.lower(), f"transcendental crept in:\n{analyzed}"
    assert plan.count("InMemoryTableScan") >= 2, (
        f"tf must be persisted and read by both the vocab rollup and the "
        f"scoring join (one tokenize pass):\n{plan}"
    )


def test_collocations_topk_never_global_sorts(spark):
    """text_collocations_lift: the top-25 must plan TakeOrderedAndProject
    (per-partition top-k + driver merge of 25 rows), never a global Sort
    of the whole bigram relation; joins are hash joins (vocab side
    broadcastable), no cartesian/nested-loop; counts map-side combine."""
    plan = _plan(spark, "text_collocations_lift")
    assert "TakeOrderedAndProject" in plan, f"top-k must TakeOrdered:\n{plan}"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan, f"bigram agg must map-side combine:\n{plan}"


def test_bm25_query_join_broadcasts_and_no_cartesian(spark):
    """search_bm25_topk: the query term bag joins the postings as a
    BroadcastHashJoin (the bag is 8 docs' vocabulary; shuffling the
    postings against it would move the whole inverted index), and the
    score aggregate partially combines map-side (exact long
    contributions — the reason the lane can avoid doubles entirely).
    The ONLY nested-loop joins allowed are the corpus-stats crosses
    (r11: stats moved in-plan, the text_dsir_weights pattern): one
    assembling the 1-row (nn)×(tt) stats frame, one attaching it
    broadcast to the candidates — never an unhinted CartesianProduct,
    and never more than those two 1-row builds."""
    plan = _plan(spark, "search_bm25_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, (
        f"only the 1-row stats crosses may nested-loop:\n{plan}"
    )
    assert "BroadcastHashJoin" in plan, f"query-bag join must broadcast:\n{plan}"
    assert re.search(r"partial_sum", plan), f"score sum must partial-agg:\n{plan}"


def test_hybrid_rrf_fuses_rank_rows_only(spark):
    """search_hybrid_rrf: the fusion stage itself adds NO join at all —
    it is a union of the two top-k lists plus a grouped sum, so the
    only non-equi/nested-loop joins in the whole plan are the ones the
    two retrievers already contain: the dense brute-force side's
    deliberate broadcast-bounded 8-query scorer, plus the lexical
    side's single broadcast 1-row corpus-stats cross (r11 — see the
    bm25 pin above). The FUSION stage itself adds zero."""
    plan = _plan(spark, "search_hybrid_rrf")
    dense = _plan(spark, "ann_cosine_topk")
    bm25 = _plan(spark, "search_bm25_topk")

    def nl_joins(p):
        return p.count("CartesianProduct") + p.count("BroadcastNestedLoopJoin")

    assert nl_joins(plan) == nl_joins(dense) + nl_joins(bm25), (
        f"fusion added nested-loop joins beyond the retrievers' own:\n{plan}"
    )
    assert "CartesianProduct" not in plan
    assert "Union" in plan, f"fusion unions the two ranked lists:\n{plan}"


def _count_exchanges(plan: str) -> int:
    # ShuffleExchange occurrences (reused exchanges still count once each
    # in the string; AQE may rewrite, so pins use upper bounds).
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_trend_slope_is_two_rollups_no_window(spark):
    """events_trend_slope: (type, day) rollup -> 5-moment rollup. Two
    hash exchanges max, no window sort, no exact percentile, and both
    aggregates must have map-side partials (partial_count/partial_sum)."""
    plan = _plan(spark, "events_trend_slope")
    assert "Window" not in plan, f"no window belongs in this plan:\n{plan}"
    assert _count_exchanges(plan) <= 2, f"more than two exchanges:\n{plan}"
    assert "partial_sum" in plan or "partial_count" in plan, (
        f"map-side partial aggregation missing:\n{plan}"
    )


def test_ewma_single_window_sort_over_rollup(spark):
    """events_ewma_daily: all 6 lag taps must share ONE window operator
    over the (type, day) rollup — 7 separate window sorts would re-sort
    the day rows per tap; and the window must be partitioned (never a
    global order-only frame)."""
    plan = _plan(spark, "events_ewma_daily")
    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert len(windows) == 1, f"expected exactly one Window op:\n{plan}"
    assert "event_type" in windows[0], f"window must partition by type:\n{plan}"


def test_correlation_exact_one_aggregation_no_doubles_in_moments(spark):
    """profile_correlation_exact: ONE grouped aggregation (plus its
    partial) computes all 10 moments; no corr()/covar() built-in (their
    double buffers are partition-order-dependent) and no second exchange
    beyond the group-key shuffle."""
    plan = _plan(spark, "profile_correlation_exact")
    assert "corr(" not in plan and "covar" not in plan, (
        f"nondeterministic double-accumulator aggregate in plan:\n{plan}"
    )
    assert _count_exchanges(plan) <= 1, f"expected a single exchange:\n{plan}"
    assert "partial_sum" in plan, f"map-side partials missing:\n{plan}"


def test_benford_reference_broadcasts(spark):
    """profile_benford_first_digit: the 9-row Benford table and the 1-row
    total must broadcast; the only shuffle is the 9-key digit rollup; no
    log10 computed in-plan (the constants are literals)."""
    plan = _plan(spark, "profile_benford_first_digit")
    assert "BroadcastExchange" in plan, f"reference join must broadcast:\n{plan}"
    # the 9-key digit rollup feeds both the total agg and the output join,
    # so the un-reused pre-AQE plan carries the rollup exchange twice
    assert _count_exchanges(plan) <= 2, f"expected only digit-rollup exchanges:\n{plan}"
    assert "LOG10(" not in plan.upper(), (
        f"log10 must not be computed in-plan:\n{plan}"
    )


def test_blast_radius_equijoins_only_bounded_state(spark):
    """graph_blast_radius (r14 form): the BFS rounds run as eagerly
    localCheckpoint'ed equi-join jobs at build time, so the RETURNED
    plan is a union of the materialized (doc_id, hops) levels feeding
    ONE MIN(hops) rollup — still no cartesian/nested-loop, and the
    iteration state stays (id, hop) longs (document text never appears
    in the returned plan)."""
    plan = _plan(spark, "graph_blast_radius")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan, f"checkpointed BFS levels missing:\n{plan}"
    assert "Union" in plan and "min(hops" in plan, (
        f"level union + MIN(hops) rollup missing:\n{plan}"
    )
    assert "text" not in plan, f"text leaked into the BFS state:\n{plan}"


def test_markov_one_user_window_matrix_broadcast(spark):
    """events_markov_transitions: the user-keyed adjacency window runs
    ONCE — both the outdegree aggregate and the output join must read
    the persisted transition matrix (InMemoryTableScan), not re-derive
    it; the normalization joins |types|^2 matrix rows via broadcast."""
    plan = _plan(spark, "events_markov_transitions")
    windows = {m for m in re.findall(r"windowspecdefinition\(([^,]*)", plan)}
    assert len(windows) == 1 and any("user_id" in w for w in windows), (
        f"expected one distinct user-keyed window spec:\n{plan}"
    )
    assert plan.count("InMemoryTableScan") >= 2, (
        f"both consumers must read the cached matrix:\n{plan}"
    )
    assert "BroadcastHashJoin" in plan, f"outdegree join must broadcast:\n{plan}"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_changepoint_windows_day_rows_only(spark):
    """events_changepoint_cusum: every window partitions by event_type
    and runs AFTER the (type, day) rollup — none may see raw events
    (the rollup's partial_count pins map-side collapse before the
    exchange)."""
    plan = _plan(spark, "events_changepoint_cusum")
    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert windows, f"expected windows:\n{plan}"
    for spec in windows:
        assert "event_type" in spec, f"window not type-partitioned:\n{plan}"
    assert "partial_count" in plan, f"rollup must combine map-side:\n{plan}"


def test_contamination_radius_equijoins_only(spark):
    """graph_contamination_radius (r14 form): the decon seed screen and
    the BFS rounds execute as build-time checkpoint jobs (the seed
    subtree used to run twice un-materialized); the returned plan is
    the level union + MIN(hops) rollup over (doc_id, hops) longs — no
    cartesian/nested-loop, no text. The decon gram semi-join shape
    itself stays pinned by test_plan_shapes_r5.py::
    test_decontamination_joins_are_all_equi."""
    plan = _plan(spark, "graph_contamination_radius")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan, f"checkpointed BFS levels missing:\n{plan}"
    assert "Union" in plan and "min(hops" in plan, (
        f"level union + MIN(hops) rollup missing:\n{plan}"
    )
    assert "text" not in plan, f"text leaked into the BFS state:\n{plan}"


def test_fd_screen_no_window_partial_aggs(spark):
    """profile_functional_dependencies: three independent two-level
    aggregation branches (per-key distinct, then the violation
    collapse) — no window, map-side partials present, and at most two
    exchanges per screened pair."""
    plan = _plan(spark, "profile_functional_dependencies")
    assert "Window" not in plan, f"no window belongs here:\n{plan}"
    assert "partial_count" in plan or "partial_sum" in plan
    assert _count_exchanges(plan) <= 6, f"exchange budget exceeded:\n{plan}"


def test_distribution_drift_histogram_rows_only(spark):
    """events_distribution_drift: the (type, day, bucket) rollup is
    persisted and every downstream join (self-join + two totals) reads
    the cache — raw events are scanned once; no window, no cartesian."""
    plan = _plan(spark, "events_distribution_drift")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("InMemoryTableScan") >= 3, (
        f"histogram cache must feed all consumers:\n{plan}"
    )


def test_cumulative_reach_window_over_calendar_rows(spark):
    """events_cumulative_reach: the only windows run AFTER the day-level
    rollups (the global prefix sum sees |days| rows, volume-free) — both
    aggregates must collapse map-side first."""
    plan = _plan(spark, "events_cumulative_reach")
    assert "partial_count" in plan or "partial_sum" in plan
    # exactly one window (the reach prefix sum), ordered by day, and the
    # plan text BELOW it (its input subtree) must start with aggregated/
    # joined rollup output — a window sitting directly on the scan would
    # put the parquet relation before any HashAggregate in that subtree
    w_at = plan.index("Window")
    subtree = plan[w_at:]
    assert plan.count("Window [") == 1, f"expected one window:\n{plan}"
    agg_at = subtree.find("HashAggregate")
    scan_at = subtree.lower().find("parquet")
    assert agg_at != -1 and (scan_at == -1 or agg_at < scan_at), (
        f"window must consume rollup rows, not the raw scan:\n{plan}"
    )


def test_shipping_latency_quantiles_joins_then_buckets(spark):
    """shipping_latency_quantiles: the histogram-percentile recipe after
    a fact-fact join — the orderkey join must be a real join (sort-merge
    or shuffled-hash at scale; broadcast is fine at sf0.001), NO exact
    percentile aggregate anywhere, and the cumulative window partitions
    by the group over day-bucket rows."""
    plan = _plan(spark, "shipping_latency_quantiles")
    assert "percentile" not in plan, f"exact percentile buffer crept in:\n{plan}"
    assert "Join" in plan, f"the fact join vanished:\n{plan}"
    for spec in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "grp" in spec, f"window not group-partitioned:\n{plan}"


def test_containment_no_cartesian_rowlocal_intersect(spark):
    """dedup_containment: candidate volume is the LSH band join — no
    cartesian/nested-loop anywhere; verification must be the row-local
    array_intersect (never a per-shingle pair-row aggregation)."""
    plan = _plan(spark, "dedup_containment")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "array_intersect" in plan, f"row-local intersect missing:\n{plan}"
    assert not re.search(r"partial_count.*doc_a.*doc_b", plan), (
        f"per-pair shingle-row aggregation:\n{plan}"
    )


def test_canonical_by_quality_rank_window_cluster_scoped(spark):
    """dedup_canonical_by_quality: the rank/count windows partition by
    cluster_id (graph-sized rows), never unpartitioned; no cartesian."""
    plan = _plan(spark, "dedup_canonical_by_quality")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert specs and all("cluster_id" in x for x in specs), (
        f"windows must be cluster-scoped:\n{plan}"
    )
