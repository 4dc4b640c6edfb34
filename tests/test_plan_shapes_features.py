"""Plan-shape pins for the feature-preparation lanes (plans/features.py)
and the ACF lane: group statistics must broadcast back over the scan
(never a fact-side shuffle join), distinct-count aggregates must stay on
the hash path, and the histogram cumsum must stay coarse-range bounded.
"""

from __future__ import annotations

import re

from data_ingestion_lambda_spark.plans import all_specs

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scale_numeric_stats_broadcast_back(spark):
    """feature_scale_numeric: the 3-row group-stats aggregate must reach
    the per-row transform through a broadcast hash join — a sort-merge
    join here would shuffle the full fact table to normalize it."""
    plan = _plan(spark, "feature_scale_numeric")
    assert "BroadcastHashJoin" in plan, f"stats must broadcast:\n{plan}"
    assert "SortMergeJoin" not in plan, f"fact-side shuffle join:\n{plan}"
    assert "percentile(" not in plan


def test_target_encode_dimension_broadcasts(spark):
    """feature_target_encode_brand: the part dimension joins broadcast
    (no fact shuffle), and the global-mean crossjoin is a one-row
    broadcast, not a nested loop over data."""
    plan = _plan(spark, "feature_target_encode_brand")
    assert "BroadcastHashJoin" in plan, f"dim join must broadcast:\n{plan}"
    assert "SortMergeJoin" not in plan, f"fact-side shuffle join:\n{plan}"


def test_hash_bucket_stays_on_hash_aggregate_path(spark):
    """feature_hash_bucket: the bucket rollup with COUNT(DISTINCT) must
    stay HashAggregate end-to-end (the profile_table lesson: one string
    min/max in the same aggregate silently flips the whole Expand to
    SortAggregate)."""
    plan = _plan(spark, "feature_hash_bucket")
    assert "SortAggregate" not in plan, f"hash path lost:\n{plan}"
    # a single distinct column plans as the two-phase (bucket, p_type)
    # regroup, not an Expand — both are hash-path; just pin hash-path
    assert "HashAggregate" in plan


def test_unique_key_candidates_hash_path(spark):
    """profile_unique_key_candidates: 6 COUNT(DISTINCT) in one aggregate
    — the Expand must stay on the hash path, and no window/percentile
    sneaks into a pure counting profile."""
    plan = _plan(spark, "profile_unique_key_candidates")
    assert "SortAggregate" not in plan, f"hash path lost:\n{plan}"
    assert "Expand" in plan
    assert "Window" not in plan


def test_quantile_bucketize_cumsum_is_coarse_bounded(spark):
    """feature_quantile_bucketize: the bucket-level cumulative sum must
    partition by the coarse range (two-phase prefix sum) — the only
    permissible unpartitioned window is over the coarse-range offsets
    table, whose row count is the value domain / $1,000. The decile cut
    array must broadcast to the assignment pass, and no exact
    percentile aggregate may appear."""
    plan = _plan(spark, "feature_quantile_bucketize")
    assert re.search(r"Window \[[^\]]*lcum[^\]]*\], \[coarse", plan), (
        f"local cumsum must partition by coarse:\n{plan}"
    )
    assert "BroadcastExchange" in plan, f"cut array must broadcast:\n{plan}"
    assert "percentile(" not in plan, f"exact percentile buffer:\n{plan}"


def test_autocorrelation_is_rollup_then_tiny_join(spark):
    """events_autocorrelation: event volume must collapse in a map-side
    combinable rollup BEFORE the lag self-join — no window function,
    no cartesian join, no exact percentile; the join operates on
    calendar-cardinality rows only."""
    plan = _plan(spark, "events_autocorrelation")
    assert "Window" not in plan, f"ACF must not window:\n{plan}"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan, f"daily rollup must combine map-side:\n{plan}"


def test_rolling_median_windows_by_type_over_calendar_rows(spark):
    """events_rolling_median_daily: the rolling window must partition by
    event_type (never global) and run AFTER the map-side daily rollup;
    no exact-percentile aggregate appears (the median is an element
    selected from a 7-long sorted buffer)."""
    import re
    plan = _plan(spark, "events_rolling_median_daily")
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert specs, f"expected a window:\n{plan}"
    for spec in specs:
        assert "event_type" in spec, f"window not partitioned by type:\n{plan}"
    assert "percentile(" not in plan
    assert "partial_count" in plan, f"daily rollup must combine map-side:\n{plan}"


def test_inclusion_dependencies_reduce_to_distincts_before_join(spark):
    """profile_inclusion_dependencies: every hypothesis must test
    distinct-vs-distinct through a semi join — pinning that the
    distincts partially aggregate before their exchange (key-cardinality
    rows shuffle, never row volume) and the containment join is a semi
    join, not an inner join that could duplicate rows."""
    plan = _plan(spark, "profile_inclusion_dependencies")
    assert "LeftSemi" in plan, f"containment must semi-join:\n{plan}"
    assert "partial_count" in plan
    assert "SortAggregate" not in plan


def test_point_in_time_is_one_window_one_exchange(spark):
    """feature_point_in_time: all seven cumulative moments and the
    last-event struct max must share ONE Window operator over one
    user-keyed exchange — a second Window (or exchange) would mean the
    frames diverged and the lane re-sorts the fact table per feature."""
    plan = _plan(spark, "feature_point_in_time")
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1, (
        f"moments must share one window:\n{plan}"
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, (
        f"one user exchange expected:\n{plan}"
    )
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_negative_sampling_part_index_broadcasts(spark):
    """feature_negative_sampling: the part-rank index must broadcast into
    the candidate join (dim-sized), and the interactions side must be
    distinct-reduced before the anti-join — no nested-loop anywhere."""
    plan = _plan(spark, "feature_negative_sampling")
    assert "BroadcastHashJoin" in plan, f"part index must broadcast:\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan or plan.count(
        "BroadcastNestedLoopJoin"
    ) == plan.count("IdentityBroadcastMode"), (
        f"non-1-row nested loop:\n{plan}"
    )


def test_user_session_stats_reuses_sessionize_exchange(spark):
    """feature_user_session_stats: the user-keyed rollup must reuse the
    sessionize window's user_id partitioning — one exchange end-to-end
    (hashpartitioning(user_id) co-locates every (user_id, session_seq)
    group, so ENSURE_REQUIREMENTS adds nothing)."""
    plan = _plan(spark, "feature_user_session_stats")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, (
        f"one user exchange expected:\n{plan}"
    )


def test_heavy_hitters_mg_shuffles_summaries_not_items(spark):
    """profile_heavy_hitters_mg: the only full-data operator is the
    mapInPandas partial fold — the exchange above it carries <= K rows
    per partition (summary), and the one global window is downstream of
    that summary aggregate, never over items."""
    plan = _plan(spark, "profile_heavy_hitters_mg")
    assert "MapInPandas" in plan, f"partial fold missing:\n{plan}"
    # every Window in this plan belongs to the summary reduce — each
    # must sit directly on the summed (item, cnt) aggregate output, so
    # its windowspec mentions cnt, never raw items or event columns
    # (plan text is a tree dump; sibling branches follow each other, so
    # "text after MapInPandas" is NOT its subtree — match specs instead)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "cnt#" in m.group(1), f"window not over the summary:\n{plan}"
    assert "SortAggregate" not in plan


def test_funnel_ab_is_one_user_exchange(spark):
    """events_funnel_ab_significance: the per-user stage resolution and
    both rollups must ride ONE user-keyed exchange (plus single-
    partition scalar steps) — no second full-data shuffle."""
    plan = _plan(spark, "events_funnel_ab_significance")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, (
        f"too many hash exchanges:\n{plan}"
    )
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
