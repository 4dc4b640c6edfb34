"""Plan-shape pins for the round-8 operators: the IVF hard-negative
miner must keep the probed-cell equi-join shape, DAU/WAU/MAU must stay
an explode-to-equi plan (never a nested-loop range join), the recency
sampler must be a pure scan-stage filter, and the rank-blend's windows
must all partition by source (never global)."""

from __future__ import annotations

import re

from data_ingestion_lambda_spark.plans import all_specs

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_hard_negatives_ivf_is_equi_joined(spark):
    """ann_hard_negatives_ivf: candidates come from the probe's CELL
    equi-join — no cartesian/nested-loop scorer (the brute-force lane's
    shape this miner exists to replace). The ceiling filter must appear
    (cosine < 0.9) so the miner can't silently become plain top-k."""
    plan = _plan(spark, "ann_hard_negatives_ivf")
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoin allowed is the 16-row centroid
    # cross join (assignment/probe); the corpus-side candidate join must
    # be an equi hash join on cell
    assert re.search(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*\[cell", plan) or (
        "cell#" in plan and "HashJoin" in plan
    ), f"cell equi-join missing:\n{plan[:4000]}"
    assert "< 0.9" in plan, f"positive ceiling filter missing:\n{plan[:2000]}"


def test_dau_wau_mau_has_no_range_join(spark):
    """events_dau_wau_mau: the trailing windows are an in-row explode +
    day equi-group — a nested-loop range join here is the plan this
    lane's rewrite removed (35s -> equi at sf0.01)."""
    plan = _plan(spark, "events_dau_wau_mau")
    assert "CartesianProduct" not in plan
    # the day-spine semi join broadcasts (30 rows); anything nested-loop
    # beyond a broadcast LeftSemi means the range join returned
    bnl = re.findall(r"BroadcastNestedLoopJoin BuildRight, (\w+)", plan)
    assert all(k == "LeftSemi" for k in bnl), f"range join returned:\n{plan[:3000]}"
    assert "explode(sequence(" in plan, f"explode-to-equi shape missing:\n{plan[:2000]}"


def test_recency_sampler_is_scan_stage_only(spark):
    """sample_recency_decayed: a pure filter — no exchange, no join, no
    window anywhere in the executed plan."""
    plan = _plan(spark, "sample_recency_decayed")
    for op in ("Exchange", "Join", "Window", "Sort"):
        assert op not in plan, f"{op} appeared in a pure-filter lane:\n{plan}"


def test_rank_blend_windows_partition_by_source(spark):
    """corpus_rank_blend: all four ROW_NUMBER windows partition by
    source — an unpartitioned window is the single-task global sort the
    module's no-global-window discipline forbids."""
    plan = _plan(spark, "corpus_rank_blend")
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert specs, f"expected windows in plan:\n{plan}"
    for spec in specs:
        assert "source" in spec, f"window not partitioned by source:\n{plan}"


def test_cms_counters_aggregate_map_side(spark):
    """profile_heavy_hitters_cms: the grid build must be a partial
    (map-side) aggregate before its exchange — the d*w-bounded shape —
    and the probe side must join the grid, never rescan raw events."""
    plan = _plan(spark, "profile_heavy_hitters_cms")
    assert re.search(r"HashAggregate.*partial_count", plan) or "partial" in plan, (
        f"map-side partial aggregation missing:\n{plan[:3000]}"
    )
    assert "CartesianProduct" not in plan
