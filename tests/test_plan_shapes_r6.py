"""Plan-shape pins for the round-6 operators: the funnel rewrite must
never regress back to whole-partition windows, and the histogram
percentile lane's full-data passes must stay map-side-combined.
"""

from __future__ import annotations

import re

from data_ingestion_lambda_spark.plans import all_specs

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_has_no_window_and_one_user_exchange(spark):
    """events_funnel's r6 rewrite: one conditional aggregation, no
    WindowExec (the r5 shape's two whole-partition windows measured
    9.7x wall at 30x data), and exactly one exchange keyed on user_id
    before the singleton final agg."""
    plan = _plan(spark, "events_funnel")
    assert "Window" not in plan, f"funnel must not use windows:\n{plan}"
    user_exchanges = re.findall(r"Exchange hashpartitioning\(user_id", plan)
    assert len(user_exchanges) == 1, f"expected ONE user_id exchange:\n{plan}"


def test_interarrival_hist_buckets_combine_map_side(spark):
    """events_interarrival_hist: the bucket rollup (the only full-data
    aggregation) must run partial_count before its exchange, so at
    100 TB each task emits at most one row per distinct gap-second; and
    the bucket-level cumulative sum must be the two-phase form — a local
    window PARTITIONED by the coarse range (never a global window over
    all second buckets) plus a broadcast offsets join."""
    plan = _plan(spark, "events_interarrival_hist")
    assert "partial_count" in plan, f"bucket rollup must combine map-side:\n{plan}"
    assert re.search(r"Window \[[^\]]*lcum[^\]]*\], \[coarse", plan), (
        f"local cumsum must partition by coarse:\n{plan}"
    )
    assert "BroadcastHashJoin" in plan, f"offsets must broadcast:\n{plan}"


def test_mad_hist_windows_are_type_partitioned(spark):
    """events_anomaly_mad_hist: every cumulative window must partition
    by event_type (bounded by the value domain per type) — a global
    unpartitioned window here would reintroduce the single-task buffer
    this operator exists to remove."""
    plan = _plan(spark, "events_anomaly_mad_hist")
    for spec in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "event_type" in spec, f"window not partitioned by type:\n{plan}"


def test_asof_family_is_one_user_exchange_no_range_join(spark):
    """All four as-of variants (backward / forward / tolerance / nearest)
    must keep the union-window recipe: a single user_id exchange, no
    BroadcastNestedLoopJoin or CartesianProduct (the naive range-join
    formulations Catalyst would pick for the correlated-subquery shape).
    The nearest variant carries two frames with different tie-orderings —
    an in-partition re-sort, never a second shuffle."""
    for name in (
        "events_asof_join",
        "events_asof_join_forward",
        "events_asof_join_tolerance",
        "events_asof_join_nearest",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        exchanges = re.findall(r"Exchange hashpartitioning\(user_id", plan)
        assert len(exchanges) == 1, f"{name}: expected ONE user_id exchange:\n{plan}"
