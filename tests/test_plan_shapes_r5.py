"""Plan-shape pins for the late round-5 operators — the physical
properties that matter at 100x data, asserted on the executed plan so a
refactor that silently adds a shuffle or degrades a broadcast fails CI.
"""

from __future__ import annotations

import re

from data_ingestion_lambda_spark.plans import all_specs

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunking_plans_zero_exchanges(spark):
    """text_chunk_documents claims 'zero shuffles' — pin it: tokenize,
    generate, slice must all stay scan-parallel."""
    plan = _plan(spark, "text_chunk_documents")
    assert "Exchange" not in plan, f"chunking must not shuffle:\n{plan}"


def test_resample_grid_is_broadcast(spark):
    """events_resample_hourly_ff's grid comes from a broadcast 1-row
    bounds aggregate — the grid build must never shuffle the bounds and
    the grid-to-hourly join must be an equi join, not a cartesian."""
    plan = _plan(spark, "events_resample_hourly_ff")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        f"bounds must broadcast:\n{plan}"
    )
    assert "CartesianProduct" not in plan


def test_decontamination_joins_are_all_equi(spark):
    """decontaminate_against_eval must stay equi-join shaped end to end:
    a cartesian anywhere means the gram-hash candidate generation broke."""
    plan = _plan(spark, "decontaminate_against_eval")
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan, f"eval overlap must be a semi join:\n{plan}"


def test_scd2_windows_share_one_user_exchange(spark):
    """scd2_user_segments runs lag + lead over ONE user_id exchange — a
    second hashpartitioning on user_id would mean the windows stopped
    sharing their partitioning."""
    plan = _plan(spark, "scd2_user_segments")
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    user_parts = [p for p in parts if "user_id" in p]
    assert len(set(user_parts)) == 1, f"expected one user_id exchange:\n{plan}"


def test_user_stats_single_exchange_with_partial_agg(spark):
    """events_user_stats is one user-keyed exchange with map-side partial
    aggregation (the 100 TB shape: combine before shuffling)."""
    plan = _plan(spark, "events_user_stats")
    assert plan.count("Exchange") <= 2, f"too many exchanges:\n{plan}"
    assert "partial_count" in plan or "partial" in plan.lower(), (
        f"no map-side combine:\n{plan}"
    )


def test_mixture_rates_total_is_broadcast(spark):
    """corpus_mixture_rates attaches the 1-row total via broadcast — the
    per-source table must never shuffle to meet it."""
    plan = _plan(spark, "corpus_mixture_rates")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
