"""Maintained Markov store: day-decomposed journey summaries must
reconstruct the lane's transition grid exactly (including the
first-purchase mid-day cutoff and cross-day seam edges), replays must
be no-ops, and the attribution read must equal the one-shot lane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.markov_store import (
    apply_markov_batch,
    read_attribution_markov,
    read_transition_counts,
)
from data_ingestion_lambda_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _apply_all_days(spark, idx, events):
    dates = sorted(
        str(r.d) for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    for d in dates:
        batch = events.filter(F.to_date("ts") == d)
        apply_markov_batch(spark, idx, batch, d)
    return dates


def _grid(df):
    return sorted((r.src, r.dst, r["count"]) for r in df.collect())


def test_day_split_reconstructs_lane_grid_and_credit(spark, tmp_path):
    from data_ingestion_lambda_spark.plans.registry import REGISTRY

    idx = str(tmp_path / "markov_idx")
    events = load_table(spark, SF, "events")
    dates = _apply_all_days(spark, idx, events)
    assert len(dates) >= 25, "fixture should span many days"

    got = sorted(map(tuple, read_attribution_markov(spark, idx).collect()))
    want = sorted(
        map(tuple, REGISTRY["events_attribution_markov"].builder(spark, SF).collect())
    )
    assert got == want, "store credit must equal the one-shot lane"


def test_replay_is_noop(spark, tmp_path):
    idx = str(tmp_path / "markov_idx")
    events = load_table(spark, SF, "events")
    dates = _apply_all_days(spark, idx, events)
    before = _grid(read_transition_counts(spark, idx))
    mid = dates[len(dates) // 2]
    apply_markov_batch(spark, idx, events.filter(F.to_date("ts") == mid), mid)
    assert _grid(read_transition_counts(spark, idx)) == before


def test_planted_cutoff_seam_and_touchless(spark, tmp_path):
    """Micro-corpus exercising every reconstruction rule:
    - u1: view day1, click day2, PURCHASE day2 (after the click), then a
      signup day2 AFTER the purchase (must be cut) and a view day3
      (whole day after fp: dropped). Journey: start->view(1),
      view->click (SEAM), click->conv.
    - u2: touches, no purchase: start->view, view->view (seam),
      view->null.
    - u3: purchase only, no touches: start->conv.
    - u4: error events only: start->null."""
    rows = [
        (1, 101, "view", "2024-03-01 10:00:00", None),
        (1, 102, "click", "2024-03-02 09:00:00", None),
        (1, 103, "purchase", "2024-03-02 12:00:00", 5.0),
        (1, 104, "signup", "2024-03-02 15:00:00", None),  # post-purchase: cut
        (1, 105, "view", "2024-03-03 10:00:00", None),  # post-fp day: dropped
        (2, 201, "view", "2024-03-01 08:00:00", None),
        (2, 202, "view", "2024-03-02 08:00:00", None),
        (3, 301, "purchase", "2024-03-01 09:00:00", 7.0),
        (4, 401, "error", "2024-03-02 11:00:00", None),
    ]
    events = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    idx = str(tmp_path / "markov_idx")
    _apply_all_days(spark, idx, events)
    grid = {(r.src, r.dst): r["count"] for r in read_transition_counts(spark, idx).collect()}
    assert grid == {
        (0, 1): 2,  # u1 start->view, u2 start->view
        (1, 2): 1,  # u1 view->click (cross-day seam)
        (2, 4): 1,  # u1 click->conv
        (1, 1): 1,  # u2 view->view (cross-day seam)
        (1, 5): 1,  # u2 view->null
        (0, 4): 1,  # u3 touchless converter
        (0, 5): 1,  # u4 error-only user
    }


def test_refuses_non_day_pure_batch(spark, tmp_path):
    events = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="day-pure"):
        apply_markov_batch(spark, str(tmp_path / "idx"), events, "2024-01-01")
