"""Maintained touch-state store: OR-fold across ANY batch split —
including OVERLAPPING batches (idempotence) — must reproduce the
one-shot per-user state, and the Shapley read must equal the lane."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.touch_store import (
    apply_touch_batch,
    read_attribution_shapley,
    read_touch_state,
)
from data_ingestion_lambda_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
_N_DAYS = 3


def _events(spark):
    return load_table(spark, SF, "events").select("user_id", "event_type", "event_id")


def _state_rows(df):
    return sorted((r.user_id, r.mask, r.conv) for r in df.collect())


def test_any_split_folds_to_oneshot_state(spark, tmp_path):
    """A NON-day hash split (events of one user scattered across every
    batch) still folds to the one-shot state — OR doesn't care how the
    events were sliced."""
    from data_ingestion_lambda_spark.operators.touch_store import _user_state

    idx = str(tmp_path / "touch_idx")
    ev = _events(spark)
    for d in range(_N_DAYS):
        batch = ev.filter(F.col("event_id") % _N_DAYS == d)
        apply_touch_batch(spark, idx, batch, f"2025-07-0{d + 1}")
    assert _state_rows(read_touch_state(spark, idx)) == _state_rows(_user_state(ev))


def test_overlapping_batches_cannot_overcount(spark, tmp_path):
    """Re-delivering half the events in a second batch (at-least-once
    delivery) leaves the folded state EXACTLY the one-shot state —
    idempotence, the property additive ledgers don't have."""
    from data_ingestion_lambda_spark.operators.touch_store import _user_state

    idx = str(tmp_path / "touch_idx")
    ev = _events(spark)
    apply_touch_batch(spark, idx, ev, "2025-07-01")  # everything
    apply_touch_batch(  # half of it AGAIN under a different date
        spark, idx, ev.filter(F.col("event_id") % 2 == 0), "2025-07-02"
    )
    assert _state_rows(read_touch_state(spark, idx)) == _state_rows(_user_state(ev))


def test_shapley_read_equals_lane(spark, tmp_path):
    from data_ingestion_lambda_spark.plans.registry import REGISTRY

    idx = str(tmp_path / "touch_idx")
    ev = _events(spark)
    for d in range(_N_DAYS):
        batch = ev.filter(F.col("event_id") % _N_DAYS == d)
        apply_touch_batch(spark, idx, batch, f"2025-07-0{d + 1}")
    got = sorted(map(tuple, read_attribution_shapley(spark, idx).collect()))
    want = sorted(
        map(tuple, REGISTRY["events_attribution_shapley"].builder(spark, SF).collect())
    )
    assert got == want


def test_cli_touch_and_markov_stores(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark.cli import main

    ev = load_table(spark, SF, "events")
    day = str(ev.select(F.to_date("ts").alias("d")).orderBy("d").first().d)
    day_events = ev.filter(F.to_date("ts") == day)
    epath = str(tmp_path / "events.parquet")
    day_events.write.parquet(epath)

    rc = main(
        ["touch-store", "--index", str(tmp_path / "tidx"),
         "--batch", epath, "--date", day, "--shapley"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["statusCode"] == 200
    assert {c["channel"] for c in rep["shapley"]} == {"view", "click", "signup"}

    rc = main(
        ["markov-store", "--index", str(tmp_path / "midx"),
         "--batch", epath, "--date", day, "--credit"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["statusCode"] == 200
    assert {c["channel"] for c in rep["credit"]} == {"view", "click", "signup"}
