"""Maintained incremental sessionization: daily partial-session applies
+ the read-side seam merge must row-equal the one-shot events_sessionize
lane — including sessions that SPAN day boundaries and per-user
session_seq numbering — for day splits, replays, and backfills; the
session-stats read must equal the registered feature lane; mixed-date
batches refuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.session_store import (
    apply_session_batch,
    read_sessions,
    read_user_session_stats,
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
        apply_session_batch(
            spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
        )
    return days


def _srows(df):
    return sorted(
        (r.user_id, r.session_seq, r.session_start, r.session_end, r.n_events)
        for r in df.collect()
    )


def test_daily_applies_equal_oneshot_including_boundary_spans(spark, tmp_path):
    idx = str(tmp_path / "sess_idx")
    events = load_table(spark, SF, "events")
    _apply_daily(spark, idx, events)
    got = _srows(read_sessions(spark, idx))
    want = _srows(all_specs()["events_sessionize"].builder(spark, SF))
    assert got == want and len(got) > 0


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_planted_sessions_span_and_chain_across_midnights(spark, tmp_path):
    """The seam merge's non-vacuous case (the synthetic corpus has no
    midnight-spanning session, so this plants them): one session
    straddling a midnight, one CHAINING across two midnights via
    sub-30-min hops, and a control pair separated by >30 min at the
    seam that must NOT merge."""
    import datetime as dt

    def ev(i, day, h, m, uid):
        return (i, dt.datetime(2024, 3, day, h, m), uid, "click", 1.0, "{}")

    rows = [
        # user 1: 23:50 + 00:05 -> ONE session across midnight
        ev(1, 1, 23, 50, 1),
        ev(2, 2, 0, 5, 1),
        # user 2: two separate midnight-spanning sessions on consecutive
        # seams (23:55 d1 -> 00:10 d2, then 23:58 d2 -> 00:20 d3; the
        # 23h48m daytime gap keeps them apart)
        ev(3, 1, 23, 55, 2),
        ev(4, 2, 0, 10, 2),
        ev(5, 2, 23, 58, 2),
        ev(6, 3, 0, 20, 2),
        # user 3 control: 23:20 then 00:05 next day — 45 min gap, two
        # sessions even though both touch the seam window
        ev(7, 1, 23, 20, 3),
        ev(8, 2, 0, 5, 3),
    ]
    events = spark.createDataFrame(rows, EVENTS_SCHEMA)
    idx = str(tmp_path / "sess_idx")
    for d in ("2024-03-01", "2024-03-02", "2024-03-03"):
        apply_session_batch(
            spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
        )
    got = {
        (r.user_id, r.session_seq): (r.session_start, r.session_end, r.n_events)
        for r in read_sessions(spark, idx).collect()
    }
    dtm = lambda day, h, m: __import__("datetime").datetime(2024, 3, day, h, m)
    assert got == {
        (1, 1): (dtm(1, 23, 50), dtm(2, 0, 5), 2),
        (2, 1): (dtm(1, 23, 55), dtm(2, 0, 10), 2),
        (2, 2): (dtm(2, 23, 58), dtm(3, 0, 20), 2),
        (3, 1): (dtm(1, 23, 20), dtm(1, 23, 20), 1),
        (3, 2): (dtm(2, 0, 5), dtm(2, 0, 5), 1),
    }
    # and the one-shot recipe over the same planted events agrees
    from data_ingestion_lambda_spark.operators.session_store import (
        sessionize_batch,
        merge_partial_sessions,
    )

    one_shot = merge_partial_sessions(sessionize_batch(events))
    assert {
        (r.user_id, r.session_seq): (r.start_us, r.end_us, r.n_events)
        for r in one_shot.collect()
    } == {
        k: (int(v[0].timestamp() * 1e6), int(v[1].timestamp() * 1e6), v[2])
        for k, v in got.items()
    }


def test_replay_and_backfill_are_idempotent(spark, tmp_path):
    idx = str(tmp_path / "sess_idx")
    events = load_table(spark, SF, "events")
    days = _apply_daily(spark, idx, events)
    before = _srows(read_sessions(spark, idx))
    mid = days[len(days) // 2]
    apply_session_batch(
        spark, idx, events.filter(F.to_date("ts") == F.lit(mid)), mid
    )
    assert _srows(read_sessions(spark, idx)) == before


def test_out_of_order_backfill_converges(spark, tmp_path):
    """Days applied in scrambled order (the late-file case) must merge to
    the same session table — the seam merge orders by time, not arrival."""
    idx = str(tmp_path / "sess_idx")
    events = load_table(spark, SF, "events")
    days = _days(events)
    scrambled = days[1::2] + days[0::2][::-1]
    _apply_daily(spark, idx, events, scrambled)
    got = _srows(read_sessions(spark, idx))
    want = _srows(all_specs()["events_sessionize"].builder(spark, SF))
    assert got == want


def test_mixed_date_batch_refuses(spark, tmp_path):
    idx = str(tmp_path / "sess_idx")
    events = load_table(spark, SF, "events")
    days = _days(events)[:2]
    mixed = events.filter(
        F.to_date("ts").isin([F.lit(d) for d in days])
    )
    with pytest.raises(ValueError, match="date-pure"):
        apply_session_batch(spark, idx, mixed, days[0])


def test_session_stats_read_equals_registered_lane(spark, tmp_path):
    idx = str(tmp_path / "sess_idx")
    events = load_table(spark, SF, "events")
    _apply_daily(spark, idx, events)
    got = sorted(tuple(r) for r in read_user_session_stats(spark, idx).collect())
    want = sorted(
        tuple(r)
        for r in all_specs()["feature_user_session_stats"]
        .builder(spark, SF)
        .collect()
    )
    assert got == want and len(got) > 0


def test_cli_roundtrip(spark, tmp_path):
    """session-store CLI: two daily applies, then read both surfaces and
    compare against the library reads."""
    from data_ingestion_lambda_spark.cli import main

    events = load_table(spark, SF, "events")
    days = _days(events)[:2]
    idx = str(tmp_path / "sess_idx")
    for d in days:
        bdir = str(tmp_path / f"batch_{d}")
        events.filter(F.to_date("ts") == F.lit(d)).write.parquet(bdir)
        assert (
            main(["session-store", "--index", idx, "--batch", bdir, "--date", d])
            == 0
        )
    s_dir = str(tmp_path / "sessions")
    st_dir = str(tmp_path / "stats")
    assert (
        main(
            ["session-store", "--index", idx, "--sessions-out", s_dir,
             "--stats-out", st_dir]
        )
        == 0
    )
    assert _srows(spark.read.parquet(s_dir)) == _srows(read_sessions(spark, idx))
    assert sorted(
        tuple(r) for r in spark.read.parquet(st_dir).collect()
    ) == sorted(tuple(r) for r in read_user_session_stats(spark, idx).collect())
