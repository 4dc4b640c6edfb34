"""Any-split attribution ledger + streaming front
(operators/attribution_store.py::land_attribution_batch /
read_attribution*_stream, streaming/index_streams.py::
run_attribution_update_available_now): all three streamed reads must
row-equal their one-shot lanes under an ARBITRARY (non-day) trigger
split — the case the day-pure calendar store REFUSES — including
same-day state split across triggers, the ROWS/RANGE tie frames, and
checkpointed no-op replays."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.attribution_store import (
    land_attribution_batch,
    read_attribution_linear_stream,
    read_attribution_position_stream,
    read_attribution_stream,
)
from data_ingestion_lambda_spark.plans import all_specs
from data_ingestion_lambda_spark.streaming.index_streams import (
    run_attribution_update_available_now,
)
from tests.conftest import SF_SMOKE

_COLS = (
    "event_id bigint, user_id bigint, ts timestamp, event_type string, "
    "value double"
)


def _events(spark):
    from data_ingestion_lambda_spark.sources.catalog import load_table

    return load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


def _lt_rows(df):
    return sorted(
        (r.purchase_id, r.user_id, r.purchase_cents, r.click_id, r.gap_us, r.attributed)
        for r in df.collect()
    )


def _lin_rows(df):
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


def test_stream_reads_equal_oneshot_under_arbitrary_split(spark, tmp_path):
    """A scrambled 3-way HASH split (event_id % 3 — days span every
    trigger) drained one file per trigger must serve all three lanes'
    exact rows, and a nothing-new re-run is a checkpointed no-op."""
    events = _events(spark)
    src, ckpt, idx = (str(tmp_path / d) for d in ("src", "ckpt", "idx"))
    for k in range(3):
        events.filter(F.col("event_id") % 3 == k).write.mode("append").parquet(src)
    reports = run_attribution_update_available_now(
        spark, src, idx, ckpt, max_files_per_trigger=1
    )
    assert len(reports) >= 2  # genuinely multiple triggers
    specs = all_specs()
    assert _lt_rows(read_attribution_stream(spark, idx)) == _lt_rows(
        specs["events_attribution_last_touch"].builder(spark, SF_SMOKE)
    )
    assert _lin_rows(read_attribution_linear_stream(spark, idx)) == _lin_rows(
        specs["events_attribution_linear"].builder(spark, SF_SMOKE)
    )
    got_pos = _pos_rows(read_attribution_position_stream(spark, idx))
    assert got_pos == _pos_rows(
        specs["events_attribution_position"].builder(spark, SF_SMOKE)
    )
    assert len(got_pos) > 0 and any(r[3] >= 2 for r in got_pos)  # non-vacuous
    # checkpointed no-op replay
    before = _lt_rows(read_attribution_stream(spark, idx))
    assert run_attribution_update_available_now(spark, src, idx, ckpt) == []
    assert _lt_rows(read_attribution_stream(spark, idx)) == before


def test_same_day_state_spans_triggers(spark, tmp_path):
    """The split the day-pure store refuses: a click and its same-day
    purchase arrive in DIFFERENT triggers. The read must attribute —
    same-day window state is reconstructed at read time from the
    cross-batch click rows."""
    src, ckpt, idx = (str(tmp_path / d) for d in ("src", "ckpt", "idx"))
    click = [(10, 1, "2025-05-09 10:00:00", "click", 1.0)]
    purchase = [(11, 1, "2025-05-09 12:00:00", "purchase", 5.0)]

    def drop(rows):
        spark.createDataFrame(
            [(e, u, None, t, v) for (e, u, _ts, t, v) in rows], _COLS
        ).withColumn(
            "ts", F.lit(rows[0][2]).cast("timestamp")
        ).write.mode("append").parquet(src)

    drop(click)
    run_attribution_update_available_now(spark, src, idx, ckpt)
    drop(purchase)
    run_attribution_update_available_now(spark, src, idx, ckpt)
    got = {r.purchase_id: r for r in read_attribution_stream(spark, idx).collect()}
    assert got[11].attributed and got[11].click_id == 10
    assert got[11].gap_us == 2 * 3600 * 1_000_000
    lin = {
        r.purchase_id: r
        for r in read_attribution_linear_stream(spark, idx).collect()
    }
    assert lin[11].n_clicks_window == 1 and lin[11].attributed


def test_tie_frames_match_lanes(spark, tmp_path):
    """Same-microsecond click (lower event_id): last-touch (ROWS frame)
    credits it at gap 0; linear/position (RANGE -1µs) exclude it —
    identical to the one-shot lanes' divergent frames."""
    idx = str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [
            (10, 1, "2025-05-09 12:00:00", "click", 1.0),
            (11, 1, "2025-05-09 12:00:00", "purchase", 5.0),
            (12, 1, "2025-05-09 12:30:00", "click", 1.0),  # after purchase
        ],
        "event_id bigint, user_id bigint, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    land_attribution_batch(spark, idx, batch, "b0")
    lt = read_attribution_stream(spark, idx).collect()[0]
    assert lt.attributed and lt.click_id == 10 and lt.gap_us == 0
    lin = read_attribution_linear_stream(spark, idx).collect()[0]
    assert not lin.attributed and lin.n_clicks_window == 0
    pos = read_attribution_position_stream(spark, idx).collect()[0]
    assert not pos.attributed and pos.first_click_id is None


def test_window_boundaries_and_refusals(spark, tmp_path):
    """Inclusive 7-day edge (gap exactly 7d attributes), 8-day miss,
    bad batch keys, and NULL ts refusal."""
    idx = str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [
            (10, 1, "2025-05-02 12:00:00", "click", 1.0),  # exactly 7d
            (11, 1, "2025-05-09 12:00:00", "purchase", 5.0),
            (20, 2, "2025-05-01 12:00:00", "click", 1.0),  # 8d: miss
            (21, 2, "2025-05-09 12:00:00", "purchase", 7.0),
        ],
        "event_id bigint, user_id bigint, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    land_attribution_batch(spark, idx, batch, "b0")
    got = {r.purchase_id: r for r in read_attribution_stream(spark, idx).collect()}
    assert got[11].attributed and got[11].gap_us == 7 * 86400 * 1_000_000
    assert not got[21].attributed
    lin = {
        r.purchase_id: r
        for r in read_attribution_linear_stream(spark, idx).collect()
    }
    assert lin[11].n_clicks_window == 1 and lin[21].n_clicks_window == 0
    with pytest.raises(ValueError, match="bad batch key"):
        land_attribution_batch(spark, idx, batch, "date=evil")
    null_ts = spark.createDataFrame(
        [(30, 3, None, "purchase", 1.0)],
        "event_id bigint, user_id bigint, ts timestamp, event_type string, value double",
    )
    with pytest.raises(ValueError, match="NULL ts"):
        land_attribution_batch(spark, idx, null_ts, "b1")


def test_cli_stream_roundtrip(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark.cli import main

    src, ckpt, idx, out = (
        str(tmp_path / d) for d in ("src", "ckpt", "idx", "out")
    )
    _events(spark).write.parquet(src)
    assert (
        main(
            [
                "attribution-store",
                "--index",
                idx,
                "--stream-source",
                src,
                "--checkpoint",
                ckpt,
                "--stream-out",
                out,
                "--read-mode",
                "position",
            ]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["statusCode"] == 200 and rep["stream_purchases"] > 0
    assert rep["stream_read_mode"] == "position"
    got = _pos_rows(spark.read.parquet(out))
    assert got == _pos_rows(
        all_specs()["events_attribution_position"].builder(spark, SF_SMOKE)
    )


def test_time_decay_stream_read_equals_oneshot(spark, tmp_path):
    """The any-split ledger's fourth read: time-decay weights from the
    shared window join's exact gaps — row-equal to the one-shot lane
    under a scrambled split."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_time_decay_stream,
    )

    events = _events(spark)
    src, ckpt, idx = (str(tmp_path / d) for d in ("src", "ckpt", "idx"))
    for k in range(2):
        events.filter(F.col("event_id") % 2 == k).write.mode("append").parquet(src)
    run_attribution_update_available_now(spark, src, idx, ckpt)

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

    got = rows(read_attribution_time_decay_stream(spark, idx))
    want = rows(
        all_specs()["events_attribution_time_decay"].builder(spark, SF_SMOKE)
    )
    assert got == want and len(got) > 0


def test_ledger_compaction_preserves_reads_and_spends_keys(spark, tmp_path):
    """r10: folding old ingest_batch partitions into the base must leave
    all three reads row-identical (rows are disjoint across triggers so
    the fold is a concatenation), collapse the directory count, refuse
    re-landing folded keys, accept keys at/after the horizon, never
    lower the horizon on a later earlier-keyed re-run, and guard
    stranded staging."""
    import os

    from data_ingestion_lambda_spark.operators.attribution_store import (
        LEDGER_BASE_KEY,
        compact_attribution_ledger,
    )

    events = _events(spark)
    idx = str(tmp_path / "idx")
    n_batches = 6
    for k in range(n_batches):
        batch = events.filter(F.col("event_id") % n_batches == k)
        land_attribution_batch(spark, idx, batch, f"b{k:09d}")

    def dirs(sub):
        return sorted(
            d
            for d in os.listdir(f"{idx}/{sub}")
            if d.startswith("ingest_batch=")
        )

    lt_before = _lt_rows(read_attribution_stream(spark, idx))
    lin_before = _lin_rows(read_attribution_linear_stream(spark, idx))
    pos_before = _pos_rows(read_attribution_position_stream(spark, idx))
    assert len(dirs("stream_purchases")) == n_batches

    report = compact_attribution_ledger(spark, idx, "b000000004")  # folds 0-3
    assert report["folded"]["stream_purchases"] == 4
    assert dirs("stream_purchases") == [
        f"ingest_batch={LEDGER_BASE_KEY}",
        "ingest_batch=b000000004",
        "ingest_batch=b000000005",
    ]
    assert _lt_rows(read_attribution_stream(spark, idx)) == lt_before
    assert _lin_rows(read_attribution_linear_stream(spark, idx)) == lin_before
    assert _pos_rows(read_attribution_position_stream(spark, idx)) == pos_before

    # second fold takes the remaining batches INTO the existing base
    compact_attribution_ledger(spark, idx, "b999999999")
    assert dirs("stream_purchases") == [f"ingest_batch={LEDGER_BASE_KEY}"]
    assert _lt_rows(read_attribution_stream(spark, idx)) == lt_before

    # spent replay keys refuse; the reserved base key always refuses
    with pytest.raises(ValueError, match="replay key is spent"):
        land_attribution_batch(spark, idx, events.limit(0), "b000000002")
    with pytest.raises(ValueError, match="reserved"):
        land_attribution_batch(spark, idx, events.limit(0), LEDGER_BASE_KEY)
    # a current key still lands (and reads keep working alongside base)
    land_attribution_batch(
        spark, idx, events.filter(F.col("event_id") % 97 == 0), "b999999999"
    )
    # an earlier keep_from on a later re-run cannot lower the horizon
    compact_attribution_ledger(spark, idx, "b000000001")
    with pytest.raises(ValueError, match="replay key is spent"):
        land_attribution_batch(spark, idx, events.limit(0), "b000000003")

    # stranded staging refuses loudly
    os.makedirs(f"{idx}/stream_clicks/.compact-staging")
    with pytest.raises(RuntimeError, match="stranded"):
        compact_attribution_ledger(spark, idx, "c000000000")


def test_cli_ledger_compaction_roundtrip(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark.cli import main

    events = _events(spark)
    idx = str(tmp_path / "idx")
    for k in range(3):
        land_attribution_batch(
            spark, idx, events.filter(F.col("event_id") % 3 == k), f"b{k:09d}"
        )
    before = _lt_rows(read_attribution_stream(spark, idx))
    assert (
        main(
            [
                "attribution-store",
                "--index",
                idx,
                "--compact-keep-from-key",
                "b000000002",
            ]
        )
        == 0
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["folded"]["stream_purchases"] == 2
    assert _lt_rows(read_attribution_stream(spark, idx)) == before
