"""SCD Type 2 incremental sink (operators/scd2.py).

The batch derivation scd2_user_segments is the semantic spec (its DuckDB
oracle pins it cross-engine); these tests pin the INCREMENTAL operator
against it: chronological batch application converges to the batch
answer, replay is a no-op, and out-of-order batches are rejected loudly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.scd2 import apply_scd2, read_scd2
from data_ingestion_lambda_spark.plans import all_specs

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(
        (r.user_id, r.segment, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    )


def test_incremental_batches_match_batch_derivation(spark, tmp_path):
    target = str(tmp_path / "scd2")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # three chronological batches split at global time boundaries
    bounds = events.orderBy("ts", "event_id").limit(int(events.count() * 2 / 3)).agg(
        F.max("ts")
    ).first()[0]
    b1 = events.orderBy("ts", "event_id").limit(int(events.count() / 3))
    t1 = b1.agg(F.max("ts")).first()[0]
    batch1 = events.filter(F.col("ts") <= t1)
    batch2 = events.filter((F.col("ts") > t1) & (F.col("ts") <= bounds))
    batch3 = events.filter(F.col("ts") > bounds)
    assert batch1.count() and batch2.count() and batch3.count()

    for b in (batch1, batch2, batch3):
        apply_scd2(spark, target, b)

    got = _rows(read_scd2(spark, target))
    want = _rows(all_specs()["scd2_user_segments"].builder(spark, SF_SMOKE))
    assert got == want

    # replaying the final batch changes nothing (exact-duplicate dedup)
    apply_scd2(spark, target, batch3)
    assert _rows(read_scd2(spark, target)) == want


def test_same_segment_across_batches_does_not_open_a_version(spark, tmp_path):
    target = str(tmp_path / "scd2")
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    import datetime as dt

    ts = lambda m: dt.datetime(2025, 1, 1, 10, m)
    apply_scd2(spark, target, mk([(1, ts(0), 1, "view"), (1, ts(5), 2, "click")]))
    # next batch re-reports "click": no new version row may open
    apply_scd2(spark, target, mk([(1, ts(10), 3, "click"), (1, ts(15), 4, "view")]))
    rows = sorted(_rows(read_scd2(spark, target)), key=lambda r: r[2])
    assert [(r[1], r[4]) for r in rows] == [
        ("view", False),
        ("click", False),
        ("view", True),
    ]
    # validity chain is gapless: each valid_to equals the next valid_from
    assert rows[0][3] == rows[1][2] and rows[1][3] == rows[2][2]


def test_out_of_order_batch_for_other_keys_is_rejected(spark, tmp_path):
    target = str(tmp_path / "scd2")
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    import datetime as dt

    ts = lambda m: dt.datetime(2025, 1, 1, 10, m)
    apply_scd2(spark, target, mk([(1, ts(30), 1, "view")]))
    with pytest.raises(ValueError, match="event-time-ordered"):
        apply_scd2(spark, target, mk([(2, ts(0), 2, "click")]))
