"""Maintained Count-Min store: N daily grids + read-side cell sum must
equal the one-shot sketch (cell-wise additivity), estimates must never
undercount the exact totals, replays must be no-ops, and the streaming
front must converge to the same grid under a mid-stream split."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.cms_store import (
    apply_cms_batch,
    estimate_items,
    read_cms,
)
from data_ingestion_lambda_spark.plans.profiling import _hh_items, cms_counters

SF = "/root/testdata/sf0.001"
_N_DAYS = 3


def _grid_rows(df):
    return sorted((r.j, r.bucket, r.cnt) for r in df.collect())


def _items_with_day(spark):
    from data_ingestion_lambda_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events")
    return ev.select(
        F.when(
            F.col("event_id") % 10 < 3,
            F.concat(F.lit("hot_"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("c"), F.col("event_id").cast("string")))
        .alias("item"),
        (F.pmod(F.col("event_id"), F.lit(_N_DAYS))).alias("slice"),
    )


def test_daily_grids_sum_to_oneshot_and_never_undercount(spark, tmp_path):
    idx = str(tmp_path / "cms_idx")
    items = _items_with_day(spark)
    for day in range(_N_DAYS):
        batch = items.filter(F.col("slice") == day).select("item")
        apply_cms_batch(spark, idx, batch, f"2025-07-0{day + 1}")
    allitems = items.select("item")
    assert _grid_rows(read_cms(spark, idx)) == _grid_rows(cms_counters(allitems))
    exact = allitems.groupBy("item").agg(F.count("*").cast("long").alias("cnt"))
    est = estimate_items(spark, idx, allitems)
    bad = exact.join(est, "item").filter(F.col("est") < F.col("cnt")).count()
    assert bad == 0
    hot = {r.item: r.est for r in est.filter(F.col("item").startswith("hot_")).collect()}
    true_hot = {
        r.item: r.cnt for r in exact.filter(F.col("item").startswith("hot_")).collect()
    }
    assert all(hot[k] >= v for k, v in true_hot.items())


def test_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "cms_idx")
    items = _items_with_day(spark)
    for day in range(_N_DAYS):
        apply_cms_batch(
            spark, idx, items.filter(F.col("slice") == day).select("item"),
            f"2025-07-0{day + 1}",
        )
    before = _grid_rows(read_cms(spark, idx))
    apply_cms_batch(
        spark, idx, items.filter(F.col("slice") == _N_DAYS - 1).select("item"),
        f"2025-07-0{_N_DAYS}",
    )
    assert _grid_rows(read_cms(spark, idx)) == before


def test_stream_front_converges_under_midstream_split(spark, tmp_path):
    from data_ingestion_lambda_spark.streaming.index_streams import (
        run_cms_update_available_now,
    )

    items = _items_with_day(spark).select("item")
    rows = items.collect()
    cut = len(rows) // 2
    src, ckpt, idx = (str(tmp_path / d) for d in ("src", "ckpt", "idx"))
    spark.createDataFrame(rows[:cut], "item string").write.mode("append").parquet(src)
    run_cms_update_available_now(spark, src, idx, ckpt)
    spark.createDataFrame(rows[cut:], "item string").write.mode("append").parquet(src)
    run_cms_update_available_now(spark, src, idx, ckpt)
    assert _grid_rows(read_cms(spark, idx)) == _grid_rows(cms_counters(items))
    assert run_cms_update_available_now(spark, src, idx, ckpt) == []


def test_cli_roundtrip(spark, tmp_path, capsys):
    """cms-store CLI: two daily applies then a point query; estimates
    must never undercount the exact totals."""
    import json

    from data_ingestion_lambda_spark.cli import main

    items = _items_with_day(spark)
    for day in range(2):
        p = str(tmp_path / f"day{day}")
        items.filter(F.col("slice") == day).select("item").write.parquet(p)
        assert (
            main(
                ["cms-store", "--index", str(tmp_path / "idx"),
                 "--batch", p, "--date", f"2025-07-0{day + 1}"]
            )
            == 0
        )
    q = str(tmp_path / "q")
    items.filter(F.col("slice") < 2).select("item").distinct().write.parquet(q)
    out = str(tmp_path / "est")
    assert (
        main(
            ["cms-store", "--index", str(tmp_path / "idx"),
             "--query", q, "--estimates-out", out]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["statusCode"] == 200 and rep["estimated_items"] > 0
    exact = (
        items.filter(F.col("slice") < 2)
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    est = spark.read.parquet(out)
    assert exact.join(est, "item").filter(F.col("est") < F.col("cnt")).count() == 0


def test_unseen_items_estimate_zero(spark, tmp_path):
    """Review r8: a never-ingested item must answer est=0 (absent cells
    read as zero), not vanish from the output or overestimate from the
    nonzero subset of its cells."""
    idx = str(tmp_path / "cms_idx")
    apply_cms_batch(
        spark, idx, spark.createDataFrame([("a",), ("b",)], "item string"),
        "2025-07-01",
    )
    q = spark.createDataFrame(
        [("a",), ("zz_never_seen_1",), ("zz_never_seen_2",)], "item string"
    )
    got = {r.item: r.est for r in estimate_items(spark, idx, q).collect()}
    assert set(got) == {"a", "zz_never_seen_1", "zz_never_seen_2"}
    assert got["a"] >= 1
    # with d=4 rows over w=512 buckets and 2 ingested items, at least one
    # probed cell of an unseen item is empty with near-certainty; the
    # min-with-zero contract caps both at their true count's upper bound
    assert got["zz_never_seen_1"] == 0 and got["zz_never_seen_2"] == 0


def test_keying_marker_refuses_mixed_ledgers(spark, tmp_path):
    """ADVICE r8: one index dir receiving both CLI date= applies and
    streaming ingest_batch= triggers has conflicting partition column
    names at the same level — Spark's partition discovery rejects the
    READ long after both writers succeeded. The _keyed_by marker makes
    the second writer the loud failure instead."""
    import pytest

    from data_ingestion_lambda_spark.operators.cms_store import (
        apply_cms_batch,
        check_keying_marker,
        read_cms,
    )

    items = spark.createDataFrame([("a",), ("b",), ("a",)], "item string")
    # date-keyed index refuses a streaming-keyed access
    idx1 = str(tmp_path / "cms_date")
    apply_cms_batch(spark, idx1, items, "2025-05-01")
    with pytest.raises(ValueError, match="keyed by date="):
        check_keying_marker(spark, idx1, "ingest_batch")
    # ...and still reads fine (marker dir hidden from the file index)
    assert read_cms(spark, idx1).count() > 0
    # streaming-keyed index refuses a CLI apply
    idx2 = str(tmp_path / "cms_stream")
    check_keying_marker(spark, idx2, "ingest_batch")
    with pytest.raises(ValueError, match="keyed by ingest_batch="):
        apply_cms_batch(spark, idx2, items, "2025-05-01")
    # legacy marker-less dir: keying inferred from existing partitions
    idx3 = str(tmp_path / "cms_legacy")
    apply_cms_batch(spark, idx3, items, "2025-05-01")
    import shutil

    shutil.rmtree(f"{idx3}/_keyed_by=date")
    with pytest.raises(ValueError, match="keyed by date="):
        check_keying_marker(spark, idx3, "ingest_batch")
    apply_cms_batch(spark, idx3, items, "2025-05-02")  # same keying: fine
