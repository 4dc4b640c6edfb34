"""Change-data-capture upsert (operators/upsert.py::
upsert_into_parquet_with_cdc): the feed must contain exactly the keys
the merge touched (inserts + real updates, nothing for no-op re-sends
or losing stale rows), applying the feed to the pre-merge table must
reproduce the post-merge table, and a replayed (batch, change_key)
must overwrite only its own feed partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.upsert import (
    upsert_into_parquet,
    upsert_into_parquet_with_cdc,
)

KEYS = ["date", "client_code"]


def _batch(spark, rows):
    return spark.createDataFrame(
        [(*r, "2025-05-01 12:00:00") for r in rows],
        "date string, client_code string, total_consumed_tokens long, updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))


def _table(spark, path):
    return sorted(
        (r.date, r.client_code, r.total_consumed_tokens)
        for r in spark.read.parquet(path).collect()
    )


def _feed(spark, path, key):
    return sorted(
        (r.op, str(r.row_date), r.client_code, r.total_consumed_tokens)
        for r in spark.read.parquet(f"{path}/date={key}").collect()
    )


def test_cdc_feed_and_apply_equivalence(spark, tmp_path):
    target = str(tmp_path / "t")
    rep = upsert_into_parquet_with_cdc(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 100), ("2025-05-01", "B", 10)]),
        change_key="b1",
        keys=KEYS,
        order_cols=["total_consumed_tokens"],
    )
    assert (rep["inserts"], rep["updates"]) == (2, 0)

    # materialize the pre state as PLAIN ROWS — persisting the DataFrame
    # would also hijack later reads of the same path via the plan cache
    # keys normalized to ISO strings: the feed's row_date is pinned to
    # string (stable across the first-batch/later-batch merge paths),
    # while the table's partition column reads back as DATE
    pre_rows = {
        (str(r.date), r.client_code): r.total_consumed_tokens
        for r in spark.read.parquet(target).collect()
    }

    # batch 2: A updated (200 beats 100), B re-sent identically (no-op),
    # C inserted, and a STALE A=50 that loses the payload order (no-op)
    rep2 = upsert_into_parquet_with_cdc(
        spark,
        target,
        _batch(
            spark,
            [
                ("2025-05-01", "A", 200),
                ("2025-05-01", "B", 10),
                ("2025-05-01", "C", 7),
            ],
        ),
        change_key="b2",
        keys=KEYS,
        order_cols=["total_consumed_tokens"],
    )
    assert (rep2["inserts"], rep2["updates"]) == (1, 1)
    feed_dir = rep2["changes_dir"]
    got = _feed(spark, feed_dir, "b2")
    assert got == [
        ("insert", "2025-05-01", "C", 7),
        ("update", "2025-05-01", "A", 200),
    ]

    # CDC contract: pre + feed == post (apply = upsert feed rows by key)
    applied = dict(pre_rows)
    for r in spark.read.parquet(f"{feed_dir}/date=b2").collect():
        applied[(r.row_date, r.client_code)] = r.total_consumed_tokens
    assert sorted((d, c, v) for (d, c), v in applied.items()) == [
        (str(d), c, v) for d, c, v in _table(spark, target)
    ]


def test_cdc_replay_is_idempotent_and_matches_plain_upsert(spark, tmp_path):
    t_cdc, t_plain = str(tmp_path / "cdc"), str(tmp_path / "plain")
    b1 = _batch(spark, [("2025-05-01", "A", 100), ("2025-05-02", "B", 10)])
    b2 = _batch(spark, [("2025-05-01", "A", 250), ("2025-05-02", "D", 4)])
    for b, key in ((b1, "b1"), (b2, "b2")):
        upsert_into_parquet_with_cdc(
            spark, t_cdc, b, change_key=key, keys=KEYS,
            order_cols=["total_consumed_tokens"],
        )
        upsert_into_parquet(
            spark, t_plain, b, keys=KEYS, order_cols=["total_consumed_tokens"]
        )
    # the CDC variant is the same MERGE — table states identical
    assert _table(spark, t_cdc) == _table(spark, t_plain)
    feed_dir = f"{t_cdc}/_changes"
    before_feed = _feed(spark, feed_dir, "b2")
    before_table = _table(spark, t_cdc)
    # replay b2 verbatim: feed partition overwritten identically, table same
    upsert_into_parquet_with_cdc(
        spark, t_cdc, b2, change_key="b2", keys=KEYS,
        order_cols=["total_consumed_tokens"],
    )
    # The replay recomputes an EMPTY effect (b2 already applied), and the
    # operator deliberately KEEPS the original feed partition — it records
    # the logical batch's effect against the pre-b2 state, which a
    # downstream consumer may not have read yet. Table state re-merges to
    # the same rows either way.
    assert _feed(spark, feed_dir, "b2") == before_feed
    assert _table(spark, t_cdc) == before_table


def test_cdc_reader_never_sees_feed(spark, tmp_path):
    """The default feed location is underscore-prefixed, so a plain read
    of the TABLE directory must not pick up feed rows."""
    target = str(tmp_path / "t")
    upsert_into_parquet_with_cdc(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 100)]),
        change_key="b1",
        keys=KEYS,
        order_cols=["total_consumed_tokens"],
    )
    assert spark.read.parquet(target).count() == 1
    assert "op" not in spark.read.parquet(target).columns


def test_ingest_stream_emits_change_feed(spark, tmp_path):
    """End-to-end: the ingest pipeline with changes_dir set emits one
    batch-id feed partition per trigger — first drop all inserts, second
    drop exactly the changed/new keys — and the table equals a plain
    (feed-less) ingest of the same drops."""
    from tests.test_ingestion import HEADER, drop_dir, write_csv
    from data_ingestion_lambda_spark.streaming.ingest import (
        IngestPaths,
        run_ingest_available_now,
    )

    src = str(tmp_path / "drops")
    write_csv(
        drop_dir(src, "2025_05_01"),
        "consumption_2025_05_01.csv",
        ["2025-05-01,CLI001,TechCorp,API Gateway,1500",
         "2025-05-01,CLI002,Acme,Storage,10"],
    )
    paths = IngestPaths(
        source_dir=src,
        target_dir=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        changes_dir=str(tmp_path / "feed"),
    )
    assert run_ingest_available_now(spark, paths) == ["2025-05-01"]
    feed = spark.read.option("basePath", str(tmp_path / "feed")).parquet(
        str(tmp_path / "feed")
    )
    assert {r.op for r in feed.collect()} == {"insert"}
    assert feed.count() == 2

    # second drop: CLI001 re-priced, CLI003 new, CLI002 re-sent identically
    write_csv(
        drop_dir(src, "2025_05_01"),
        "consumption_2025_05_01_b.csv",
        ["2025-05-01,CLI001,TechCorp,API Gateway,2500",
         "2025-05-01,CLI002,Acme,Storage,10",
         "2025-05-01,CLI003,New,Storage,5"],
    )
    assert run_ingest_available_now(spark, paths) == ["2025-05-01"]
    feed2 = spark.read.option("basePath", str(tmp_path / "feed")).parquet(
        str(tmp_path / "feed")
    )
    batches = sorted(r.date for r in feed2.select("date").distinct().collect())
    assert len(batches) == 2
    second = {
        (r.op, r.client_id): r.total_consumed_tokens
        for r in feed2.filter(F.col("date") == batches[-1]).collect()
    }
    assert second == {("update", "CLI001"): 2500, ("insert", "CLI003"): 5}
    # CLI002's identical re-send emitted nothing
    assert ("update", "CLI002") not in second and ("insert", "CLI002") not in second
