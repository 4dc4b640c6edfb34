"""Right-to-be-forgotten erasure (operators/erasure.py): zero residual
after erase, only affected partitions rewritten, fully-erased days
deleted outright, replays are no-ops, tombstones audit every request
and stay invisible to table readers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.erasure import (
    erase_keys,
    read_tombstones,
    verify_erasure,
)

# controlled ledger: users 1-6 spread over 4 days; user 99 is the ONLY
# user on 2024-01-05 (the full-partition-erasure case)
_ROWS = [
    (u, f"2024-01-0{d}", u * 100 + d)
    for d in (1, 2, 3, 4)
    for u in range(1, 7)
    if (u + d) % 3 != 0  # not every user on every day
] + [(99, "2024-01-05", 9905)]


def _ledger(spark, path: str):
    df = spark.createDataFrame(_ROWS, "user_id bigint, date string, value bigint")
    df.write.partitionBy("date").parquet(path)
    return spark.read.parquet(path)


def _keys(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "user_id bigint")


def test_erase_zero_residual_and_untouched_partitions(spark, tmp_path):
    path = str(tmp_path / "ledger")
    table = _ledger(spark, path)
    keys = _keys(spark, 1, 2)
    affected_before = {
        str(r.date)
        for r in table.join(keys, "user_id", "semi").select("date").distinct().collect()
    }
    untouched = sorted(
        {str(r.date) for r in table.select("date").distinct().collect()}
        - affected_before
    )
    assert untouched, "fixture must leave some partition untouched"
    before_untouched = sorted(
        map(tuple, table.filter(F.col("date").isin(untouched)).collect())
    )
    expect_survivors = table.join(keys, "user_id", "anti").count()

    report = erase_keys(spark, path, keys, request_id="req-001")
    assert sorted(report["affected_dates"]) == sorted(affected_before)
    assert report["rows_erased"] > 0
    assert report["partitions_rewritten"] == len(affected_before)
    assert report["partitions_deleted"] == 0
    assert verify_erasure(spark, path, keys) == 0
    after = spark.read.parquet(path)
    assert after.count() == expect_survivors
    assert before_untouched == sorted(
        map(tuple, after.filter(F.col("date").isin(untouched)).collect())
    ), "partitions without the subjects must be byte-equivalent"


def test_fully_erased_partition_is_deleted(spark, tmp_path):
    path = str(tmp_path / "ledger")
    table = _ledger(spark, path)
    before_others = sorted(
        map(tuple, table.filter(F.col("date") != "2024-01-05").collect())
    )
    report = erase_keys(spark, path, _keys(spark, 99), request_id="req-002")
    assert report["partitions_deleted"] == 1
    assert report["partitions_rewritten"] == 0
    assert not os.path.exists(f"{path}/date=2024-01-05")
    after = spark.read.parquet(path)
    assert after.filter(F.col("date") == "2024-01-05").count() == 0
    assert sorted(map(tuple, after.collect())) == before_others


def test_replay_is_noop_and_tombstones_audit(spark, tmp_path):
    path = str(tmp_path / "ledger")
    _ledger(spark, path)
    keys = _keys(spark, 3, 4)
    erase_keys(spark, path, keys, request_id="req-003")
    survivors = sorted(map(tuple, spark.read.parquet(path).collect()))

    replay = erase_keys(spark, path, keys, request_id="req-003")
    assert replay["affected_dates"] == [] and replay["rows_erased"] == 0
    assert replay["partitions_rewritten"] == 0 and replay["partitions_deleted"] == 0
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == survivors

    tombs = read_tombstones(spark, path)
    assert tombs.filter(F.col("request_id") == "req-003").count() == 2
    assert {r.subject_key for r in tombs.collect()} == {"3", "4"}
    # tombstones are invisible to table readers (underscore-prefixed dir)
    assert "subject_key" not in spark.read.parquet(path).columns


def test_cli_erase_roundtrip(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark.cli import main

    path = str(tmp_path / "ledger")
    _ledger(spark, path)
    kpath = str(tmp_path / "keys.parquet")
    _keys(spark, 1, 2).write.parquet(kpath)

    rc = main(
        ["erase", "--target", path, "--keys", kpath, "--request-id", "cli-1"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["statusCode"] == 200 and rep["residual_rows"] == 0
    assert rep["rows_erased"] > 0

    rc = main(["erase", "--target", path, "--keys", kpath, "--request-id", "v",
               "--verify-only"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["residual_rows"] == 0


def test_erase_on_empty_table_is_graceful(spark, tmp_path):
    """Erasing every partition, then erasing again: the second request
    must report zeros (and still land its tombstone) instead of dying
    on schema inference over an empty directory."""
    path = str(tmp_path / "ledger")
    _ledger(spark, path)
    everyone = _keys(spark, *range(1, 7), 99)
    erase_keys(spark, path, everyone, request_id="req-all")
    report = erase_keys(spark, path, everyone, request_id="req-again")
    assert report["affected_dates"] == [] and report["rows_erased"] == 0
    tombs = read_tombstones(spark, path)
    assert tombs.filter(F.col("request_id") == "req-again").count() == 7


def test_replay_preserves_original_tombstone_and_verify_empty_table(spark, tmp_path):
    """Review r9: a replay of an already-served request must not
    overwrite the audit record with a no-op one, and verify_erasure on
    a fully-emptied table reports 0 instead of failing schema
    inference."""
    path = str(tmp_path / "ledger")
    _ledger(spark, path)
    keys = _keys(spark, 1, 2)
    first = erase_keys(spark, path, keys, request_id="req-keep")
    assert first["rows_erased"] > 0
    orig = sorted(
        (r.subject_key, r.n_affected_dates)
        for r in read_tombstones(spark, path)
        .filter(F.col("request_id") == "req-keep")
        .collect()
    )
    assert all(n > 0 for _, n in orig)

    erase_keys(spark, path, keys, request_id="req-keep")  # replay
    after = sorted(
        (r.subject_key, r.n_affected_dates)
        for r in read_tombstones(spark, path)
        .filter(F.col("request_id") == "req-keep")
        .collect()
    )
    assert after == orig, "replay must not rewrite the audit evidence"

    everyone = _keys(spark, *range(1, 7), 99)
    erase_keys(spark, path, everyone, request_id="req-all")
    assert verify_erasure(spark, path, everyone) == 0
