"""Spark 4 Python DataSource API lane (sources/python_datasource.py).

The oracle row (source_python_datasource) pins content against DuckDB;
these tests pin the SOURCE mechanics: partition planning, pushdown-driven
partition pruning (externally observable as planned-partition count),
advisory-pushdown correctness, and determinism across reads.
"""

from __future__ import annotations

import pytest

from data_ingestion_lambda_spark.sources.python_datasource import (
    _rows_for_day,
    register_python_sources,
)


@pytest.fixture()
def source(spark):
    register_python_sources(spark)
    return lambda **opts: spark.read.format("synthetic_events").options(
        **{k: str(v) for k, v in opts.items()}
    ).load()


def test_plans_one_partition_per_day_and_matches_model(source):
    df = source(days=3, rows_per_day=10)
    assert df.rdd.getNumPartitions() == 3
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(row for d in range(3) for row in _rows_for_day(d, 10))
    assert got == want


def test_pushed_day_bounds_prune_partitions(source):
    assert source().filter("day = 2").rdd.getNumPartitions() == 1
    assert source().filter("day >= 1 AND day < 3").rdd.getNumPartitions() == 2
    # advisory pushdown: Spark re-applies the predicate, so a bound that
    # prunes to one partition still filters rows exactly
    rows = source(days=4, rows_per_day=50).filter("day = 2").collect()
    assert len(rows) == 50 and all(r.day == 2 for r in rows)


def test_unpushable_filter_stays_correct_without_pruning(source):
    df = source(days=2, rows_per_day=100).filter("event_type = 'purchase'")
    assert df.rdd.getNumPartitions() == 2, "non-day filters must not prune"
    assert df.count() == sum(
        1 for d in range(2) for row in _rows_for_day(d, 100) if row[3] == "purchase"
    )


def test_reads_are_deterministic(source):
    a = sorted(tuple(r) for r in source().collect())
    b = sorted(tuple(r) for r in source().collect())
    assert a == b and len(a) == 2000


def test_contradictory_bounds_plan_zero_partitions(source):
    df = source().filter("day > 2 AND day < 2")
    assert df.count() == 0


# --- streaming side (synthetic_ticks, SimpleDataSourceStreamReader) ----------


def _run_ticks(spark, out, ckpt, batches):
    q = (
        spark.readStream.format("synthetic_ticks")
        .option("batches", str(batches))
        .option("rows_per_batch", "10")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_source_checkpoint_resume_and_delta_pickup(spark, tmp_path):
    """The reference's checkpoint + backfill loop through the engine's
    offset log: one trigger drains all available batches; a restart with
    no new data adds nothing; a restart after more data becomes available
    drains ONLY the delta."""
    register_python_sources(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_ticks(spark, out, ckpt, batches=3)
    df = spark.read.parquet(out)
    assert df.count() == 30
    assert sorted(r.batch for r in df.select("batch").distinct().collect()) == [0, 1, 2]

    _run_ticks(spark, out, ckpt, batches=3)
    assert spark.read.parquet(out).count() == 30, "no new data -> no new rows"

    _run_ticks(spark, out, ckpt, batches=5)
    df = spark.read.parquet(out)
    assert df.count() == 50, "restart drains exactly the two new batches"
    got = sorted(tuple(r) for r in df.collect())
    from data_ingestion_lambda_spark.sources.python_datasource import _ticks_for_batch

    want = sorted(row for b in range(5) for row in _ticks_for_batch(b, 10))
    assert got == want, "delta + original content matches the formula exactly"


def test_stream_source_replay_between_offsets_is_exact():
    """readBetweenOffsets must reproduce a committed range exactly — the
    recovery path that makes the source exactly-once."""
    from data_ingestion_lambda_spark.sources.python_datasource import (
        _TickStreamReader,
        _ticks_for_batch,
    )

    r = _TickStreamReader({"batches": "4", "rows_per_batch": "7"})
    first, end = r.read(r.initialOffset())
    assert end == {"batch": 4}
    assert list(r.readBetweenOffsets({"batch": 1}, {"batch": 3})) == [
        row for b in (1, 2) for row in _ticks_for_batch(b, 7)
    ]
    # replaying the full committed range equals the original read
    assert list(r.readBetweenOffsets({"batch": 0}, end)) == list(first)


# --- write side (manifest_json, DataSourceWriter two-phase commit) -----------


def test_manifest_writer_commit_and_readback(spark, tmp_path):
    import glob
    import json

    from data_ingestion_lambda_spark.sources.python_datasource import read_manifested

    register_python_sources(spark)
    path = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id", "id % 7 AS grp").repartition(4)
    df.write.format("manifest_json").mode("append").save(path)

    manifests = glob.glob(f"{path}/_MANIFEST-*.json")
    assert len(manifests) == 1
    m = json.load(open(manifests[0]))
    assert m["total_rows"] == 100
    # the manifest lists exactly the part files on disk, with counts
    on_disk = {p.split("/")[-1] for p in glob.glob(f"{path}/part-*.jsonl")}
    assert {e["filename"] for e in m["files"]} == on_disk
    assert sum(e["n_rows"] for e in m["files"]) == 100

    back = read_manifested(spark, path)
    assert back.count() == 100
    assert sorted(r.id for r in back.collect()) == list(range(100))

    # append again: a second manifest, readers see the union
    spark.range(100, 150).selectExpr("id", "id % 7 AS grp").write.format(
        "manifest_json"
    ).mode("append").save(path)
    assert len(glob.glob(f"{path}/_MANIFEST-*.json")) == 2
    assert read_manifested(spark, path).count() == 150


def test_manifest_writer_failed_job_stays_invisible(spark, tmp_path):
    """A task failure mid-write must leave NO manifest: staged part files
    from successful sibling tasks are aborted away and readers (who trust
    only manifests) see nothing — the transactionality the reference's
    find-then-track loop lacks (SURVEY §1.4.2)."""
    import glob

    import pytest as _pytest

    from data_ingestion_lambda_spark.sources.python_datasource import read_manifested

    register_python_sources(spark)
    path = str(tmp_path / "sink")
    poisoned = spark.range(100).selectExpr(
        "id", "CAST(assert_true(id != 77, 'boom') AS string) AS chk"
    ).repartition(4)
    with _pytest.raises(Exception):
        poisoned.write.format("manifest_json").mode("append").save(path)
    assert glob.glob(f"{path}/_MANIFEST-*.json") == [], "failed write must not commit"
    assert read_manifested(spark, path).count() == 0


def test_manifest_writer_rejects_overwrite(spark, tmp_path):
    import pytest as _pytest

    register_python_sources(spark)
    with _pytest.raises(Exception, match="append-only"):
        spark.range(5).write.format("manifest_json").mode("overwrite").save(
            str(tmp_path / "sink")
        )


# --- end-to-end: synthetic_ticks stream -> LWW MERGE target ------------------


def test_ticks_stream_to_lww_merge_restart_resume(spark, tmp_path):
    """The reference lambda's FULL loop on the modern API, composed
    end-to-end: incremental source (offset-checkpointed Python stream
    reader) -> foreachBatch -> keyed idempotent MERGE (staged-swap LWW) —
    and the restart contract across the WHOLE pipeline, not just the
    source: a restart with no new data leaves the table byte-identical,
    a restart after more data merges exactly the delta, and the final
    state equals the one-shot batch derivation (per sensor, the reading
    of its highest tick — order_cols=['tick_id'] is a payload order, so
    replayed older ticks can never regress a stored row)."""
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.operators.upsert import upsert_into_parquet
    from data_ingestion_lambda_spark.sources.python_datasource import (
        _ticks_for_batch,
        register_python_sources,
    )

    register_python_sources(spark)
    target, ckpt = str(tmp_path / "target"), str(tmp_path / "ckpt")

    def merge_batch(df, _batch_id):
        batch = df.withColumn("date", F.lit("2025-06-01")).withColumn(
            "updated_at", F.to_timestamp(F.lit("2025-06-01 00:00:00"))
        )
        upsert_into_parquet(
            spark, target, batch, keys=["date", "sensor_id"], order_cols=["tick_id"]
        )

    def run(batches):
        q = (
            spark.readStream.format("synthetic_ticks")
            .option("batches", str(batches))
            .option("rows_per_batch", "10")
            .load()
            .writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def state():
        return sorted(
            (r.sensor_id, r.tick_id, r.reading_milli)
            for r in spark.read.parquet(target).collect()
        )

    def expected(n_batches):
        last = {}
        for b in range(n_batches):
            for _, tick_id, sensor_id, reading in _ticks_for_batch(b, 10):
                last[sensor_id] = (sensor_id, tick_id, reading)
        return sorted(last.values())

    run(3)
    assert state() == expected(3)

    run(3)  # restart, no new data: checkpoint resume must merge nothing
    assert state() == expected(3)

    run(5)  # restart after growth: exactly the two new batches merge in
    assert state() == expected(5)


# --- stream write side (manifest_json epoch manifests) ------------------------


def _run_ticks_to_manifest(spark, out, ckpt, batches):
    q = (
        spark.readStream.format("synthetic_ticks")
        .option("batches", str(batches))
        .option("rows_per_batch", "10")
        .load()
        .writeStream.format("manifest_json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_writer_epoch_manifests_and_restart_resume(spark, tmp_path):
    """Full-Python streaming pipeline: Python stream READER -> Python
    stream WRITER — the DataSource API's fourth quadrant. One trigger
    drains all batches into epoch manifests; a restart with no new data
    writes nothing; a restart with more data appends ONLY the delta
    epochs."""
    import glob
    import json

    from data_ingestion_lambda_spark.sources.python_datasource import (
        _ticks_for_batch,
        read_manifested,
    )

    register_python_sources(spark)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_ticks_to_manifest(spark, out, ckpt, batches=3)
    epochs = sorted(glob.glob(f"{out}/_EPOCH-*.json"))
    assert len(epochs) >= 1
    assert sum(json.load(open(e))["total_rows"] for e in epochs) == 30
    back = read_manifested(spark, out)
    assert back.count() == 30

    _run_ticks_to_manifest(spark, out, ckpt, batches=3)
    assert read_manifested(spark, out).count() == 30, "no new data -> no new epochs"

    _run_ticks_to_manifest(spark, out, ckpt, batches=5)
    got = sorted(
        (r.batch, r.tick_id, r.sensor_id, r.reading_milli)
        for r in read_manifested(spark, out).collect()
    )
    want = sorted(row for b in range(5) for row in _ticks_for_batch(b, 10))
    assert got == want, "delta epochs + originals match the formula exactly"


def test_stream_writer_epoch_replay_is_idempotent(tmp_path):
    """An epoch replayed after a crash re-stages fresh part files and its
    commit REPLACES the epoch manifest — the superseded attempt's files
    are stranded but invisible to readers."""
    import json
    import os

    from data_ingestion_lambda_spark.sources.python_datasource import (
        _EpochManifestStreamWriter,
        _ManifestCommitMessage,
    )

    path = str(tmp_path / "sink")
    os.makedirs(path)
    w = _EpochManifestStreamWriter({"path": path})
    for name, rows in (("part-attempt1.jsonl", 7), ("part-attempt2.jsonl", 9)):
        with open(os.path.join(path, name), "w") as f:
            f.write('{"x": 1}\n' * rows)

    w.commit([_ManifestCommitMessage("part-attempt1.jsonl", 7)], batchId=0)
    w.commit([_ManifestCommitMessage("part-attempt2.jsonl", 9)], batchId=0)  # replay
    manifests = [p for p in os.listdir(path) if p.startswith("_EPOCH-")]
    assert manifests == ["_EPOCH-00000000000000000000.json"], "one manifest per epoch"
    m = json.load(open(os.path.join(path, manifests[0])))
    assert [e["filename"] for e in m["files"]] == ["part-attempt2.jsonl"]
    assert m["total_rows"] == 9, "replay replaces, never unions"


def test_stream_writer_abort_removes_staged_files(tmp_path):
    import os

    from data_ingestion_lambda_spark.sources.python_datasource import (
        _EpochManifestStreamWriter,
        _ManifestCommitMessage,
    )

    path = str(tmp_path / "sink")
    os.makedirs(path)
    with open(os.path.join(path, "part-doomed.jsonl"), "w") as f:
        f.write('{"x": 1}\n')
    w = _EpochManifestStreamWriter({"path": path})
    w.abort([_ManifestCommitMessage("part-doomed.jsonl", 1), None], batchId=3)
    assert not os.path.exists(os.path.join(path, "part-doomed.jsonl"))
    assert [p for p in os.listdir(path) if p.startswith("_EPOCH-")] == []
