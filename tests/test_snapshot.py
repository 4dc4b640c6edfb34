"""Table snapshots: version isolation under in-place MERGE rewrites."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.snapshot import (
    expire_snapshots,
    list_snapshots,
    read_snapshot,
    snapshot_table,
)
from data_ingestion_lambda_spark.operators.upsert import upsert_into_parquet


def _batch(spark, rows):
    return spark.createDataFrame(
        [(*r, "2025-05-01 12:00:00") for r in rows],
        "date string, client_code string, total_consumed_tokens long, updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))


def test_snapshot_isolates_versions_across_upserts(spark, tmp_path):
    target = str(tmp_path / "consumptions")
    upsert_into_parquet(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 100), ("2025-05-01", "B", 10)]),
        keys=["date", "client_code"],
        order_cols=["total_consumed_tokens"],
    )
    v1 = snapshot_table(target, note="after first load")
    # MERGE rewrites the partition in place: A updated, C added
    upsert_into_parquet(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 999), ("2025-05-01", "C", 5)]),
        keys=["date", "client_code"],
        order_cols=["total_consumed_tokens"],
    )
    v2 = snapshot_table(target)
    assert (v1, v2) == (1, 2)

    as_of_1 = {
        r.client_code: r.total_consumed_tokens
        for r in read_snapshot(spark, target, 1).collect()
    }
    assert as_of_1 == {"A": 100, "B": 10}, "v1 must show pre-merge state"
    as_of_2 = {
        r.client_code: r.total_consumed_tokens
        for r in read_snapshot(spark, target, 2).collect()
    }
    assert as_of_2 == {"A": 999, "B": 10, "C": 5}
    # live table == latest snapshot, and the snapshot root is invisible
    live = spark.read.parquet(target)
    assert {(r.client_code, r.total_consumed_tokens) for r in live.collect()} == {
        ("A", 999),
        ("B", 10),
        ("C", 5),
    }
    # snapshots carry honest manifests
    metas = list_snapshots(target)
    assert [m["version"] for m in metas] == [1, 2]
    assert all(m["n_files"] > 0 and m["total_bytes"] > 0 for m in metas)
    assert metas[0]["note"] == "after first load"


def test_expire_keeps_newest(spark, tmp_path):
    target = str(tmp_path / "t")
    upsert_into_parquet(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 1)]),
        keys=["date", "client_code"],
        order_cols=["total_consumed_tokens"],
    )
    for _ in range(3):
        snapshot_table(target)
    assert expire_snapshots(target, keep_last=1) == [1, 2]
    assert [m["version"] for m in list_snapshots(target)] == [3]
    assert read_snapshot(spark, target, 3).count() == 1


def test_cli_snapshot_roundtrip(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark import cli

    target = str(tmp_path / "t2")
    upsert_into_parquet(
        spark,
        target,
        _batch(spark, [("2025-05-02", "X", 7)]),
        keys=["date", "client_code"],
        order_cols=["total_consumed_tokens"],
    )
    assert cli.main(["snapshot", "--target", target, "--note", "cli"]) == 0
    assert json.loads(capsys.readouterr().out)["version"] == 1
    assert cli.main(["snapshot", "--target", target, "--list"]) == 0
    snaps = json.loads(capsys.readouterr().out)["snapshots"]
    assert len(snaps) == 1 and snaps[0]["note"] == "cli"


def test_diff_snapshots_classifies_added_removed_changed(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.snapshot import diff_snapshots

    target = str(tmp_path / "consumptions")
    keys = ["date", "client_code"]
    upsert_into_parquet(
        spark,
        target,
        _batch(
            spark,
            [("2025-05-01", "A", 100), ("2025-05-01", "B", 10), ("2025-05-01", "D", 7)],
        ),
        keys=keys,
        order_cols=["total_consumed_tokens"],
    )
    v1 = snapshot_table(target, note="v1")
    # A changes, C appears; B and D keep their stored values (LWW by the
    # payload order col keeps the larger stored B=10 over a replayed 10)
    upsert_into_parquet(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 999), ("2025-05-01", "C", 5)]),
        keys=keys,
        order_cols=["total_consumed_tokens"],
    )
    v2 = snapshot_table(target, note="v2")

    got = {
        r.client_code: r.status
        for r in diff_snapshots(spark, target, v1, v2, keys=keys).collect()
    }
    assert got["A"] == "changed"
    assert got["C"] == "added"
    assert got["B"] == "unchanged" and got["D"] == "unchanged"
    # direction matters: the reverse diff flips added to removed
    rev = {
        r.client_code: r.status
        for r in diff_snapshots(spark, target, v2, v1, keys=keys).collect()
    }
    assert rev["C"] == "removed"


def test_cli_snapshot_diff(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark import cli

    target = str(tmp_path / "consumptions")
    keys = ["date", "client_code"]
    upsert_into_parquet(
        spark, target, _batch(spark, [("2025-05-01", "A", 1)]), keys=keys
    )
    snapshot_table(target)
    upsert_into_parquet(
        spark, target, _batch(spark, [("2025-05-01", "A", 9), ("2025-05-01", "B", 2)]),
        keys=keys,
    )
    snapshot_table(target)
    rc = cli.main(["snapshot", "--target", target, "--diff", "1,2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["diff"] == {"changed": 1, "added": 1}


def test_diff_digest_distinguishes_null_from_sentinel_lookalikes(spark, tmp_path):
    """The per-column digest must not confuse (a) a NULL with any literal
    string and (b) rows whose values shift across column boundaries —
    the two ambiguities of the retired concat_ws('\\x01') digest."""
    import pyspark.sql.functions as F

    from data_ingestion_lambda_spark.operators.snapshot import (
        diff_snapshots,
        snapshot_table,
    )

    target = str(tmp_path / "t")
    mk = lambda rows: spark.createDataFrame(
        rows, "date string, k string, c1 string, c2 string"
    )
    # v1: (NULL, 'x') and ('a\x01b', 'c')
    mk([("2025-05-01", "K1", None, "x"), ("2025-05-01", "K2", "a\x01b", "c")]).write.mode(
        "overwrite"
    ).partitionBy("date").parquet(target)
    snapshot_table(target)
    # v2: K1's NULL becomes the literal old sentinel '\x00'; K2's separator
    # position shifts ('a', '\x01b…' concatenation-equal under the old
    # scheme). Overwrite only the partition dir — a root-level overwrite
    # would delete .snapshots/ along with the data.
    mk([("2025-05-01", "K1", "\x00", "x"), ("2025-05-01", "K2", "a", "\x01b\x01c")]).drop(
        "date"
    ).write.mode("overwrite").parquet(f"{target}/date=2025-05-01")
    snapshot_table(target)

    got = {
        r.k: r.status
        for r in diff_snapshots(spark, target, 1, 2, keys=["date", "k"]).collect()
    }
    assert got == {"K1": "changed", "K2": "changed"}


def test_hadoop_fs_path_equals_plain_os_path(spark, tmp_path):
    """FS-agnostic route (r8): with ``spark`` passed and a URI-scheme
    target, all snapshot I/O goes through the Hadoop FS API — the
    resulting versions must behave identically to the plain-os path
    (freeze, list, read, hardlink economics on file://, expire), and the
    two routes must interoperate on the same snapshot root."""
    target = str(tmp_path / "consumptions")
    upsert_into_parquet(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 100), ("2025-05-01", "B", 10)]),
        keys=["date", "client_code"],
        order_cols=["total_consumed_tokens"],
    )
    uri = f"file://{target}"
    v1 = snapshot_table(uri, note="via hadoop fs", spark=spark)
    assert v1 == 1
    # file:// is the local FS -> materialization hardlinked, not copied:
    # at freeze time the snapshot file IS the live file (same inode). The
    # later merge deletes the live copy, dropping st_nlink back to 1 —
    # the hardlink keeping the old blocks alive is the whole design.
    import json as _json

    with open(os.path.join(target, ".snapshots", "v1", "manifest.json")) as fh:
        first = sorted(_json.load(fh)["files"])[0]
    assert (
        os.stat(os.path.join(target, ".snapshots", "v1", first)).st_ino
        == os.stat(os.path.join(target, first)).st_ino
    )
    upsert_into_parquet(
        spark,
        target,
        _batch(spark, [("2025-05-01", "A", 999)]),
        keys=["date", "client_code"],
        order_cols=["total_consumed_tokens"],
    )
    # plain-os route sees the hadoop-written version and continues the chain
    v2 = snapshot_table(target, note="via plain os")
    assert v2 == 2
    metas_h = list_snapshots(uri, spark=spark)
    metas_o = list_snapshots(target)
    assert [m["version"] for m in metas_h] == [1, 2]
    assert [(m["version"], m["n_files"], m["total_bytes"]) for m in metas_h] == [
        (m["version"], m["n_files"], m["total_bytes"]) for m in metas_o
    ]
    # the frozen v1 still serves the pre-merge row
    rows_v1 = {
        (r.client_code): r.total_consumed_tokens
        for r in read_snapshot(spark, uri, 1).collect()
    }
    assert rows_v1["A"] == 100
    # expire through the hadoop route
    assert expire_snapshots(uri, keep_last=1, spark=spark) == [1]
    assert [m["version"] for m in list_snapshots(target)] == [2]
