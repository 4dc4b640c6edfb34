"""Persistent-metastore story for the bucketed dedup gate (r8): the
bucketed band table's layout metadata must survive a PROCESS RESTART —
session 1 creates the table via the CLI with --metastore-dir, session 2
(a fresh JVM) must still see it as BUCKETED and plan the daily probe
with ONE bkey exchange (the batch side only; the index side is a
bucketed FileScan). Without the metastore, Spark's in-memory catalog
forgets bucketing at exit and day 2 would silently pay the index-side
shuffle again."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

_SESSION2 = """
import json, sys
sys.path.insert(0, {repo!r})
from data_ingestion_lambda_spark import get_spark
from data_ingestion_lambda_spark.operators.dedup_gate import probe_batch_bucketed

spark = get_spark("ms-session2", metastore_dir={ms!r})
assert spark.catalog.tableExists("gate_ms_restart"), "table lost across restart"
batch = spark.read.parquet({day2!r}).select("doc_id", "text")
plan = (
    probe_batch_bucketed(spark, "gate_ms_restart", batch, exclude_date="2025-07-02")
    ._jdf.queryExecution().executedPlan().toString()
)
print(json.dumps({{
    "bucketed": "Bucketed: true" in plan,
    "bkey_exchanges": plan.count("hashpartitioning(bkey"),
}}))
"""


def _run(args, **kw):
    return subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, timeout=600, **kw
    )


def test_bucketed_layout_survives_process_restart(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    day1, day2 = str(tmp_path / "day1"), str(tmp_path / "day2")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(day1)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(day2)
    ms = str(tmp_path / "metastore")

    # session 1: create + first apply through the CLI
    r1 = _run(
        [
            sys.executable, "-m", "data_ingestion_lambda_spark", "dedup-gate",
            "--bucketed-table", "gate_ms_restart", "--metastore-dir", ms,
            "--batch", day1, "--date", "2025-07-01",
        ]
    )
    assert r1.returncode == 0, r1.stderr[-3000:]
    rep1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert rep1["statusCode"] == 200 and rep1["batch_docs"] > 0

    # session 2: a FRESH JVM probes the persisted table
    r2 = _run([sys.executable, "-c", _SESSION2.format(repo=REPO, ms=ms, day2=day2)])
    assert r2.returncode == 0, r2.stderr[-3000:]
    out = json.loads(r2.stdout.strip().splitlines()[-1])
    # the restart kept the bucketed layout: the index side is a bucketed
    # FileScan that never exchanges on bkey — so at most ONE bkey
    # exchange total (the batch side; 0 when AQE broadcasts the small
    # batch instead). A forgotten layout shuffles BOTH sides: 2.
    assert out["bucketed"] is True
    assert out["bkey_exchanges"] <= 1, out

    # session 3: day-2 apply through the CLI against the same metastore
    # still works end-to-end (probe + dynamic-partition insert)
    r3 = _run(
        [
            sys.executable, "-m", "data_ingestion_lambda_spark", "dedup-gate",
            "--bucketed-table", "gate_ms_restart", "--metastore-dir", ms,
            "--batch", day2, "--date", "2025-07-02",
        ]
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    rep3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert rep3["statusCode"] == 200 and rep3["batch_docs"] > 0
