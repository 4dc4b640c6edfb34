"""CLI `query` subcommand: list, run, write-parquet, and error paths."""

from __future__ import annotations

import json

from data_ingestion_lambda_spark import cli
from tests.conftest import SF_SMOKE


def test_query_list_covers_registry(capsys):
    assert cli.main(["query", "--list"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    names = {l["name"] for l in lines}
    assert {"q01_pricing_summary", "events_funnel", "text_pii_scrub"} <= names
    assert len(names) == len(lines), "duplicate names in --list"


def test_query_runs_and_prints_rows(spark, capsys):
    assert cli.main(["query", "events_funnel", "--data", SF_SMOKE]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert len(rows) == 1
    assert rows[0]["n_users"] >= rows[0]["n_viewed"] >= rows[0]["n_clicked_after_view"]


def test_query_writes_parquet(spark, tmp_path, capsys):
    out = str(tmp_path / "funnel_out")
    assert cli.main(["query", "corpus_source_cap", "--data", SF_SMOKE, "--out", out]) == 0
    status = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert status["statusCode"] == 200
    assert spark.read.parquet(out).count() > 0


def test_query_unknown_name_and_missing_data(capsys):
    assert cli.main(["query", "nope", "--data", "/tmp"]) == 2
    assert cli.main(["query", "events_funnel"]) == 2
