"""Maintained BM25 postings index (operators/postings.py) — the
equivalence discipline: N daily appends + search must reproduce the
one-shot ``search_bm25_topk`` to the last bit (the scoring expression
is literally shared), the stored postings/doclen row-equal the one-shot
aggregates, replays are no-ops, and the search's postings scan must
partition-prune on the query terms' buckets."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.postings import (
    search_topk,
    update_postings,
)
from data_ingestion_lambda_spark.plans.llm_ops import tokens
from data_ingestion_lambda_spark.plans.retrieval import N_QUERIES, search_bm25_topk
from tests.conftest import SF_SMOKE

_N_DAYS = 3


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")


def _build(spark, docs, idx):
    for day in range(_N_DAYS):
        batch = docs.filter(F.col("doc_id") % _N_DAYS == day)
        update_postings(spark, str(idx), batch, f"2025-07-0{day + 1}")


def _queries(docs):
    return docs.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "text"
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["match_id"], r["bm25"]) for r in df.collect()
    )


def test_maintained_search_equals_one_shot(spark, tmp_path):
    docs = _docs(spark)
    idx = tmp_path / "idx"
    _build(spark, docs, idx)
    got = _rows(search_topk(spark, str(idx), _queries(docs)))
    want = _rows(search_bm25_topk(spark, SF_SMOKE))
    assert got == want  # bit-identical bm25 doubles: shared scaled-long expression


def test_index_rows_equal_one_shot_aggregates(spark, tmp_path):
    docs = _docs(spark)
    idx = tmp_path / "idx"
    _build(spark, docs, idx)
    stored = sorted(
        (r["tok"], r["doc_id"], r["tf"])
        for r in spark.read.parquet(f"{idx}/postings")
        .select("tok", "doc_id", "tf")
        .collect()
    )
    oneshot = sorted(
        (r["tok"], r["doc_id"], r["tf"])
        for r in docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    assert stored == oneshot
    # read-side scalar sums == one-shot corpus totals
    from data_ingestion_lambda_spark.operators.postings import read_stats

    n, t = read_stats(spark, str(idx))
    assert n == docs.count()
    assert t == sum(tf for (_, _, tf) in oneshot)


def test_append_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    idx = tmp_path / "idx"
    _build(spark, docs, idx)

    def state():
        return (
            sorted(
                (r["tok"], r["doc_id"], r["tf"], r["date"])
                for r in spark.read.parquet(f"{idx}/postings").collect()
            ),
            sorted(
                (r["doc_id"], r["dl"], r["date"])
                for r in spark.read.parquet(f"{idx}/doclen").collect()
            ),
            sorted(
                (r["n_docs"], r["t_tokens"], r["date"])
                for r in spark.read.parquet(f"{idx}/stats").collect()
            ),
        )

    before = state()
    last = docs.filter(F.col("doc_id") % _N_DAYS == _N_DAYS - 1)
    update_postings(spark, str(idx), last, f"2025-07-0{_N_DAYS}")
    assert state() == before


def test_cli_search_index_roundtrip(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark.cli import main

    docs = _docs(spark)
    day_pqs = []
    for day in range(_N_DAYS):
        p = tmp_path / f"day{day}.parquet"
        docs.filter(F.col("doc_id") % _N_DAYS == day).write.parquet(str(p))
        day_pqs.append(p)
    q_pq = tmp_path / "queries.parquet"
    docs.filter(F.col("doc_id") < N_QUERIES).write.parquet(str(q_pq))
    idx = tmp_path / "idx"

    for day, p in enumerate(day_pqs):
        assert (
            main(
                [
                    "search-index",
                    "--index",
                    str(idx),
                    "--batch",
                    str(p),
                    "--date",
                    f"2025-07-0{day + 1}",
                ]
            )
            == 0
        )
    out = tmp_path / "topk.parquet"
    assert (
        main(
            [
                "search-index",
                "--index",
                str(idx),
                "--query",
                str(q_pq),
                "--out",
                str(out),
            ]
        )
        == 0
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statusCode"] == 200 and report["result_rows"] > 0
    assert _rows(spark.read.parquet(str(out))) == _rows(
        search_bm25_topk(spark, SF_SMOKE)
    )


def test_compaction_preserves_search_and_collapses_dirs(spark, tmp_path):
    """VERDICT r9 #3: folding old date partitions into the base must
    leave every BM25 score bit-identical (postings/doclen rows are
    disjoint across dates, stats are additive), collapse the directory
    count, keep read_stats exact, and be idempotent on re-run."""
    from data_ingestion_lambda_spark.operators.postings import (
        compact_postings_index,
        count_partition_dirs,
        read_stats,
    )

    docs = _docs(spark)
    idx = tmp_path / "idx"
    _build(spark, docs, idx)
    want = _rows(search_bm25_topk(spark, SF_SMOKE))
    stats_before = read_stats(spark, str(idx))
    dirs_before = count_partition_dirs(spark, str(idx))

    report = compact_postings_index(spark, str(idx), "2025-07-03")  # folds days 1-2
    assert report["folded"]["postings"] == 2
    dirs_mid = count_partition_dirs(spark, str(idx))
    assert dirs_mid < dirs_before
    assert read_stats(spark, str(idx)) == stats_before
    assert _rows(search_topk(spark, str(idx), _queries(docs))) == want

    # second fold takes the remaining day INTO the existing base
    compact_postings_index(spark, str(idx), "2025-07-09")
    assert count_partition_dirs(spark, str(idx)) < dirs_mid
    assert read_stats(spark, str(idx)) == stats_before
    assert _rows(search_topk(spark, str(idx), _queries(docs))) == want

    # re-run with nothing left to fold: no-op, state unchanged
    assert compact_postings_index(spark, str(idx), "2025-07-09")["folded"] == {
        "postings": 0,
        "doclen": 0,
        "stats": 0,
    }
    assert _rows(search_topk(spark, str(idx), _queries(docs))) == want


def test_compaction_spends_replay_keys_and_guards_staging(spark, tmp_path):
    import pytest

    from data_ingestion_lambda_spark.operators.postings import (
        compact_postings_index,
    )

    docs = _docs(spark)
    idx = tmp_path / "idx"
    _build(spark, docs, idx)
    compact_postings_index(spark, str(idx), "2025-07-03")
    # replaying a folded day must refuse (its rows live in the base now)
    with pytest.raises(ValueError, match="replay key is spent"):
        update_postings(
            spark,
            str(idx),
            docs.filter(F.col("doc_id") % _N_DAYS == 0),
            "2025-07-01",
        )
    # a NEW day at/after the horizon still lands
    update_postings(spark, str(idx), docs.limit(0), "2025-07-04")
    # an EARLIER keep_from on a later re-run cannot lower the horizon
    compact_postings_index(spark, str(idx), "2025-07-02")
    with pytest.raises(ValueError, match="replay key is spent"):
        update_postings(spark, str(idx), docs.limit(5), "2025-07-02")
    # stranded staging refuses loudly
    (idx / "postings" / ".compact-staging").mkdir()
    with pytest.raises(RuntimeError, match="stranded"):
        compact_postings_index(spark, str(idx), "2025-07-09")


def test_search_scan_partition_prunes_on_bucket(spark, tmp_path):
    docs = _docs(spark)
    idx = tmp_path / "idx"
    _build(spark, docs, idx)
    plan = (
        search_topk(spark, str(idx), _queries(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"PartitionFilters: \[bucket#\d+ IN", plan), plan


def test_cli_compaction_roundtrip(spark, tmp_path, capsys):
    import json

    from data_ingestion_lambda_spark.cli import main

    docs = _docs(spark)
    idx = tmp_path / "idx"
    _build(spark, docs, idx)
    want = _rows(search_topk(spark, str(idx), _queries(docs)))
    assert (
        main(["search-index", "--index", str(idx), "--compact-keep-from", "2025-07-03"])
        == 0
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["folded"]["postings"] == 2
    assert _rows(search_topk(spark, str(idx), _queries(docs))) == want
