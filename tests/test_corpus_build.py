"""Corpus-build capstone: the N-day incremental runner (maintained gates +
ledgers) must row-equal the one-shot ``corpus_build_disposition`` lane, and
a replayed old day must change nothing (the as-of index semantics of
dedup_gate's ``before_date``)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.corpus_build import (
    finalize_disposition,
    run_corpus_build,
    run_day,
)
from data_ingestion_lambda_spark.plans.corpus_build import RECRAWL_MOD
from data_ingestion_lambda_spark.plans.registry import REGISTRY, release_pinned

from .conftest import SF_SMOKE

_N_DOCS = 500  # sf0.001 documents rows
_N_RECRAWL = len(range(0, _N_DOCS, RECRAWL_MOD))

_STAGES = {
    "exact_duplicate",
    "duplicate",
    "quality",
    "repetition",
    "contaminated",
    "contamination_radius",
    "dropped_cap",
    "selected",
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """One 3-day incremental build + the one-shot lane, computed once."""
    root = str(tmp_path_factory.mktemp("corpus_build"))
    work, out = f"{root}/work", f"{root}/out"
    report = run_corpus_build(spark, SF_SMOKE, work, n_days=3, out_dir=out)
    one = REGISTRY["corpus_build_disposition"].builder(spark, SF_SMOKE)
    one_rows = _rows(one)
    release_pinned()
    return {"work": work, "out": out, "report": report, "one_rows": one_rows}


def test_incremental_equals_one_shot(spark, built):
    inc_rows = _rows(spark.read.parquet(built["out"]))
    assert inc_rows == built["one_rows"]


def test_disposition_is_exhaustive_and_nonvacuous(spark, built):
    disp = spark.read.parquet(built["out"])
    n = disp.count()
    assert n == _N_DOCS + _N_RECRAWL  # one row per corpus doc, re-crawls included
    assert disp.select("doc_id").distinct().count() == n
    stages = {r["disposition"] for r in disp.select("disposition").distinct().collect()}
    assert stages <= _STAGES
    counts = {
        r["disposition"]: r["n"]
        for r in disp.groupBy("disposition").agg(F.count("*").alias("n")).collect()
    }
    # the modeled re-crawl sweep is caught by the exact gate, all of it
    assert counts["exact_duplicate"] == _N_RECRAWL
    # the pipeline stages actually fire on this corpus (non-vacuous)
    assert counts.get("duplicate", 0) > 0
    assert counts.get("quality", 0) > 0
    assert counts.get("repetition", 0) > 0
    assert counts.get("selected", 0) > 0
    # split only for selected docs, and a real one
    bad = disp.filter(
        ((F.col("disposition") == "selected") & F.col("split").isNull())
        | ((F.col("disposition") != "selected") & F.col("split").isNotNull())
    ).count()
    assert bad == 0
    splits = {r["split"] for r in disp.filter(F.col("split").isNotNull()).select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_gate_report_shape(built):
    days = built["report"]["days"]
    assert [d["date"] for d in days] == ["d000", "d001", "d002"]
    # the last day is the re-crawl sweep: every doc flagged by the exact gate
    assert days[-1]["batch_docs"] == _N_RECRAWL
    assert days[-1]["exact_flagged"] == _N_RECRAWL
    # flagged docs never reach the near-dup gate
    assert days[-1]["near_dup_pairs"] == 0


def test_replay_old_day_is_idempotent(spark, built):
    """Re-running day 1 AFTER day 2 has landed must not change the final
    table: the gates probe their as-of (before_date) index state, so the
    replay recomputes exactly what the first run computed."""
    run_day(spark, SF_SMOKE, built["work"], 1, 3)
    disp = finalize_disposition(spark, built["work"])
    try:
        assert _rows(disp) == built["one_rows"]
    finally:
        release_pinned()


def test_cli_one_shot_run(spark, built, tmp_path, capsys):
    """The corpus-build CLI with --days 1 (everything in one batch: the
    within-batch digest pairs catch the re-crawls) lands on the same
    disposition histogram as the one-shot lane."""
    from data_ingestion_lambda_spark.cli import main

    work, out = str(tmp_path / "work"), str(tmp_path / "out")
    rc = main(
        ["corpus-build", "--data", SF_SMOKE, "--work-dir", work, "--days", "1",
         "--out", out]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statusCode"] == 200
    want = {}
    for r in built["one_rows"]:
        want[r[2]] = want.get(r[2], 0) + 1
    assert report["disposition_counts"] == want


def test_auto_compacted_gates_leave_disposition_unchanged(spark, built, tmp_path):
    """The unbounded-days knob: with --auto-compact-max-dirs the gate
    indexes stay dir-bounded while the finalized disposition still
    row-equals the one-shot lane (folding never changes verdicts — the
    exact gate's canonical-min and the probes read all index rows
    regardless of partition identity). What folding SPENDS is the folded
    days' replay keys: replaying one refuses loudly."""
    import os

    import pytest

    from data_ingestion_lambda_spark.operators.corpus_build import (
        EXACT_INDEX,
        MINHASH_INDEX,
    )

    from data_ingestion_lambda_spark.operators.corpus_build import LEDGERS

    work = str(tmp_path / "work")
    report = run_corpus_build(
        spark, SF_SMOKE, work, n_days=5, auto_compact_max_dirs=2
    )
    # gate indexes AND the five work-dir ledgers stay dir-bounded
    # (VERDICT r13 #2: the ledgers used to grow one date= dir per day
    # unbounded)
    for name in (EXACT_INDEX, MINHASH_INDEX, *LEDGERS):
        dates = [
            n
            for n in os.listdir(os.path.join(work, name))
            if n.startswith("date=") and n != "date=0000-00-00"
        ]
        assert len(dates) <= 2, (name, sorted(dates))
    folds = [
        d["auto_compact"][EXACT_INDEX].get("due") for d in report["days"]
    ]
    assert any(folds)  # the policy actually fired
    assert any(d["auto_compact"]["ledgers"].get("due") for d in report["days"])
    disp = finalize_disposition(spark, work)
    try:
        assert _rows(disp) == built["one_rows"]
    finally:
        release_pinned()
    # day 0's key was folded — its replay refuses instead of double-counting
    with pytest.raises(ValueError, match="horizon"):
        run_day(spark, SF_SMOKE, work, 0, 5)


def test_ledger_fold_alone_preserves_finalize_and_erasure(spark, built, tmp_path):
    """The ledger fold in isolation (manual compact_corpus_ledgers, no
    gate fold): finalize row-equals the unfolded work dir by pure
    concatenation, a folded day's replay refuses at the LEDGER horizon,
    and store erasure still reaches rows folded into the base
    partitions."""
    import shutil

    import pytest

    from data_ingestion_lambda_spark.operators.corpus_build import (
        compact_corpus_ledgers,
    )
    from data_ingestion_lambda_spark.operators.store_erasure import (
        erase_store,
        verify_store_erasure,
    )

    work = str(tmp_path / "work")
    shutil.copytree(built["work"], work)
    rep = compact_corpus_ledgers(spark, work, keep_from="d002")
    assert rep["horizon"] == "d002"
    # docs/verdicts/grams land every day; the flag tables (pairs /
    # exact_matches) only on days that produced matches — d000/d001 may
    # legitimately have none to fold
    for name in ("docs", "verdicts", "grams"):
        assert rep["folded"][name] >= 1, rep["folded"]

    disp = finalize_disposition(spark, work)
    try:
        assert _rows(disp) == built["one_rows"]
    finally:
        release_pinned()

    # a folded day refuses at the ledger horizon even though the GATE
    # indexes were never folded (independent policies)
    with pytest.raises(ValueError, match="corpus-build ledgers"):
        run_day(spark, SF_SMOKE, work, 0, 3)

    # erasure reaches base-partition rows: pick a doc that is in the fold
    doc = spark.read.parquet(f"{work}/docs").limit(1).collect()[0]["doc_id"]
    keys = spark.createDataFrame([(doc,)], "doc_id long")
    erase_store(spark, "corpus-build", work, keys, request_id="req-fold-1")
    assert verify_store_erasure(spark, "corpus-build", work, keys) == 0


def test_cli_day_then_finalize_runs_both(spark, built, tmp_path, capsys):
    """--day N --finalize-only is the one-command 'run the last day and
    assemble' invocation (ADVICE r13: the finalize used to be silently
    skipped): the day pass runs, THEN the disposition assembles."""
    from data_ingestion_lambda_spark.cli import main

    work = str(tmp_path / "work")
    for day in ("0", "1"):
        assert main([
            "corpus-build", "--data", SF_SMOKE, "--work-dir", work,
            "--days", "3", "--day", day,
        ]) == 0
    rc = main([
        "corpus-build", "--data", SF_SMOKE, "--work-dir", work,
        "--days", "3", "--day", "2", "--finalize-only",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statusCode"] == 200
    assert report["day"]["date"] == "d002"  # the day pass ran
    want = {}
    for r in built["one_rows"]:
        want[r[2]] = want.get(r[2], 0) + 1
    assert report["disposition_counts"] == want  # and the finalize ran


def test_cli_day_finalize_requires_data(tmp_path):
    from data_ingestion_lambda_spark.cli import main

    with pytest.raises(SystemExit, match="--data is required"):
        main([
            "corpus-build", "--work-dir", str(tmp_path / "w"),
            "--days", "3", "--day", "2", "--finalize-only",
        ])


def test_finalize_empty_work_dir_refuses(spark, tmp_path):
    """--finalize-only on a work dir no day has ever ingested into must
    refuse with the remedy, not die in parquet schema inference
    (ADVICE r13)."""
    with pytest.raises(ValueError, match="no day has been ingested"):
        finalize_disposition(spark, str(tmp_path / "fresh"))


def test_cli_day_out_of_range_refuses(tmp_path):
    """A --day without the matching --days would gate the whole corpus
    under one day's partition (days defaults to 1) — refuse up front."""
    from data_ingestion_lambda_spark.cli import main

    with pytest.raises(SystemExit, match="out of range"):
        main([
            "corpus-build", "--data", SF_SMOKE,
            "--work-dir", str(tmp_path / "w"), "--day", "3",
        ])


def test_erase_then_finalize_equals_never_ingested(spark, tmp_path):
    """Right-to-be-forgotten through the capstone: erase subjects from
    the corpus-build work dir (gates, ledgers, pair/flag tables — the
    pair rows match from EITHER side), verify zero residual, and the
    re-finalized disposition row-equals a build that NEVER INGESTED the
    subjects — clusters, contamination and the cap all recompute from
    the surviving rows."""
    from data_ingestion_lambda_spark.operators.store_erasure import (
        erase_store,
        verify_store_erasure,
    )

    work = str(tmp_path / "work")
    run_corpus_build(spark, SF_SMOKE, work, n_days=2)

    pair_ids = {
        r["new_doc"] for r in spark.read.parquet(f"{work}/pairs").collect()
    } | {r["dup_of"] for r in spark.read.parquet(f"{work}/pairs").collect()}
    # one near-dup-flagged doc + one unflagged doc; neither is re-crawled
    # (a re-crawled subject's +1M twin would need erasing too)
    flagged = sorted(i for i in pair_ids if i % RECRAWL_MOD != 0 and i < 1_000_000)
    assert flagged, "corpus must have near-dup pairs for this pin"
    all_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{work}/docs").select("doc_id").collect()
    }
    plain = sorted(
        i for i in all_ids - pair_ids if i % RECRAWL_MOD != 0 and i < 1_000_000
    )
    subjects = [flagged[0], plain[0]]
    keys = spark.createDataFrame([(k,) for k in subjects], "doc_id long")

    rep = erase_store(spark, "corpus-build", work, keys, "req-cb-1")
    assert rep["rows_erased"] > 0
    assert verify_store_erasure(spark, "corpus-build", work, keys) == 0
    disp = finalize_disposition(spark, work)
    try:
        erased_rows = _rows(disp)
    finally:
        release_pinned()
    assert not any(r[0] in subjects for r in erased_rows)

    # the never-ingested twin: a fresh build over the filtered corpus
    filt = str(tmp_path / "sf")
    (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(~F.col("doc_id").isin(subjects))
        .write.parquet(f"{filt}/documents.parquet")
    )
    out2 = str(tmp_path / "out2")
    run_corpus_build(spark, filt, str(tmp_path / "work2"), n_days=2, out_dir=out2)
    assert erased_rows == _rows(spark.read.parquet(out2))


def test_streamed_drops_equal_one_shot(spark, built, tmp_path):
    """Structured Streaming in front of the capstone: document drops
    drained through the offset log, each micro-batch gated+ledgered
    under its own b<id> key — finalize over the accumulated stores
    row-equals the one-shot lane, and a re-drain is a checkpointed
    no-op."""
    from data_ingestion_lambda_spark.operators.corpus_build import (
        batch_for_day,
        run_corpus_build_available_now,
    )
    from data_ingestion_lambda_spark.plans.corpus_build import corpus_with_recrawl

    corpus = corpus_with_recrawl(spark, SF_SMOKE)
    drops = str(tmp_path / "drops")
    # three drops in arrival order; the re-crawl sweep lands last (the
    # gate-in-front contract needs originals no later than re-crawls)
    for d in range(3):
        batch_for_day(corpus, d, 3).coalesce(1).write.parquet(
            f"{drops}/drop{d}.parquet"
        )
    work, ckpt = str(tmp_path / "work"), str(tmp_path / "ckpt")
    reports = run_corpus_build_available_now(
        spark, drops, work, ckpt, max_files_per_trigger=1
    )
    assert len(reports) == 3
    assert sum(r["exact_flagged"] for r in reports) == _N_RECRAWL
    disp = finalize_disposition(spark, work)
    try:
        assert _rows(disp) == built["one_rows"]
    finally:
        release_pinned()
    # drained checkpoint: a re-run sees nothing new
    assert run_corpus_build_available_now(spark, drops, work, ckpt) == []
