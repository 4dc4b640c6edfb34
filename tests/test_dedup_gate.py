"""Pins for the maintained incremental dedup gate (operators/dedup_gate.py):

- **N-day == one-shot** (the apply_scd2 equivalence pattern): cutting the
  corpus into daily batches and gating them sequentially emits, across
  the runs, exactly the pair set the full-corpus ``dedup_minhash_lsh``
  computes — each pair once, on the day its later member arrives — and
  the index after day N row-equals ``minhash_sig_table`` of the corpus.
- **Idempotent replay**: re-applying the last batch (the at-least-once
  failure mode) changes neither the index nor the persisted flag table.
- **CLI**: the ``dedup-gate`` subcommand runs the same pipeline and
  reports the reference-handler-shaped JSON line.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.dedup_gate import (
    apply_batch,
    probe_batch,
    read_index,
)
from data_ingestion_lambda_spark.plans.llm_ops import (
    dedup_minhash_lsh,
    minhash_sig_table,
)
from tests.conftest import SF_SMOKE

_N_DAYS = 3


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")


def _day_of(doc_id_col):
    return doc_id_col % _N_DAYS


def _apply_days(spark, docs, index_dir, matches_dir):
    reports = []
    for day in range(_N_DAYS):
        batch = docs.filter(_day_of(F.col("doc_id")) == day)
        reports.append(
            apply_batch(
                spark,
                str(index_dir),
                batch,
                f"2025-07-0{day + 1}",
                matches_dir=str(matches_dir),
            )
        )
    return reports


def _canonical_pairs(rows):
    return sorted(
        (min(r["a"], r["b"]), max(r["a"], r["b"]), round(r["j"], 9)) for r in rows
    )


def test_incremental_gate_equals_full_corpus(spark, tmp_path):
    docs = _docs(spark)
    index_dir = tmp_path / "index"
    matches_dir = tmp_path / "matches"
    reports = _apply_days(spark, docs, index_dir, matches_dir)
    assert [r["date"] for r in reports] == ["2025-07-01", "2025-07-02", "2025-07-03"]
    # day 1 probes an empty index: only within-batch pairs possible
    first_day = spark.read.parquet(str(matches_dir)).filter(
        F.col("date") == "2025-07-01"
    )
    assert first_day.filter(F.col("match_kind") == "index").count() == 0

    # union of the daily flag tables == the one-shot full-corpus pair set
    got = _canonical_pairs(
        spark.read.parquet(str(matches_dir))
        .select(
            F.col("new_doc").alias("a"),
            F.col("dup_of").alias("b"),
            F.col("est_jaccard").alias("j"),
        )
        .collect()
    )
    want = _canonical_pairs(
        dedup_minhash_lsh(spark, SF_SMOKE)
        .select(
            F.col("doc_a").alias("a"),
            F.col("doc_b").alias("b"),
            F.col("est_jaccard").alias("j"),
        )
        .collect()
    )
    assert got == want and len(want) > 0

    # every pair surfaced exactly once across the N runs
    assert len(got) == len({(a, b) for a, b, _ in got})

    # cross-batch pairs are oriented later-day -> earlier-day; within-batch
    # pairs share a day (the orientation that makes "once" well-defined)
    for r in spark.read.parquet(str(matches_dir)).collect():
        da, db = r["new_doc"] % _N_DAYS, r["dup_of"] % _N_DAYS
        if r["match_kind"] == "batch":
            assert da == db and r["new_doc"] > r["dup_of"]
        else:
            assert da > db

    # index after day N row-equals the full-corpus signature table
    got_idx = sorted(
        (r["doc_id"], tuple(r["sig"]))
        for r in read_index(spark, str(index_dir)).collect()
    )
    want_idx = sorted(
        (r["doc_id"], tuple(r["sig"])) for r in minhash_sig_table(docs).collect()
    )
    assert got_idx == want_idx


def test_replayed_batch_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    index_dir = tmp_path / "index"
    matches_dir = tmp_path / "matches"
    _apply_days(spark, docs, index_dir, matches_dir)

    def state():
        idx = sorted(
            (r["doc_id"], r["date"], tuple(r["sig"]))
            for r in spark.read.parquet(str(index_dir)).collect()
        )
        m = sorted(
            tuple(r) for r in spark.read.parquet(str(matches_dir)).collect()
        )
        return idx, m

    before = state()
    # replay the LAST day (at-least-once delivery): same batch, same date
    last = docs.filter(_day_of(F.col("doc_id")) == _N_DAYS - 1)
    report = apply_batch(
        spark, str(index_dir), last, f"2025-07-0{_N_DAYS}", matches_dir=str(matches_dir)
    )
    assert state() == before
    assert report["batch_docs"] == last.count()


def test_probe_is_read_only(spark, tmp_path):
    docs = _docs(spark)
    index_dir = tmp_path / "index"
    day0 = docs.filter(_day_of(F.col("doc_id")) == 0)
    apply_batch(spark, str(index_dir), day0, "2025-07-01")
    before = read_index(spark, str(index_dir)).count()
    probe_batch(spark, str(index_dir), docs).count()
    assert read_index(spark, str(index_dir)).count() == before


def test_cli_dedup_gate_roundtrip(spark, tmp_path, capsys):
    from data_ingestion_lambda_spark.cli import main

    docs = _docs(spark)
    batch_dir = tmp_path / "batch0"
    docs.filter(_day_of(F.col("doc_id")) == 0).write.parquet(str(batch_dir))
    index_dir = tmp_path / "index"

    rc = main(
        [
            "dedup-gate",
            "--batch",
            str(batch_dir),
            "--index",
            str(index_dir),
            "--date",
            "2025-07-01",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statusCode"] == 200 and report["date"] == "2025-07-01"
    assert read_index(spark, str(index_dir)).count() > 0

    # probe-only reports without appending
    rc = main(
        [
            "dedup-gate",
            "--batch",
            str(batch_dir),
            "--index",
            str(index_dir),
            "--date",
            "2025-07-02",
            "--probe-only",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["probe_only"] is True
    # a batch re-probed against an index containing itself: every doc in
    # the index matches itself with est_jaccard 1.0
    assert report["dup_pairs"] >= report["batch_docs"] - 1
    dates = {
        str(r["date"])
        for r in spark.read.parquet(str(index_dir)).select("date").collect()
    }
    assert dates == {"2025-07-01"}


def test_exact_mode_gate_equals_full_corpus(spark, tmp_path):
    """mode='exact': the digest lane under the same commit protocol. The
    corpus gets planted exact dups (a %7 re-crawl under shifted ids,
    the dedup_incremental_exact model — the base corpus has none), and
    N-day application must emit exactly the unordered same-md5 pair set,
    each pair once, with est_jaccard 1.0 by definition; the index after
    day N row-equals the corpus digest table."""
    base = _docs(spark)
    recrawl = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    docs = base.unionByName(recrawl)
    index_dir = tmp_path / "index"
    matches_dir = tmp_path / "matches"
    for day in range(_N_DAYS):
        batch = docs.filter(_day_of(F.col("doc_id")) == day)
        apply_batch(
            spark,
            str(index_dir),
            batch,
            f"2025-07-0{day + 1}",
            matches_dir=str(matches_dir),
            mode="exact",
        )

    flagged = spark.read.parquet(str(matches_dir)).collect()
    got = sorted(
        (min(r["new_doc"], r["dup_of"]), max(r["new_doc"], r["dup_of"]))
        for r in flagged
    )
    h = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
    want = sorted(
        (r["a"], r["b"])
        for r in h.alias("x")
        .join(
            h.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .collect()
    )
    assert got == want and len(want) > 0
    assert len(got) == len(set(got)), "every pair must surface exactly once"
    assert {r["est_jaccard"] for r in flagged} == {1.0}

    got_idx = sorted(
        (r["doc_id"], r["sig"])
        for r in read_index(spark, str(index_dir), mode="exact").collect()
    )
    want_idx = sorted((r["doc_id"], r["h"]) for r in h.collect())
    assert got_idx == want_idx


def test_exact_mode_replay_is_idempotent(spark, tmp_path):
    # Plant re-crawl dups (the base corpus has no exact dups) so the
    # flag table is non-empty and the replay must reproduce it exactly.
    base0 = _docs(spark)
    base = base0.unionByName(
        base0.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    index_dir = tmp_path / "index"
    matches_dir = tmp_path / "matches"
    for day in range(_N_DAYS):
        batch = base.filter(_day_of(F.col("doc_id")) == day)
        apply_batch(
            spark, str(index_dir), batch, f"2025-07-0{day + 1}",
            matches_dir=str(matches_dir), mode="exact",
        )

    def state():
        idx = sorted(
            (r["doc_id"], r["date"], r["sig"])
            for r in spark.read.parquet(str(index_dir)).collect()
        )
        m = sorted(tuple(r) for r in spark.read.parquet(str(matches_dir)).collect())
        return idx, m

    before = state()
    last = base.filter(_day_of(F.col("doc_id")) == _N_DAYS - 1)
    apply_batch(
        spark, str(index_dir), last, f"2025-07-0{_N_DAYS}",
        matches_dir=str(matches_dir), mode="exact",
    )
    assert state() == before


def _vectors(spark):
    """(doc_id, embedding) batch frame with planted re-crawl copies
    (identical vector under a shifted id — cosine 1.0 by construction,
    so the pair set is non-empty at any threshold)."""
    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    recrawl = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "embedding"
    )
    return base.unionByName(recrawl)


def test_embedding_mode_gate_equals_full_corpus(spark, tmp_path):
    """mode='embedding': N-day gate application emits exactly the pair
    set the one-shot full-corpus sign-LSH scorer computes (each pair
    once, cosine bit-identical — the float64 rescore depends only on the
    two vectors), and the final index row-equals the corpus vectors."""
    from data_ingestion_lambda_spark.plans.similarity import (
        _band_keyed,
        _score_bucket_group,
    )

    docs = _vectors(spark)
    index_dir = tmp_path / "index"
    matches_dir = tmp_path / "matches"
    for day in range(_N_DAYS):
        batch = docs.filter(_day_of(F.col("doc_id")) == day)
        apply_batch(
            spark,
            str(index_dir),
            batch,
            f"2025-07-0{day + 1}",
            matches_dir=str(matches_dir),
            mode="embedding",
        )

    flagged = spark.read.parquet(str(matches_dir)).collect()
    got = sorted(
        (min(r["new_doc"], r["dup_of"]), max(r["new_doc"], r["dup_of"]), r["cosine"])
        for r in flagged
    )
    one_shot = (
        _band_keyed(docs.select(F.col("doc_id").alias("vec_id"), F.col("embedding").alias("vf")))
        .groupBy("band", "grp")
        .applyInPandas(_score_bucket_group, "vec_a bigint, vec_b bigint, cosine double")
        .distinct()
        .collect()
    )
    want = sorted((r["vec_a"], r["vec_b"], r["cosine"]) for r in one_shot)
    assert got == want and len(want) > 0
    assert len(got) == len({(a, b) for a, b, _ in got}), "each pair exactly once"

    got_idx = sorted(
        (r["doc_id"], tuple(r["sig"]))
        for r in read_index(spark, str(index_dir), mode="embedding").collect()
    )
    want_idx = sorted((r["doc_id"], tuple(r["embedding"])) for r in docs.collect())
    assert got_idx == want_idx


def test_embedding_mode_replay_is_idempotent(spark, tmp_path):
    docs = _vectors(spark)
    index_dir = tmp_path / "index"
    matches_dir = tmp_path / "matches"
    for day in range(_N_DAYS):
        batch = docs.filter(_day_of(F.col("doc_id")) == day)
        apply_batch(
            spark, str(index_dir), batch, f"2025-07-0{day + 1}",
            matches_dir=str(matches_dir), mode="embedding",
        )

    def state():
        idx = sorted(
            (r["doc_id"], r["date"], tuple(r["sig"]))
            for r in spark.read.parquet(str(index_dir)).collect()
        )
        m = sorted(
            (r["new_doc"], r["dup_of"], r["cosine"], r["match_kind"], r["date"])
            for r in spark.read.parquet(str(matches_dir)).collect()
        )
        return idx, m

    before = state()
    last = docs.filter(_day_of(F.col("doc_id")) == _N_DAYS - 1)
    apply_batch(
        spark, str(index_dir), last, f"2025-07-0{_N_DAYS}",
        matches_dir=str(matches_dir), mode="embedding",
    )
    assert state() == before


# ---------------------------------------------------------------------------
# Bucketed band-table variant
# ---------------------------------------------------------------------------


def _apply_days_bucketed(spark, docs, table_name, matches_dir):
    from data_ingestion_lambda_spark.operators.dedup_gate import apply_batch_bucketed

    reports = []
    for day in range(_N_DAYS):
        batch = docs.filter(_day_of(F.col("doc_id")) == day)
        reports.append(
            apply_batch_bucketed(
                spark, table_name, batch, f"2025-07-0{day + 1}", matches_dir=str(matches_dir)
            )
        )
    return reports


def _gate_rows(spark, matches_dir):
    return sorted(
        (r["new_doc"], r["dup_of"], round(r["est_jaccard"], 9), r["match_kind"])
        for r in spark.read.parquet(str(matches_dir)).collect()
    )


def test_bucketed_gate_equals_directory_gate(spark, tmp_path):
    """The bucketed band table is a LAYOUT change only: gating the same
    daily batches must emit the identical flag rows (pairs, est values,
    match kinds, days) as the directory gate — which is itself pinned
    equal to the one-shot full-corpus LSH above."""
    docs = _docs(spark)
    dir_matches = tmp_path / "dir_matches"
    _apply_days(spark, docs, tmp_path / "dir_idx", dir_matches)
    buck_matches = tmp_path / "buck_matches"
    try:
        reports = _apply_days_bucketed(spark, docs, "gate_bidx_eq", buck_matches)
        assert _gate_rows(spark, buck_matches) == _gate_rows(spark, dir_matches)
        assert all(r["dup_pairs"] >= 0 for r in reports)
    finally:
        spark.sql("DROP TABLE IF EXISTS gate_bidx_eq")


def test_bucketed_replay_is_idempotent(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.dedup_gate import apply_batch_bucketed

    docs = _docs(spark)
    matches_dir = tmp_path / "m"
    try:
        first = _apply_days_bucketed(spark, docs, "gate_bidx_replay", matches_dir)
        before_idx = spark.table("gate_bidx_replay").count()
        before_rows = _gate_rows(spark, matches_dir)
        last = docs.filter(_day_of(F.col("doc_id")) == _N_DAYS - 1)
        replay = apply_batch_bucketed(
            spark, "gate_bidx_replay", last, f"2025-07-0{_N_DAYS}", matches_dir=str(matches_dir)
        )
        assert replay == first[-1]
        assert spark.table("gate_bidx_replay").count() == before_idx
        assert _gate_rows(spark, matches_dir) == before_rows
    finally:
        spark.sql("DROP TABLE IF EXISTS gate_bidx_replay")


def test_bucketed_probe_skips_index_side_shuffle(spark, tmp_path):
    """The point of the layout: the candidate join reads the index as a
    bucketed FileScan with NO exchange on the stored side — strictly
    fewer exchanges than the directory probe of the same batch, whose
    index side must shuffle its band keys every day."""
    from data_ingestion_lambda_spark.operators.dedup_gate import (
        apply_batch_bucketed,
        probe_batch_bucketed,
    )

    docs = _docs(spark)
    old = docs.filter(_day_of(F.col("doc_id")) != 0)
    batch = docs.filter(_day_of(F.col("doc_id")) == 0)
    try:
        apply_batch_bucketed(spark, "gate_bidx_plan", old, "2025-07-01")
        apply_batch(spark, str(tmp_path / "dir_idx"), old, "2025-07-01")
        buck_plan = (
            probe_batch_bucketed(spark, "gate_bidx_plan", batch)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        dir_plan = (
            probe_batch(spark, str(tmp_path / "dir_idx"), batch)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in buck_plan, buck_plan
        assert buck_plan.count("Exchange") < dir_plan.count("Exchange"), (
            f"bucketed {buck_plan.count('Exchange')} vs directory "
            f"{dir_plan.count('Exchange')} exchanges"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS gate_bidx_plan")


def test_retention_composes_with_the_gate(spark, tmp_path):
    """Gate index retention (r8): expire_partitions drops signature
    partitions past the re-crawl policy, and subsequent probes match
    ONLY against retained days — the policy knob a deployment turns
    when 'duplicates of last year's crawl' stops mattering. The probe's
    own semantics are untouched: a re-probe of the last day against the
    expired index equals probing a fresh index built from the retained
    days alone."""
    from data_ingestion_lambda_spark.operators.compact import expire_partitions
    from data_ingestion_lambda_spark.operators.dedup_gate import probe_batch

    docs = _docs(spark)
    idx = tmp_path / "gate_idx"
    _apply_days(spark, docs, idx, tmp_path / "m")
    # drop day 1 (keep days 2..N)
    assert expire_partitions(spark, str(idx), "2025-07-02") == ["2025-07-01"]
    last = docs.filter(_day_of(F.col("doc_id")) == _N_DAYS - 1)

    def pairs(df):
        return sorted(
            (min(r["new_doc"], r["dup_of"]), max(r["new_doc"], r["dup_of"]))
            for r in df.select("new_doc", "dup_of").collect()
        )

    got = pairs(probe_batch(spark, str(idx), last, exclude_date=f"2025-07-0{_N_DAYS}"))
    # reference: fresh index holding only the retained earlier days
    idx2 = tmp_path / "gate_idx_fresh"
    for day in range(1, _N_DAYS - 1):
        apply_batch(
            spark, str(idx2),
            docs.filter(_day_of(F.col("doc_id")) == day),
            f"2025-07-0{day + 1}",
        )
    want = pairs(probe_batch(spark, str(idx2), last))
    assert got == want


def test_gate_index_date_fold_preserves_probes_and_refuses_spent_dates(
    spark, tmp_path
):
    """compact_gate_index folds old date partitions into date=0000-00-00:
    a NEW batch's probe flags are identical before and after the fold
    (read_index reads all partitions; the merge is pure concatenation),
    the index row set is unchanged, landing a folded date refuses (its
    rows lost their partition identity, so neither the overwrite nor the
    own-partition exclusion could work), and re-folding is a no-op."""
    import os

    from data_ingestion_lambda_spark.operators.dedup_gate import compact_gate_index

    docs = _docs(spark)
    idx, matches = tmp_path / "idx", tmp_path / "matches"
    _apply_days(spark, docs, idx, matches)

    new_batch = docs.filter(_day_of(F.col("doc_id")) == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )

    def probe_rows():
        return sorted(
            (r["new_doc"], r["dup_of"], r["est_jaccard"], r["match_kind"])
            for r in probe_batch(spark, str(idx), new_batch).collect()
        )

    def index_rows():
        return sorted(
            (r["doc_id"], tuple(r["sig"]))
            for r in read_index(spark, str(idx)).collect()
        )

    before_probe, before_index = probe_rows(), index_rows()
    result = compact_gate_index(spark, str(idx), f"2025-07-0{_N_DAYS}")
    assert result["folded"][""] == _N_DAYS - 1
    dates = sorted(n for n in os.listdir(idx) if n.startswith("date="))
    assert dates == ["date=0000-00-00", f"date=2025-07-0{_N_DAYS}"]
    assert probe_rows() == before_probe
    assert index_rows() == before_index

    # folded dates are SPENT
    with pytest.raises(ValueError, match="horizon"):
        apply_batch(spark, str(idx), new_batch, "2025-07-01")
    # the unfolded newest date still replays idempotently
    last = docs.filter(_day_of(F.col("doc_id")) == _N_DAYS - 1)
    apply_batch(
        spark, str(idx), last, f"2025-07-0{_N_DAYS}", matches_dir=str(matches)
    )
    assert index_rows() == before_index
    # re-running the same fold is a no-op
    assert compact_gate_index(spark, str(idx), f"2025-07-0{_N_DAYS}")["folded"][""] == 0
    assert probe_rows() == before_probe
