"""Maintained Bloom-filter store: N daily word batches + read-side
bit_or must equal the one-shot filter EXACTLY (bit_or associativity/
idempotence), members screened through the store must never miss (no
false negatives), replays must be no-ops at the bit level, and the
store's verdicts must match the one-shot lane's."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.bloom_store import (
    apply_bloom_batch,
    read_bloom,
    screen_docs,
)
from data_ingestion_lambda_spark.plans.llm_ops import bloom_words, polyhash
from data_ingestion_lambda_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
_N_DAYS = 3


def _members(spark):
    return load_table(spark, SF, "documents").filter(F.col("source") == "src0")


def _words_rows(df):
    return sorted((r.word_idx, r.word) for r in df.collect())


def test_daily_batches_fold_to_oneshot_filter(spark, tmp_path):
    idx = str(tmp_path / "bloom_idx")
    members = _members(spark)
    for day in range(_N_DAYS):
        batch = members.filter(F.col("doc_id") % _N_DAYS == day)
        apply_bloom_batch(spark, idx, batch, f"2025-07-0{day + 1}")
    oneshot = bloom_words(
        members.select(polyhash(F.col("text")).alias("fp")).distinct()
    )
    assert _words_rows(read_bloom(spark, idx)) == _words_rows(oneshot)


def test_no_false_negatives_and_replay_idempotent(spark, tmp_path):
    idx = str(tmp_path / "bloom_idx")
    members = _members(spark)
    for day in range(_N_DAYS):
        batch = members.filter(F.col("doc_id") % _N_DAYS == day)
        apply_bloom_batch(spark, idx, batch, f"2025-07-0{day + 1}")
    verdicts = screen_docs(spark, idx, members.select("doc_id", "text"))
    assert verdicts.filter(~F.col("bloom_hit")).count() == 0, "member missed"

    before = _words_rows(read_bloom(spark, idx))
    apply_bloom_batch(  # replay day 2 with the same batch
        spark, idx, members.filter(F.col("doc_id") % _N_DAYS == 1), "2025-07-02"
    )
    assert _words_rows(read_bloom(spark, idx)) == before, "replay must be a no-op"


def test_store_verdicts_match_lane(spark, tmp_path):
    """screen_docs over a day-split src0 ledger == the one-shot lane's
    bloom_hit column (the store builds from the lane's own helpers, and
    the fold is exact, so any divergence is a landing bug)."""
    from data_ingestion_lambda_spark.plans.registry import REGISTRY

    idx = str(tmp_path / "bloom_idx")
    members = _members(spark)
    for day in range(_N_DAYS):
        batch = members.filter(F.col("doc_id") % _N_DAYS == day)
        apply_bloom_batch(spark, idx, batch, f"2025-07-0{day + 1}")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    got = {r.doc_id: r.bloom_hit for r in screen_docs(spark, idx, docs).collect()}
    lane = REGISTRY["dedup_bloom_screen"].builder(spark, SF)
    want = {r.doc_id: r.bloom_hit for r in lane.collect()}
    assert got == want


def test_sized_store_folds_screens_and_refuses_mismatch(spark, tmp_path):
    """VERDICT r9 #2: (m, k) are real parameters. A store built at a
    production sizing must (a) fold day batches to the one-shot sized
    filter exactly, (b) screen through the recorded sizing with no
    false negatives, and (c) REFUSE an apply at any other sizing —
    bit_or across mismatched m silently corrupts."""
    import pytest

    from data_ingestion_lambda_spark.operators.bloom_store import read_sizing

    idx = str(tmp_path / "bloom_idx")
    members = _members(spark)
    m, k = 65536, 5
    for day in range(_N_DAYS):
        batch = members.filter(F.col("doc_id") % _N_DAYS == day)
        apply_bloom_batch(spark, idx, batch, f"2025-07-0{day + 1}", m=m, k=k)
    assert read_sizing(spark, idx) == (m, k)
    oneshot = bloom_words(
        members.select(polyhash(F.col("text")).alias("fp")).distinct(), m, k
    )
    assert _words_rows(read_bloom(spark, idx)) == _words_rows(oneshot)
    verdicts = screen_docs(spark, idx, members.select("doc_id", "text"))
    assert verdicts.filter(~F.col("bloom_hit")).count() == 0, "member missed"
    with pytest.raises(ValueError, match="sized"):
        apply_bloom_batch(spark, idx, members, "2025-07-09")  # default sizing
    with pytest.raises(ValueError, match="multiple of 32"):
        apply_bloom_batch(spark, idx, members, "2025-07-09", m=1000, k=k)
    with pytest.raises(ValueError, match="out of range"):
        apply_bloom_batch(spark, idx, members, "2025-07-09", m=m, k=99)


def test_corrected_empty_batch_overwrites_partition(spark, tmp_path):
    """ADVICE r9: re-applying a corrected batch that now produces ZERO
    rows must REPLACE (delete) the old partition, not silently keep the
    stale words — replace_partitions now deletes a listed date whose
    staged content is empty, so the store's fold forgets the retracted
    members."""
    idx = str(tmp_path / "bloom_idx")
    members = _members(spark)
    day1 = members.filter(F.col("doc_id") % 2 == 0)
    day2 = members.filter(F.col("doc_id") % 2 == 1)
    apply_bloom_batch(spark, idx, day1, "2025-07-01")
    apply_bloom_batch(spark, idx, day2, "2025-07-02")
    # corrected re-delivery of day 2: nothing belongs in it after all
    apply_bloom_batch(spark, idx, day2.limit(0), "2025-07-02")
    oneshot_day1 = bloom_words(
        day1.select(polyhash(F.col("text")).alias("fp")).distinct()
    )
    assert _words_rows(read_bloom(spark, idx)) == _words_rows(oneshot_day1), (
        "empty corrected batch must overwrite the stale day partition"
    )


def test_legacy_markerless_store_refuses_resize(spark, tmp_path):
    """Review r10: a store written before the sizing marker existed is
    implicitly (4096, 3) — read_sizing says so. Stamping a DIFFERENT
    sizing's marker onto its existing data would land mixed-m words
    (the corruption the marker forbids), so a non-default apply must
    refuse; a default-sized apply adopts the marker and proceeds."""
    import shutil

    import pytest

    from data_ingestion_lambda_spark.operators.bloom_store import read_sizing

    idx = str(tmp_path / "bloom_idx")
    members = _members(spark)
    apply_bloom_batch(spark, idx, members, "2025-07-01")
    shutil.rmtree(f"{idx}/_sizing=m4096-k3")  # simulate a pre-r10 store
    with pytest.raises(ValueError, match="predates the sizing marker"):
        apply_bloom_batch(spark, idx, members, "2025-07-02", m=65536, k=5)
    assert read_sizing(spark, idx) == (4096, 3)
    before = _words_rows(read_bloom(spark, idx))
    apply_bloom_batch(spark, idx, members, "2025-07-02")  # default adopts
    assert read_sizing(spark, idx) == (4096, 3)
    assert _words_rows(read_bloom(spark, idx)) == before  # same members
