"""Maintained DSIR model store: N daily stat batches + read-side sum
must equal the one-shot stats (bucket-wise additivity), scoring under
the folded model must equal the one-shot lane EXACTLY, and replays must
be no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.dsir_store import (
    apply_dsir_batch,
    read_dsir_stats,
    score_docs,
)
from data_ingestion_lambda_spark.plans.llm_ops import dsir_features, dsir_stats
from data_ingestion_lambda_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
_N_DAYS = 3


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "lang", "text")


def _stat_rows(df):
    return sorted((r.bucket, r.cnt_s, r.cnt_t) for r in df.collect())


def _apply_split(spark, idx, docs):
    for day in range(_N_DAYS):
        batch = docs.filter(F.col("doc_id") % _N_DAYS == day)
        apply_dsir_batch(spark, idx, batch, f"2025-07-0{day + 1}")


def test_daily_stats_fold_to_oneshot(spark, tmp_path):
    idx = str(tmp_path / "dsir_idx")
    docs = _docs(spark)
    _apply_split(spark, idx, docs)
    oneshot = dsir_stats(
        dsir_features(
            docs.select("doc_id", (F.col("lang") == "en").alias("is_t"), "text")
        )
    )
    assert _stat_rows(read_dsir_stats(spark, idx)) == _stat_rows(oneshot)


def test_scores_under_folded_model_match_lane_and_replay_noop(spark, tmp_path):
    from data_ingestion_lambda_spark.plans.registry import REGISTRY

    idx = str(tmp_path / "dsir_idx")
    docs = _docs(spark)
    _apply_split(spark, idx, docs)
    got = {
        r.doc_id: (r.n_feats, r.logw_bits, r.avg_bits_per_feat)
        for r in score_docs(spark, idx, docs).collect()
    }
    lane = REGISTRY["text_dsir_weights"].builder(spark, SF)
    want = {
        r.doc_id: (r.n_feats, r.logw_bits, r.avg_bits_per_feat)
        for r in lane.collect()
    }
    assert got == want, "folded-model scores must equal the one-shot lane"

    before = _stat_rows(read_dsir_stats(spark, idx))
    apply_dsir_batch(  # replay day 2 with the same batch
        spark, idx, docs.filter(F.col("doc_id") % _N_DAYS == 1), "2025-07-02"
    )
    assert _stat_rows(read_dsir_stats(spark, idx)) == before


def test_target_marker_refuses_mixed_targets(spark, tmp_path):
    """cnt_t counted against different targets sums into a meaningless
    mixture — the _target= marker (the vocab _order idiom) refuses it."""
    import pytest

    idx = str(tmp_path / "dsir_idx")
    docs = _docs(spark)
    apply_dsir_batch(spark, idx, docs, "2025-07-01", target_lang="en")
    with pytest.raises(ValueError, match="one.*directory, one target"):
        apply_dsir_batch(spark, idx, docs, "2025-07-02", target_lang="de")
    # same target still lands
    apply_dsir_batch(spark, idx, docs, "2025-07-02", target_lang="en")


def test_scoring_unseen_buckets_uses_smoothing_not_drop(spark, tmp_path):
    """Review r9: a NEW batch hashes into buckets the ledger never saw;
    those features must score through the add-1 smoothing, not silently
    drop out of the inner join. Pin: every scored doc keeps its FULL
    feature count, even when the ledger was built from a third of the
    corpus."""
    idx = str(tmp_path / "dsir_idx")
    docs = _docs(spark)
    apply_dsir_batch(  # a deliberately partial ledger
        spark, idx, docs.filter(F.col("doc_id") % 3 == 0), "2025-07-01"
    )
    scored = {r.doc_id: r.n_feats for r in score_docs(spark, idx, docs).collect()}
    want = {
        r.doc_id: r.n
        for r in dsir_features(
            docs.select("doc_id", (F.col("lang") == "en").alias("is_t"), "text")
        )
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n"))
        .collect()
    }
    assert scored == want, "unseen-bucket features were dropped"
