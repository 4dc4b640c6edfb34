"""Pins for the maintained corpus unigram model (operators/vocab.py):

- **N-day == one-shot**: updating the model with daily batches yields,
  after day N, EXACTLY the full-corpus vocabulary (integer counts —
  addition is associative/commutative across the batch partitions).
- **Maintained pipeline == registered operator**: scoring the corpus
  against a model built from exactly that corpus row-equals the
  registered ``text_unigram_surprisal`` query — the pipeline provably
  yields the one-shot operator's numbers.
- **Idempotent replay**: re-updating the same (batch, date) leaves the
  model unchanged (the batch owns its partition).
- **Unseen-token convention**: a token the model lacks scores the model's
  maximum expressible surprisal, ``length(bin(N))`` bits.
- **CLI**: the ``vocab`` subcommand scores-then-extends and reports the
  handler-shaped JSON line.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.vocab import (
    _batch_counts,
    read_vocab,
    score_batch,
    update_vocab,
)
from data_ingestion_lambda_spark.plans import all_specs
from tests.conftest import SF_SMOKE

_N_DAYS = 3


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")


def _update_days(spark, docs, vocab_dir):
    for day in range(_N_DAYS):
        batch = docs.filter(F.col("doc_id") % _N_DAYS == day)
        update_vocab(spark, str(vocab_dir), batch, f"2025-07-0{day + 1}")


def _rows(df, key):
    return sorted(map(tuple, df.collect()), key=lambda r: r[: len(key)])


def test_incremental_vocab_equals_one_shot(spark, tmp_path):
    docs = _docs(spark)
    vocab_dir = tmp_path / "vocab"
    _update_days(spark, docs, vocab_dir)
    maintained = _rows(read_vocab(spark, str(vocab_dir)), ("tok",))
    one_shot = _rows(_batch_counts(docs), ("tok",))
    assert maintained == one_shot


def test_score_equals_registered_operator(spark, tmp_path):
    docs = _docs(spark)
    vocab_dir = tmp_path / "vocab"
    _update_days(spark, docs, vocab_dir)
    scored = _rows(score_batch(spark, str(vocab_dir), docs), ("doc_id",))
    registered = _rows(
        all_specs()["text_unigram_surprisal"].builder(spark, SF_SMOKE),
        ("doc_id",),
    )
    assert scored == registered


def test_replayed_update_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    vocab_dir = tmp_path / "vocab"
    _update_days(spark, docs, vocab_dir)
    before = _rows(read_vocab(spark, str(vocab_dir)), ("tok",))
    # replay the last day — the at-least-once failure mode
    last = docs.filter(F.col("doc_id") % _N_DAYS == _N_DAYS - 1)
    update_vocab(spark, str(vocab_dir), last, f"2025-07-0{_N_DAYS}")
    assert _rows(read_vocab(spark, str(vocab_dir)), ("tok",)) == before


def test_unseen_token_takes_max_surprisal(spark, tmp_path):
    docs = _docs(spark)
    vocab_dir = tmp_path / "vocab"
    _update_days(spark, docs, vocab_dir)
    n_tot = read_vocab(spark, str(vocab_dir)).agg(F.sum("cnt")).collect()[0][0]
    novel = spark.createDataFrame(
        [(999_000_001, "zzqxjvk zzqxjvk zzqxjvk")], ["doc_id", "text"]
    )
    (row,) = score_batch(spark, str(vocab_dir), novel).collect()
    assert row["n_tokens"] == 3
    assert row["bits_sum"] == 3 * (len(bin(int(n_tot))) - 2)


def test_cli_vocab_roundtrip(spark, tmp_path, capsys):
    from data_ingestion_lambda_spark.cli import main

    docs = _docs(spark)
    vocab_dir = tmp_path / "vocab"
    day1 = tmp_path / "day1.parquet"
    day2 = tmp_path / "day2.parquet"
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(str(day1))
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(str(day2))

    # first batch: nothing to score against yet, model gets extended
    assert (
        main(
            ["vocab", "--batch", str(day1), "--vocab", str(vocab_dir), "--date", "2025-07-01"]
        )
        == 0
    )
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["scored_docs"] is None and r1["date"] == "2025-07-01"

    # second batch: scored against day 1's model, then appended
    score_out = tmp_path / "scores.parquet"
    assert (
        main(
            [
                "vocab",
                "--batch",
                str(day2),
                "--vocab",
                str(vocab_dir),
                "--date",
                "2025-07-02",
                "--score-out",
                str(score_out),
            ]
        )
        == 0
    )
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_day2 = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert r2["scored_docs"] == n_day2
    persisted = spark.read.parquet(str(score_out))
    assert persisted.count() == n_day2
    assert set(persisted.columns) == {
        "doc_id",
        "n_tokens",
        "bits_sum",
        "avg_bits_per_token",
    }
    # after both updates the model equals the one-shot corpus vocabulary
    maintained = _rows(read_vocab(spark, str(vocab_dir)), ("tok",))
    assert maintained == _rows(_batch_counts(docs), ("tok",))


def test_bigram_model_equals_registered_lane_and_refuses_order_mixup(spark, tmp_path):
    """order=2 (r8): N daily bigram updates + scoring the same corpus
    against the persisted model must row-equal text_bigram_surprisal
    (model == scored corpus => every bigram present at full count), and
    order-mismatched access to the directory must refuse."""
    import pytest

    docs = _docs(spark)
    vocab_dir = str(tmp_path / "bivocab")
    for day in range(_N_DAYS):
        batch = docs.filter(F.col("doc_id") % _N_DAYS == day)
        update_vocab(spark, vocab_dir, batch, f"2025-07-0{day + 1}", order=2)
    got = _rows(
        score_batch(spark, vocab_dir, docs, order=2).select(
            "doc_id",
            F.col("n_tokens").alias("n_bigrams"),
            "bits_sum",
            F.col("avg_bits_per_token").alias("avg_bits_per_bigram"),
        ),
        ("doc_id",),
    )
    want = _rows(
        all_specs()["text_bigram_surprisal"].builder(spark, SF_SMOKE), ("doc_id",)
    )
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="order-2 model"):
        update_vocab(spark, vocab_dir, docs, "2025-07-09", order=1)
    with pytest.raises(ValueError, match="order-2 model"):
        score_batch(spark, vocab_dir, docs, order=1)
    # legacy marker-less unigram dir refuses bigram access too
    uni_dir = str(tmp_path / "univocab")
    update_vocab(spark, uni_dir, docs, "2025-07-01")
    with pytest.raises(ValueError, match="order-1 model"):
        score_batch(spark, uni_dir, docs, order=2)


def test_cli_surfaces_order_mismatch_and_streams_order(spark, tmp_path, capsys):
    """Review r8: --score-only against a mismatched-order model must FAIL
    loudly (the bare except used to swallow the refusal as 'no model
    yet'), and --stream-source must forward --order."""
    import json

    import pytest

    from data_ingestion_lambda_spark.cli import main
    from data_ingestion_lambda_spark.operators.vocab import _batch_counts

    docs = _docs(spark)
    bdir = str(tmp_path / "docs")
    docs.write.parquet(bdir)
    vdir = str(tmp_path / "vocab")
    assert main(["vocab", "--vocab", vdir, "--batch", bdir, "--date", "2025-07-01"]) == 0
    capsys.readouterr()
    with pytest.raises(ValueError, match="order-1 model"):
        main(["vocab", "--vocab", vdir, "--batch", bdir, "--score-only", "--order", "2"])
    # streamed bigram model: --order reaches the per-batch update
    v2 = str(tmp_path / "bivocab")
    rc = main(
        ["vocab", "--vocab", v2, "--stream-source", bdir,
         "--checkpoint", str(tmp_path / "ck"), "--order", "2"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(b["order"] == 2 for b in rep["batches"])
    got = sorted(map(tuple, read_vocab(spark, v2).collect()))
    assert got == sorted(map(tuple, _batch_counts(docs, order=2).collect()))
