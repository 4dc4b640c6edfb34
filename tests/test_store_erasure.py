"""GDPR/CCPA erasure PROPAGATED into the maintained stores (VERDICT r12
#1, operators/store_erasure.py). The discipline per test:

- **never-ingested equality**: store built from all batches then erased
  for subject S must READ equal to a store built from the same batches
  with S's rows filtered out up front (the strongest statement that no
  derivative of S survives);
- **fold interaction both ways**: erase-after-fold rewrites the base
  partition; fold-after-erase cannot resurrect (both directions pinned);
- **zero-residual + idempotence**: the verifier reports 0, a replayed
  request erases nothing and keeps the original tombstone;
- **rebuild-or-rotate** for the unlearnable sketches: the refusal names
  the remedy, and the Bloom rotation path is executed end-to-end.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.store_erasure import (
    STORE_SPECS,
    UNLEARNABLE,
    erase_store,
    verify_store_erasure,
)

D1, D2, D3 = "2025-05-01", "2025-05-02", "2025-05-03"


def _events(spark):
    """Three day-pure days, users 1-3; user 2 is the erasure subject."""
    rows = []
    eid = 0
    for di, day in enumerate((D1, D2, D3)):
        for u in (1, 2, 3):
            for j, ty in enumerate(("view", "click", "purchase")):
                eid += 1
                rows.append(
                    (u, eid, ty, float(u * 10 + j),
                     f"{day} {8 + u:02d}:{10 + j:02d}:00")
                )
    return spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _keys(spark, vals, col="user_id", typ="long"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} {typ}")


def _day(events, d):
    return events.filter(F.to_date("ts") == F.lit(d))


# ---------------------------------------------------------------------------
# user-keyed behavioral stores
# ---------------------------------------------------------------------------


def test_feature_store_erase_with_folds_both_ways(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.feature_store import (
        apply_feature_batch,
        compact_feature_ledger,
        read_user_features,
    )
    from data_ingestion_lambda_spark.operators.store_erasure import (
        erase_store,
    )

    ev = _events(spark)
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (D1, D2, D3):
        apply_feature_batch(spark, idx_a, _day(ev, d), d)
        apply_feature_batch(
            spark, idx_b, _day(ev, d).filter("user_id != 2"), d
        )
    # erase AFTER a fold: D1 is already inside the base partition
    compact_feature_ledger(spark, idx_a, D2)
    compact_feature_ledger(spark, idx_b, D2)

    keys = _keys(spark, [2])
    report = erase_store(spark, "feature-store", idx_a, keys, "req-1")
    assert report["rows_erased"] == 3  # one moment row per partition read
    assert verify_store_erasure(spark, "feature-store", idx_a, keys) == 0

    def _rows(d):
        return sorted(tuple(r) for r in read_user_features(spark, d).collect())

    assert _rows(idx_a) == _rows(idx_b)  # never-ingested equality

    # fold AFTER the erase: nothing resurrects, reads unchanged
    compact_feature_ledger(spark, idx_a, D3)
    compact_feature_ledger(spark, idx_b, D3)
    assert verify_store_erasure(spark, "feature-store", idx_a, keys) == 0
    assert _rows(idx_a) == _rows(idx_b)

    # replayed request: nothing to erase, original tombstone kept
    again = erase_store(spark, "feature-store", idx_a, keys, "req-1")
    assert again["rows_erased"] == 0
    tomb = spark.read.parquet(f"{idx_a}/_tombstones")
    assert tomb.filter("subject_key = '2'").count() == 1


def test_session_store_erase(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.session_store import (
        apply_session_batch,
        read_sessions,
    )

    ev = _events(spark)
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (D1, D2, D3):
        apply_session_batch(spark, idx_a, _day(ev, d), d)
        apply_session_batch(spark, idx_b, _day(ev, d).filter("user_id != 2"), d)
    keys = _keys(spark, [2])
    erase_store(spark, "session-store", idx_a, keys, "req-s")
    assert verify_store_erasure(spark, "session-store", idx_a, keys) == 0
    rows = lambda d: sorted(  # noqa: E731
        tuple(r) for r in read_sessions(spark, d).collect()
    )
    assert rows(idx_a) == rows(idx_b)


def test_touch_and_markov_store_erase(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.markov_store import (
        apply_markov_batch,
        compact_markov_store,
        read_transition_counts,
    )
    from data_ingestion_lambda_spark.operators.touch_store import (
        apply_touch_batch,
        read_touch_state,
    )

    ev = _events(spark)
    keys = _keys(spark, [2])
    t_a, t_b = str(tmp_path / "ta"), str(tmp_path / "tb")
    m_a, m_b = str(tmp_path / "ma"), str(tmp_path / "mb")
    for d in (D1, D2, D3):
        apply_touch_batch(spark, t_a, _day(ev, d), d)
        apply_touch_batch(spark, t_b, _day(ev, d).filter("user_id != 2"), d)
        apply_markov_batch(spark, m_a, _day(ev, d), d)
        apply_markov_batch(spark, m_b, _day(ev, d).filter("user_id != 2"), d)
    # markov: erase must rewrite the day-preserving BASE partition too
    compact_markov_store(spark, m_a, D2)
    compact_markov_store(spark, m_b, D2)

    erase_store(spark, "touch-store", t_a, keys, "req-t")
    erase_store(spark, "markov-store", m_a, keys, "req-m")
    assert verify_store_erasure(spark, "touch-store", t_a, keys) == 0
    assert verify_store_erasure(spark, "markov-store", m_a, keys) == 0
    rows = lambda fn, d: sorted(  # noqa: E731
        tuple(r) for r in fn(spark, d).collect()
    )
    assert rows(read_touch_state, t_a) == rows(read_touch_state, t_b)
    assert rows(read_transition_counts, m_a) == rows(read_transition_counts, m_b)


def test_attribution_store_erase(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.attribution_store import (
        apply_attribution_batch,
        read_attribution,
    )

    ev = _events(spark)
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (D1, D2, D3):
        apply_attribution_batch(spark, idx_a, _day(ev, d), d)
        apply_attribution_batch(
            spark, idx_b, _day(ev, d).filter("user_id != 2"), d
        )
    keys = _keys(spark, [2])
    report = erase_store(spark, "attribution-store", idx_a, keys, "req-a")
    # all three sub-tables were touched
    assert set(report["subs"]) == {"purchases", "last_clicks", "clicks"}
    assert all(s["rows_erased"] > 0 for s in report["subs"].values())
    assert verify_store_erasure(spark, "attribution-store", idx_a, keys) == 0
    rows = lambda d: sorted(  # noqa: E731
        tuple(r) for r in read_attribution(spark, d).collect()
    )
    assert rows(idx_a) == rows(idx_b)


def test_attribution_ledger_erase_after_fold(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.attribution_store import (
        compact_attribution_ledger,
        land_attribution_batch,
        read_attribution_stream,
    )

    ev = _events(spark)
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    for i, d in enumerate((D1, D2, D3)):
        key = f"b{i:09d}"
        land_attribution_batch(spark, idx_a, _day(ev, d), key)
        land_attribution_batch(
            spark, idx_b, _day(ev, d).filter("user_id != 2"), key
        )
    compact_attribution_ledger(spark, idx_a, "b000000002")
    compact_attribution_ledger(spark, idx_b, "b000000002")

    keys = _keys(spark, [2])
    report = erase_store(spark, "attribution-ledger", idx_a, keys, "req-l")
    assert report["rows_erased"] > 0
    assert verify_store_erasure(spark, "attribution-ledger", idx_a, keys) == 0
    # the folded base itself was rewritten (user 2 lived in b0/b1)
    assert "0000-base" in report["subs"]["stream_clicks"]["affected"]
    rows = lambda d: sorted(  # noqa: E731
        tuple(r) for r in read_attribution_stream(spark, d).collect()
    )
    assert rows(idx_a) == rows(idx_b)


def test_hh_store_erase_drops_item(spark, tmp_path):
    from data_ingestion_lambda_spark.operators.hh_store import (
        apply_hh_batch,
        read_heavy_hitters,
    )

    idx = str(tmp_path / "hh")
    items = spark.createDataFrame(
        [("hot",)] * 20 + [("warm",)] * 10 + [("cold",)] * 2, "item string"
    )
    for d in (D1, D2):
        apply_hh_batch(spark, idx, items, d)
    before = {r.item for r in read_heavy_hitters(spark, idx).collect()}
    assert "hot" in before
    erase_store(spark, "hh-store", idx, _keys(spark, ["hot"], "item", "string"),
                "req-h")
    assert verify_store_erasure(
        spark, "hh-store", idx, _keys(spark, ["hot"], "item", "string")
    ) == 0
    after = {r.item for r in read_heavy_hitters(spark, idx).collect()}
    assert "hot" not in after
    assert "warm" in after  # surviving items still reported


# ---------------------------------------------------------------------------
# doc-keyed text indexes + vec-keyed ANN
# ---------------------------------------------------------------------------


def _docs(spark, ids_texts):
    return spark.createDataFrame(list(ids_texts), "doc_id bigint, text string")


def test_postings_erase_equals_filtered_build(spark, tmp_path):
    """The strongest pin: erased index == index built from the filtered
    corpus, across ALL THREE sub-tables (postings, doclen, AND the
    derived per-partition stats scalars) and therefore in every BM25
    score — including the partition the fold already moved into the
    base."""
    from data_ingestion_lambda_spark.operators.postings import (
        compact_postings_index,
        read_stats,
        search_topk,
        update_postings,
    )

    corpus = {
        D1: [(0, "spark shuffles data"), (1, "secret private text"),
             (2, "spark joins tables")],
        D2: [(3, "data tables join"), (4, "private secret rows"),
             (5, "rows of data")],
    }
    erased = {1, 4}
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    for d, rows in corpus.items():
        update_postings(spark, idx_a, _docs(spark, rows), d)
        update_postings(
            spark, idx_b,
            _docs(spark, [r for r in rows if r[0] not in erased]), d,
        )
    compact_postings_index(spark, idx_a, D2)  # D1 -> base in both
    compact_postings_index(spark, idx_b, D2)

    keys = _keys(spark, sorted(erased), "doc_id")
    report = erase_store(spark, "search-index", idx_a, keys, "req-p")
    assert report["rows_erased"] > 0
    assert verify_store_erasure(spark, "search-index", idx_a, keys) == 0

    # N/T behave as if the erased docs were never ingested
    assert read_stats(spark, idx_a) == read_stats(spark, idx_b)
    def rows(d, sub):
        # by-name comparison: the rewrite may reorder data columns
        # inside the parquet files (reads are by-name, so harmless)
        df = spark.read.parquet(f"{d}/{sub}")
        return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())

    for sub in ("postings", "doclen", "stats"):
        assert rows(idx_a, sub) == rows(idx_b, sub), sub
    queries = _docs(spark, [(100, "secret data spark")]).withColumnRenamed(
        "doc_id", "query_id"
    )
    res = lambda d: sorted(  # noqa: E731
        tuple(r) for r in search_topk(spark, d, queries).collect()
    )
    assert res(idx_a) == res(idx_b)
    assert not any(r[1] in erased for r in res(idx_a))


def test_dedup_gate_erase(spark, tmp_path):
    """After erasing a doc's signatures, a NEW batch containing its
    exact duplicate is no longer flagged against it — the gate has
    genuinely forgotten the text."""
    from data_ingestion_lambda_spark.operators.dedup_gate import (
        apply_batch,
        probe_batch,
    )

    idx = str(tmp_path / "gate")
    apply_batch(
        spark, idx,
        _docs(spark, [(0, "alpha beta gamma"), (1, "secret private doc")]),
        D1, mode="exact",
    )
    dup = _docs(spark, [(10, "secret private doc")])
    assert probe_batch(spark, idx, dup, mode="exact").count() == 1

    keys = _keys(spark, [1], "doc_id")
    erase_store(spark, "dedup-gate", idx, keys, "req-g")
    assert verify_store_erasure(spark, "dedup-gate", idx, keys) == 0
    assert probe_batch(spark, idx, dup, mode="exact").count() == 0
    # unaffected doc still gates
    other = _docs(spark, [(11, "alpha beta gamma")])
    assert probe_batch(spark, idx, other, mode="exact").count() == 1


def test_ann_index_erase(spark, tmp_path):
    """Erased vectors leave the cells table entirely (residual 0, probes
    can never return them); surviving assignments are untouched — the
    erased index row-equals one built from the filtered corpus under the
    SAME frozen quantizer. The quantizer itself is an aggregate model
    parameter; policy-complete unlearning of it is retrain_index
    (module docstring boundary)."""
    from data_ingestion_lambda_spark.operators.ann_index import (
        append_batch,
        probe_topk,
        train_index,
    )

    vecs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    train_index(spark, idx_a, vecs)
    train_index(spark, idx_b, vecs)  # SAME corpus -> same quantizer
    erased = [17, 33, 48]
    for day, d in ((0, D1), (1, D2)):
        batch = vecs.filter(F.col("vec_id") % 2 == day)
        append_batch(spark, idx_a, batch, d)
        append_batch(
            spark, idx_b,
            batch.filter(~F.col("vec_id").isin(erased)), d,
        )
    keys = _keys(spark, erased, "vec_id")
    erase_store(spark, "ann-index", idx_a, keys, "req-v")
    assert verify_store_erasure(spark, "ann-index", idx_a, keys) == 0
    cells = lambda d: sorted(  # noqa: E731
        (r.vec_id, r.cell)
        for r in spark.read.parquet(f"{d}/cells").select("vec_id", "cell").collect()
    )
    assert cells(idx_a) == cells(idx_b)
    queries = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = lambda d: sorted(  # noqa: E731
        tuple(r) for r in probe_topk(spark, d, queries, n_probe=16).collect()
    )
    assert res(idx_a) == res(idx_b)
    assert not any(r[1] in erased for r in res(idx_a))


def test_bucketed_gate_erase_rotation(spark, tmp_path):
    """The bucketed catalog variant rotates: survivors rewritten with
    the identical (partitionBy date, bucketBy bkey) layout under a
    staging name, then swapped in the catalog — the one-exchange probe
    keeps working and the erased doc no longer matches."""
    from data_ingestion_lambda_spark.operators.dedup_gate import (
        apply_batch_bucketed,
        probe_batch_bucketed,
    )
    from data_ingestion_lambda_spark.operators.store_erasure import (
        erase_bucketed_gate,
    )

    table = "gate_erase_rotation_t13"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__erase_staging")
    apply_batch_bucketed(
        spark, table,
        _docs(spark, [(0, "alpha beta gamma delta"), (1, "secret private doc text")]),
        D1,
    )
    dup = _docs(spark, [(10, "secret private doc text")])
    assert probe_batch_bucketed(spark, table, dup).count() >= 1

    report = erase_bucketed_gate(spark, table, _keys(spark, [1], "doc_id"))
    assert report["rows_erased"] > 0
    assert spark.table(table).filter("doc_id = 1").count() == 0
    assert probe_batch_bucketed(spark, table, dup).count() == 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# unlearnable sketches: refusal + the documented rotation, end-to-end
# ---------------------------------------------------------------------------


def test_unlearnable_stores_refuse_with_remedy(spark, tmp_path):
    for store in sorted(UNLEARNABLE):
        with pytest.raises(ValueError, match="Rebuild-or-rotate"):
            erase_store(
                spark, store, str(tmp_path / store), _keys(spark, [1]), "req-x"
            )
    with pytest.raises(ValueError, match="unknown store"):
        erase_store(spark, "no-such", str(tmp_path), _keys(spark, [1]), "req-x")


def test_bloom_rotation_after_source_erase(spark, tmp_path):
    """The documented rebuild-or-rotate path for a sketch store, run
    end-to-end: erase the subject from the SOURCE member table, rotate
    (drop) the Bloom store, re-apply from the erased source — the
    rebuilt filter no longer answers membership for the erased text."""
    import shutil

    from data_ingestion_lambda_spark.operators.bloom_store import (
        apply_bloom_batch,
        screen_docs,
    )
    from data_ingestion_lambda_spark.operators.erasure import erase_keys

    members = {
        D1: [(0, "banned url one"), (1, "subject private text")],
        D2: [(2, "banned url two")],
    }
    src, bloom = str(tmp_path / "members"), str(tmp_path / "bloom")
    for d, rows in members.items():
        _docs(spark, rows).withColumn("date", F.lit(d)).write.mode(
            "append"
        ).partitionBy("date").parquet(src)
        apply_bloom_batch(spark, bloom, _docs(spark, rows), d)
    probe = _docs(spark, [(9, "subject private text"), (8, "banned url one")])
    hits = {r.doc_id: r.bloom_hit for r in screen_docs(spark, bloom, probe).collect()}
    assert hits == {9: True, 8: True}

    # (1) erase from the source, (2) rotate the store, (3) re-apply
    erase_keys(spark, src, _keys(spark, [1], "doc_id"), "req-b", key_col="doc_id")
    shutil.rmtree(bloom)
    for d in members:
        batch = spark.read.parquet(src).filter(F.col("date") == d).select(
            "doc_id", "text"
        )
        apply_bloom_batch(spark, bloom, batch, d)
    hits = {r.doc_id: r.bloom_hit for r in screen_docs(spark, bloom, probe).collect()}
    assert hits[8] is True  # surviving member still screened
    assert hits[9] is False  # erased member forgotten (no bit residue)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def test_cli_erase_store_end_to_end(spark, tmp_path, capsys):
    from data_ingestion_lambda_spark.cli import main
    from data_ingestion_lambda_spark.operators.feature_store import (
        apply_feature_batch,
    )

    ev = _events(spark)
    idx = str(tmp_path / "fs")
    for d in (D1, D2):
        apply_feature_batch(spark, idx, _day(ev, d), d)
    kp = str(tmp_path / "keys.parquet")
    _keys(spark, [2]).write.parquet(kp)

    rc = main(
        ["erase", "--store", "feature-store", "--target", idx,
         "--keys", kp, "--request-id", "req-cli"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["residual_rows"] == 0 and out["rows_erased"] == 2

    rc = main(
        ["erase", "--store", "feature-store", "--target", idx,
         "--keys", kp, "--verify-only"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["residual_rows"] == 0

    # sketch store: the CLI surfaces the rebuild-or-rotate remedy
    rc = main(
        ["erase", "--store", "bloom-store", "--target", str(tmp_path / "bl"),
         "--keys", kp, "--key-col", "user_id", "--request-id", "req-no"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "Rebuild-or-rotate" in out["message"]


def test_verify_refuses_unknown_and_unlearnable_stores(spark, tmp_path):
    """verify_store_erasure must refuse like erase_store (review r13):
    a sketch store cannot be row-audited (membership lives in shared
    bits), and a typo'd store name must not surface as a raw KeyError."""
    from data_ingestion_lambda_spark.operators.store_erasure import (
        verify_store_erasure,
    )

    keys = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError, match="(?i)rebuild-or-rotate"):
        verify_store_erasure(spark, "bloom-store", str(tmp_path), keys)
    with pytest.raises(ValueError, match="unknown store"):
        verify_store_erasure(spark, "no-such-store", str(tmp_path), keys)


def test_cli_erase_unknown_store_is_a_400(spark, tmp_path, capsys):
    """The CLI surfaces the refusal as a 400 JSON response BEFORE touching
    the keys parquet — the old user_id fallback died on a doc-keyed keys
    file with a raw AnalysisException."""
    import json

    from data_ingestion_lambda_spark.cli import main

    keys_pq = str(tmp_path / "keys.parquet")
    spark.createDataFrame([(7,)], "doc_id long").write.parquet(keys_pq)
    rc = main([
        "erase", "--store", "bloom-store", "--target", str(tmp_path / "s"),
        "--keys", keys_pq, "--verify-only",
    ])
    assert rc == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statusCode"] == 400
    assert "rebuild-or-rotate" in report["message"] or "Rebuild" in report["message"]
