"""Maintained IVF-ANN index (operators/ann_index.py) — the equivalence
discipline: quantizer trained on the full corpus + N daily appends +
probe must reproduce the one-shot ``ann_ivf_topk`` EXACTLY (values
included: same argmax order, same unrolled-dot arithmetic), appends
must be replay-idempotent, and the probe's cells scan must
partition-prune to the probed cells — the layout-as-inverted-file
claim, pinned on the executed plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.ann_index import (
    _assign,
    _with_norm,
    append_batch,
    probe_topk,
    read_centroids,
    train_index,
)
from data_ingestion_lambda_spark.plans.similarity import N_QUERIES, ann_ivf_topk

SF = "/root/testdata/sf0.001"
_N_DAYS = 3


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


def _build(spark, tmp_path):
    idx = str(tmp_path / "ann_idx")
    vecs = _vectors(spark)
    train_index(spark, idx, vecs)
    for day in range(_N_DAYS):
        batch = vecs.filter(F.col("vec_id") % _N_DAYS == day)
        append_batch(spark, idx, batch, f"2025-07-0{day + 1}")
    return idx, vecs


def _queries(vecs):
    return vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cell"], r["cosine"])
        for r in df.collect()
    )


def test_maintained_probe_equals_one_shot(spark, tmp_path):
    """Full-corpus quantizer + 3 daily appends + probe == ann_ivf_topk,
    down to the cosine doubles (same expressions over the same parquet
    doubles — parquet round-trips them exactly)."""
    idx, vecs = _build(spark, tmp_path)
    assert _rows(probe_topk(spark, idx, _queries(vecs))) == _rows(
        ann_ivf_topk(spark, SF)
    )


def test_index_rows_equal_one_shot_assignment(spark, tmp_path):
    """The stored inverted file after N appends row-equals assigning the
    whole corpus in one pass — cell assignment is a per-vector argmax
    against the frozen centroids, so the batch split cannot matter."""
    idx, vecs = _build(spark, tmp_path)
    stored = sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(f"{idx}/cells").select("vec_id", "cell").collect()
    )
    oneshot = sorted(
        (r["vec_id"], r["cell"])
        for r in _assign(_with_norm(vecs), read_centroids(spark, idx))
        .select("vec_id", "cell")
        .collect()
    )
    assert stored == oneshot


def test_append_replay_is_idempotent(spark, tmp_path):
    idx, vecs = _build(spark, tmp_path)

    def state():
        return sorted(
            (r["vec_id"], r["cell"], r["date"])
            for r in spark.read.parquet(f"{idx}/cells")
            .select("vec_id", "cell", "date")
            .collect()
        )

    before = state()
    last = vecs.filter(F.col("vec_id") % _N_DAYS == _N_DAYS - 1)
    append_batch(spark, idx, last, f"2025-07-0{_N_DAYS}")
    assert state() == before


def test_cli_ann_index_roundtrip(spark, tmp_path, capsys):
    """train + append + query through the CLI, one invocation each; the
    CLI result parquet row-equals the registered one-shot operator."""
    import json

    from data_ingestion_lambda_spark.cli import main

    vecs = _vectors(spark)
    train_pq = tmp_path / "all.parquet"
    vecs.write.parquet(str(train_pq))
    day_pqs = []
    for day in range(_N_DAYS):
        p = tmp_path / f"day{day}.parquet"
        vecs.filter(F.col("vec_id") % _N_DAYS == day).write.parquet(str(p))
        day_pqs.append(p)
    q_pq = tmp_path / "queries.parquet"
    vecs.filter(F.col("vec_id") < N_QUERIES).write.parquet(str(q_pq))
    idx = tmp_path / "idx"

    assert main(["ann-index", "--index", str(idx), "--train", str(train_pq)]) == 0
    for day, p in enumerate(day_pqs):
        assert (
            main(
                [
                    "ann-index",
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
                "ann-index",
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
    assert _rows(spark.read.parquet(str(out))) == _rows(ann_ivf_topk(spark, SF))


def test_probe_scan_partition_prunes_to_probed_cells(spark, tmp_path):
    """The point of the date/cell layout: the executed plan's cells scan
    carries a PartitionFilters IN-list on cell — the probe reads the
    probed cells' directories only, not the corpus."""
    idx, vecs = _build(spark, tmp_path)
    plan = (
        probe_topk(spark, idx, _queries(vecs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"PartitionFilters: \[cell#\d+ INSET ", plan), plan


def test_maintained_hard_negatives_equal_registered_lane(spark, tmp_path):
    """probe_hard_negatives over the maintained index row-equals the
    registered ann_hard_negatives_ivf lane (same frozen quantizer, same
    probe, same ceiling arithmetic) — and its cells scan still
    partition-prunes, so mining stays n_probe/n_cells of the index."""
    from data_ingestion_lambda_spark.operators.ann_index import probe_hard_negatives
    from data_ingestion_lambda_spark.plans.similarity import ann_hard_negatives_ivf

    idx, vecs = _build(spark, tmp_path)
    mined = probe_hard_negatives(spark, idx, _queries(vecs))

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
            for r in df.select("query_id", "rank", "neighbor_id", "cosine").collect()
        )

    assert rows(mined) == rows(ann_hard_negatives_ivf(spark, SF))
    plan = mined._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cell#\d+ INSET ", plan), plan


def test_cli_hard_negatives(spark, tmp_path, capsys):
    """ann-index --hard-negatives mines through the maintained index and
    row-equals the registered lane."""
    import json

    from data_ingestion_lambda_spark.cli import main
    from data_ingestion_lambda_spark.plans.similarity import ann_hard_negatives_ivf

    vecs = _vectors(spark)
    train_pq = tmp_path / "all.parquet"
    vecs.write.parquet(str(train_pq))
    q_pq = tmp_path / "queries.parquet"
    vecs.filter(F.col("vec_id") < N_QUERIES).write.parquet(str(q_pq))
    idx = tmp_path / "idx"
    assert main(["ann-index", "--index", str(idx), "--train", str(train_pq)]) == 0
    assert (
        main(
            [
                "ann-index", "--index", str(idx),
                "--batch", str(train_pq), "--date", "2025-07-01",
            ]
        )
        == 0
    )
    out = tmp_path / "hardneg.parquet"
    assert (
        main(
            [
                "ann-index", "--index", str(idx),
                "--query", str(q_pq), "--hard-negatives", "--out", str(out),
            ]
        )
        == 0
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statusCode"] == 200 and report["result_rows"] > 0

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
            for r in df.select("query_id", "rank", "neighbor_id", "cosine").collect()
        )

    assert rows(spark.read.parquet(str(out))) == rows(
        ann_hard_negatives_ivf(spark, SF)
    )


# --- sized quantizer + retrain migration (r11) ------------------------------


def test_sized_index_probe_equals_sized_lane(spark, tmp_path):
    """A 32-cell index (the sizing knob as a real parameter) probes
    row-equal to the registered ann_ivf_topk_c32 lane — the Bloom (m,k)
    template applied to the quantizer."""
    from data_ingestion_lambda_spark.plans.similarity import ann_ivf_topk_c32

    idx = str(tmp_path / "idx32")
    vecs = _vectors(spark)
    report = train_index(spark, idx, vecs, n_cells=32)
    assert report["n_cells"] == 32
    append_batch(spark, idx, vecs, "2025-07-01")
    assert _rows(probe_topk(spark, idx, _queries(vecs))) == _rows(
        ann_ivf_topk_c32(spark, SF)
    )


def test_sizing_marker_refusals(spark, tmp_path):
    import pytest

    from data_ingestion_lambda_spark.operators.ann_index import read_sizing

    idx = str(tmp_path / "idx")
    vecs = _vectors(spark)
    train_index(spark, idx, vecs)  # default 16, marker recorded
    assert read_sizing(spark, idx) == 16
    # one directory, one sizing: retraining at another size refuses
    with pytest.raises(ValueError, match="one directory, one quantizer"):
        train_index(spark, idx, vecs, n_cells=32)
    # probing more cells than the index HAS refuses; probing exactly
    # every cell is a permitted (wasteful) full scan
    append_batch(spark, idx, vecs, "2025-07-01")
    with pytest.raises(ValueError, match="exceeds the index's"):
        probe_topk(spark, idx, _queries(vecs), n_probe=17)
    full = probe_topk(spark, idx, _queries(vecs), n_probe=16)
    assert full.count() > 0


def test_train_refuses_sparse_vec_ids(spark, tmp_path):
    """The quantizer seeds from vec_id < n_cells (oracle-reproducible),
    so a corpus with sparse or non-zero-based ids must refuse to train
    instead of silently producing fewer centroids than the marker
    records (ADVICE r11: retrain over an old index whose stored ids
    don't cover [0, n_cells) would otherwise build a degenerate
    quantizer)."""
    import pytest

    import os

    idx = str(tmp_path / "idx")
    shifted = _vectors(spark).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    with pytest.raises(ValueError, match="vec_id < 16"):
        train_index(spark, idx, shifted)
    # ADVICE r12: the refusal must run BEFORE any on-disk mutation — a
    # poisoned _sizing marker would block the very retry the message
    # recommends via the one-directory-one-sizing refusal.
    assert not os.path.exists(idx) or not any(
        n.startswith(("_sizing=", "centroids")) for n in os.listdir(idx)
    )
    # and the corrected retrain into the SAME directory succeeds
    report = train_index(spark, idx, _vectors(spark))
    assert report["centroids"] == 16


def test_probe_refuses_marker_centroid_mismatch(spark, tmp_path):
    """The probe guard reads the ACTUAL centroid count, not just the
    _sizing marker: an index whose centroids table lost rows (partial
    write / tamper) refuses instead of probing a wrong cell count."""
    import pytest

    idx, vecs = _build(spark, tmp_path)
    kept = read_centroids(spark, idx).limit(8).collect()
    spark.createDataFrame(
        kept, read_centroids(spark, idx).schema
    ).write.mode("overwrite").parquet(f"{idx}/centroids")
    with pytest.raises(ValueError, match="centroids table holds 8"):
        probe_topk(spark, idx, _queries(vecs))


def test_retrain_migration_blue_green(spark, tmp_path):
    """retrain_index grows the quantizer into a NEW dir: old index
    untouched and still serving, new index re-assigned under the new
    quantizer, report carries side-by-side recall@k for the cutover
    decision."""
    import pytest

    from data_ingestion_lambda_spark.operators.ann_index import (
        read_sizing,
        retrain_index,
    )
    from data_ingestion_lambda_spark.plans.similarity import ann_ivf_topk_c32

    old, vecs = _build(spark, tmp_path)
    before = _rows(probe_topk(spark, old, _queries(vecs)))
    new = str(tmp_path / "idx32")
    with pytest.raises(ValueError, match="blue/green"):
        retrain_index(spark, old, old, 32, "2025-08-01")
    report = retrain_index(spark, old, new, 32, "2025-08-01")
    assert report["n_cells_old"] == 16 and report["n_cells_new"] == 32
    assert 0.0 <= report["recall_new"] <= 1.0
    assert 0.0 <= report["recall_old"] <= 1.0
    # old index unchanged; new index serves the 32-cell lane's rows
    assert _rows(probe_topk(spark, old, _queries(vecs))) == before
    assert read_sizing(spark, new) == 32
    assert _rows(probe_topk(spark, new, _queries(vecs))) == _rows(
        ann_ivf_topk_c32(spark, SF)
    )


def test_cells_date_fold_preserves_probe_and_refuses_spent_dates(spark, tmp_path):
    """compact_index_cells folds old date partitions into the cell-
    partitioned base: probe rows are bit-identical before and after, the
    cell= pruning layout survives (base is date=0000-00-00/cell=<c>),
    re-landing a folded date refuses (spent key), and a post-fold append
    under a NEW date still row-equals the one-shot lane."""
    import os

    import pytest

    from data_ingestion_lambda_spark.operators.ann_index import compact_index_cells

    idx, vecs = _build(spark, tmp_path)
    before = _rows(probe_topk(spark, idx, _queries(vecs)))

    # fold days 1..2 (strictly below day 3) into the base
    result = compact_index_cells(spark, idx, f"2025-07-0{_N_DAYS}")
    assert result["folded"]["cells"] == _N_DAYS - 1
    base = f"{idx}/cells/date=0000-00-00"
    assert os.path.isdir(base)
    assert any(n.startswith("cell=") for n in os.listdir(base))
    dates = [n for n in os.listdir(f"{idx}/cells") if n.startswith("date=")]
    assert sorted(dates) == ["date=0000-00-00", f"date=2025-07-0{_N_DAYS}"]
    assert _rows(probe_topk(spark, idx, _queries(vecs))) == before

    # folded dates are SPENT: re-landing one would double-count
    with pytest.raises(ValueError, match="horizon"):
        append_batch(spark, idx, vecs.limit(1), "2025-07-01")

    # the unfolded newest date still replays idempotently
    last = vecs.filter(F.col("vec_id") % _N_DAYS == _N_DAYS - 1)
    append_batch(spark, idx, last, f"2025-07-0{_N_DAYS}")
    assert _rows(probe_topk(spark, idx, _queries(vecs))) == before

    # re-running the same fold is a no-op (base-only fold set skips)
    result2 = compact_index_cells(spark, idx, f"2025-07-0{_N_DAYS}")
    assert result2["folded"]["cells"] == 0
    assert _rows(probe_topk(spark, idx, _queries(vecs))) == before


def test_folded_index_probe_still_partition_prunes(spark, tmp_path):
    """The fold's load-bearing property at the PLAN level: after
    compact_index_cells re-partitions the base BY CELL, the probe's
    cells scan still carries the PartitionFilters IN-list on cell — the
    folded base is read cell-by-cell exactly like live date partitions,
    never as one undifferentiated blob."""
    from data_ingestion_lambda_spark.operators.ann_index import compact_index_cells

    idx, vecs = _build(spark, tmp_path)
    compact_index_cells(spark, idx, f"2025-07-0{_N_DAYS}")
    plan = (
        probe_topk(spark, idx, _queries(vecs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"PartitionFilters: \[cell#\d+ INSET ", plan), plan


def test_train_refuses_in_place_retrain_over_live_cells(spark, tmp_path):
    """Retraining a directory that already holds cell assignments must
    refuse: new centroids would orphan every stored (vec_id, cell) row
    while the sizing marker still matched, so probes would silently
    return wrong neighbors (review r13)."""
    import pytest

    idx, vecs = _build(spark, tmp_path)
    with pytest.raises(ValueError, match="already holds cell assignments"):
        train_index(spark, idx, vecs)


def test_cli_standalone_compaction_invocation(spark, tmp_path, capsys):
    """A maintenance-only invocation (no train/batch/query) must be
    accepted: --compact-keep-from / --auto-compact-max-dirs are
    operations in their own right (review r13 — the need-an-operation
    guard rejected them)."""
    import json

    from data_ingestion_lambda_spark.cli import main

    idx, vecs = _build(spark, tmp_path)
    assert main(
        ["ann-index", "--index", idx, "--compact-keep-from", f"2025-07-0{_N_DAYS}"]
    ) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["compaction"]["folded"]["cells"] == _N_DAYS - 1
    assert main(["ann-index", "--index", idx, "--auto-compact-max-dirs", "10"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["auto_compact"]["due"] is False
