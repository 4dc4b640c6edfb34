#!/usr/bin/env python
"""Measure the maintained dedup gate's per-day economics: the cost of
probing a FIXED daily batch against a persisted signature index as the
indexed corpus grows 10x — for each of the gate's three lanes.

The claim under operators/dedup_gate.py: a day's cost is the batch's own
signature build + a probe join against the stored (doc_id, sig) table —
the corpus's TEXT is never re-read and no old-old pair is enumerated, so
per-day wall should grow far slower than the corpus (only the probe
join's index-side scan grows). Per mode:

  minhash   — batch band keys x index band keys, agreement rescore
  exact     — 16-byte digest equality join
  embedding — sign-LSH band keys + side-aware rectangle sgemm
  vocab     — maintained unigram model (operators/vocab.py): "probe" =
              score the batch's LM-quality against the persisted counts
  ann       — maintained IVF-ANN index (operators/ann_index.py):
              "probe" = top-k cosine for the 8 demo query vectors
              against the cell-partitioned inverted file; the pruned
              scan reads n_probe/n_cells of the corpus, so probe cost
              tracks corpus/4 here (the fraction is the scale knob —
              production grows the cell count, shrinking it)
  bm25      — maintained BM25 postings index (operators/postings.py):
              "probe" = the 8 demo query documents' lexical top-k
              against the persisted bucket-partitioned inverted file;
              prices what materializing the postings once buys vs the
              registered query's per-run corpus re-tokenization
  bucketed  — the minhash lane over the BUCKETED band-table layout
              (apply_batch_bucketed): same pair set, but the daily probe
              reads the index as a bucketed FileScan with no index-side
              exchange — the probe_growth ratio prices what the 3x
              storage (band rows + riding signatures) buys per day

  corpus 1x  = sf0.1 tables (5k docs / 6k vectors) -> index, probe batch
  corpus 10x = scale_probe 10x replication         -> index, same batch

Batch = the sf0.001 table (500 docs / 600 vectors) shifted to fresh ids.
The exact lane's batch additionally plants 50 VERBATIM corpus docs under
fresh ids (sf0.001 text never equals sf0.1 text byte-for-byte, so without
planting the digest join would be vacuously empty — the probe must show
the lane detecting real re-crawls, not just costing little).
Prints one JSON line per (mode, corpus) and a summary line per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_lambda_spark import get_spark
from data_ingestion_lambda_spark.operators.dedup_gate import apply_batch, probe_batch
from tools.scale_probe import build_replicated

BATCH_ID_OFFSET = 900_000_000

# (table, key column, payload column) per gate lane
_MODE_TABLE = {
    "minhash": ("documents.parquet", "doc_id", "text"),
    "exact": ("documents.parquet", "doc_id", "text"),
    "embedding": ("embeddings.parquet", "vec_id", "embedding"),
}


def _frame(spark, src: str, mode: str, id_offset: int = 0):
    table, key, payload = _MODE_TABLE[mode]
    return spark.read.parquet(f"{src}/{table}").select(
        (F.col(key) + id_offset).alias("doc_id"), payload
    )


def run_mode(spark, mode: str, rep_dir: str) -> None:
    batch = _frame(spark, "/root/testdata/sf0.001", mode, BATCH_ID_OFFSET)
    if mode == "exact":
        planted = _frame(
            spark, "/root/testdata/sf0.1", mode, 2 * BATCH_ID_OFFSET
        ).filter(F.col("doc_id") % 100 == 0)
        batch = batch.unionByName(planted)
    batch = batch.cache()
    n_batch = batch.count()

    results = {}
    for label, src in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        corpus = _frame(spark, src, mode)
        idx = tempfile.mkdtemp(prefix=f"gate_idx_{mode}_{label}_")
        try:
            t0 = time.time()
            apply_batch(spark, idx, corpus, "2025-07-01", mode=mode)
            t_index = round(time.time() - t0, 2)

            t_probe = None
            for _ in range(2):
                spark.catalog.clearCache()
                batch.cache().count()
                t0 = time.time()
                n_pairs = probe_batch(spark, idx, batch, mode=mode).count()
                dt = round(time.time() - t0, 2)
                t_probe = dt if t_probe is None else min(t_probe, dt)
            results[label] = {
                "corpus_docs": corpus.count(),
                "t_index_once_s": t_index,
                "t_daily_probe_s": t_probe,
                "probe_pairs": n_pairs,
            }
            print(json.dumps({"mode": mode, "corpus": label, **results[label]}), flush=True)
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    batch.unpersist()

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": mode,
                "batch_docs": n_batch,
                "corpus_growth": round(r10["corpus_docs"] / r1["corpus_docs"], 1),
                "probe_growth": round(
                    r10["t_daily_probe_s"] / r1["t_daily_probe_s"], 2
                ),
                "index_growth": round(r10["t_index_once_s"] / r1["t_index_once_s"], 2),
            }
        ),
        flush=True,
    )


def run_vocab(spark, rep_dir: str) -> None:
    """Same economics for the maintained unigram model: index = the
    corpus's per-batch (tok, cnt) partitions; daily probe = scoring the
    fixed batch against the persisted counts (read-side SUM + one
    token-keyed join). The scored output is batch-sized by construction,
    so unlike the embedding lane there is no output-growth term — only
    the model-side aggregate grows."""
    from data_ingestion_lambda_spark.operators.vocab import score_batch, update_vocab

    batch = _frame(spark, "/root/testdata/sf0.001", "minhash", BATCH_ID_OFFSET).cache()
    n_batch = batch.count()

    results = {}
    for label, src in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        corpus = _frame(spark, src, "minhash")
        idx = tempfile.mkdtemp(prefix=f"gate_idx_vocab_{label}_")
        try:
            t0 = time.time()
            update_vocab(spark, idx, corpus, "2025-07-01")
            t_index = round(time.time() - t0, 2)

            t_probe = None
            for _ in range(2):
                spark.catalog.clearCache()
                batch.cache().count()
                t0 = time.time()
                n_scored = score_batch(spark, idx, batch).count()
                dt = round(time.time() - t0, 2)
                t_probe = dt if t_probe is None else min(t_probe, dt)
            results[label] = {
                "corpus_docs": corpus.count(),
                "t_index_once_s": t_index,
                "t_daily_probe_s": t_probe,
                "probe_pairs": n_scored,
            }
            print(json.dumps({"mode": "vocab", "corpus": label, **results[label]}), flush=True)
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    batch.unpersist()

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": "vocab",
                "batch_docs": n_batch,
                "corpus_growth": round(r10["corpus_docs"] / r1["corpus_docs"], 1),
                "probe_growth": round(
                    r10["t_daily_probe_s"] / r1["t_daily_probe_s"], 2
                ),
                "index_growth": round(r10["t_index_once_s"] / r1["t_index_once_s"], 2),
            }
        ),
        flush=True,
    )


def run_ann(spark, rep_dir: str) -> None:
    """Query economics for the maintained ANN index: index-once = train
    the quantizer on the corpus + assign/land every vector; daily probe
    = the 8 demo query vectors' top-k against the persisted index. The
    partition-pruned scan reads the probed cells only, so probe cost
    should grow ~(n_probe/n_cells) x corpus — the constant-fraction
    floor a FIXED 16-cell quantizer admits (production scales the cell
    count instead, shrinking the fraction with the corpus)."""
    from data_ingestion_lambda_spark.operators.ann_index import (
        append_batch,
        probe_topk,
        train_index,
    )
    from data_ingestion_lambda_spark.plans.similarity import N_QUERIES

    queries = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .cache()
    )
    n_batch = queries.count()

    results = {}
    for label, src in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        corpus = spark.read.parquet(f"{src}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        idx = tempfile.mkdtemp(prefix=f"gate_idx_ann_{label}_")
        try:
            t0 = time.time()
            train_index(spark, idx, corpus)
            append_batch(spark, idx, corpus, "2025-07-01")
            t_index = round(time.time() - t0, 2)

            t_probe = None
            for _ in range(2):
                spark.catalog.clearCache()
                queries.cache().count()
                t0 = time.time()
                n_rows = probe_topk(spark, idx, queries).count()
                dt = round(time.time() - t0, 2)
                t_probe = dt if t_probe is None else min(t_probe, dt)
            results[label] = {
                "corpus_docs": corpus.count(),
                "t_index_once_s": t_index,
                "t_daily_probe_s": t_probe,
                "probe_pairs": n_rows,
            }
            print(
                json.dumps({"mode": "ann", "corpus": label, **results[label]}),
                flush=True,
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    queries.unpersist()

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": "ann",
                "batch_docs": n_batch,
                "corpus_growth": round(r10["corpus_docs"] / r1["corpus_docs"], 1),
                "probe_growth": round(
                    r10["t_daily_probe_s"] / r1["t_daily_probe_s"], 2
                ),
                "index_growth": round(r10["t_index_once_s"] / r1["t_index_once_s"], 2),
            }
        ),
        flush=True,
    )


def run_bm25(spark, rep_dir: str) -> None:
    """Query economics for the maintained postings index: index-once =
    tokenize + land the corpus; daily probe = the 8 demo query docs'
    top-k (bucket-pruned postings join + two scalar sums — no corpus
    text touched). Contrast with the one-shot registered query, whose
    EVERY run pays the index-once column."""
    from data_ingestion_lambda_spark.operators.postings import (
        search_topk,
        update_postings,
    )
    from data_ingestion_lambda_spark.plans.retrieval import N_QUERIES

    queries = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .filter(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "text")
        .cache()
    )
    n_batch = queries.count()

    results = {}
    for label, src in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        corpus = spark.read.parquet(f"{src}/documents.parquet").select(
            "doc_id", "text"
        )
        idx = tempfile.mkdtemp(prefix=f"gate_idx_bm25_{label}_")
        try:
            t0 = time.time()
            update_postings(spark, idx, corpus, "2025-07-01")
            t_index = round(time.time() - t0, 2)

            t_probe = None
            for _ in range(2):
                spark.catalog.clearCache()
                queries.cache().count()
                t0 = time.time()
                n_rows = search_topk(spark, idx, queries).count()
                dt = round(time.time() - t0, 2)
                t_probe = dt if t_probe is None else min(t_probe, dt)
            results[label] = {
                "corpus_docs": corpus.count(),
                "t_index_once_s": t_index,
                "t_daily_probe_s": t_probe,
                "probe_pairs": n_rows,
            }
            print(
                json.dumps({"mode": "bm25", "corpus": label, **results[label]}),
                flush=True,
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    queries.unpersist()

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": "bm25",
                "batch_docs": n_batch,
                "corpus_growth": round(r10["corpus_docs"] / r1["corpus_docs"], 1),
                "probe_growth": round(
                    r10["t_daily_probe_s"] / r1["t_daily_probe_s"], 2
                ),
                "index_growth": round(r10["t_index_once_s"] / r1["t_index_once_s"], 2),
            }
        ),
        flush=True,
    )


def run_bucketed(spark, rep_dir: str) -> None:
    """Same economics for the bucketed band-table layout: index-once =
    apply_batch_bucketed over the corpus (band explosion + bucketed
    write — deliberately pricier than the signature-only directory
    index), daily probe = probe_batch_bucketed of the fixed batch (one
    exchange, batch side only). Compare t_daily_probe_s against the
    minhash lane's: the delta is what the bucketed layout buys per day."""
    from data_ingestion_lambda_spark.operators.dedup_gate import (
        apply_batch_bucketed,
        probe_batch_bucketed,
    )

    batch = _frame(spark, "/root/testdata/sf0.001", "minhash", BATCH_ID_OFFSET).cache()
    n_batch = batch.count()

    results = {}
    for label, src in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        corpus = _frame(spark, src, "minhash")
        tbl = f"gate_probe_bidx_{label}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        try:
            t0 = time.time()
            apply_batch_bucketed(spark, tbl, corpus, "2025-07-01")
            t_index = round(time.time() - t0, 2)

            t_probe = None
            for _ in range(2):
                spark.catalog.clearCache()
                batch.cache().count()
                t0 = time.time()
                n_pairs = probe_batch_bucketed(spark, tbl, batch).count()
                dt = round(time.time() - t0, 2)
                t_probe = dt if t_probe is None else min(t_probe, dt)
            results[label] = {
                "corpus_docs": corpus.count(),
                "t_index_once_s": t_index,
                "t_daily_probe_s": t_probe,
                "probe_pairs": n_pairs,
            }
            print(
                json.dumps({"mode": "bucketed", "corpus": label, **results[label]}),
                flush=True,
            )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    batch.unpersist()

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": "bucketed",
                "batch_docs": n_batch,
                "corpus_growth": round(r10["corpus_docs"] / r1["corpus_docs"], 1),
                "probe_growth": round(
                    r10["t_daily_probe_s"] / r1["t_daily_probe_s"], 2
                ),
                "index_growth": round(r10["t_index_once_s"] / r1["t_index_once_s"], 2),
            }
        ),
        flush=True,
    )


def run_feature(spark, rep_dir: str) -> None:
    """Per-day economics for the maintained feature store
    (operators/feature_store.py). Three claims under the ledger design,
    measured against a 1x (sf0.1: 1,500 users) and a 10x (15,000 users)
    30-day history built by real day-by-day applies:

      apply   — landing a FIXED one-day batch writes only its own moment
                partition and reads NOTHING from the store, so apply cost
                must be FLAT in store size (the upsert_probe claim, here
                without even a merge read).
      read    — deriving the trainer vectors merges |users| x |days|
                moment rows: calendar-linear, volume-free. Growth tracks
                the user multiple, never raw event volume.
      compact — folding history into the base collapses the |days| term;
                the read re-measured after compaction prices what the
                maintenance op buys back.
    """
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.operators.feature_store import (
        apply_feature_batch,
        compact_feature_ledger,
        read_user_features,
    )

    def _events(path):
        # raw parquet yields TIMESTAMP_NTZ; the store's moment exprs
        # (unix_micros) need TIMESTAMP, same normalization load_table does
        return spark.read.parquet(path).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    batch = (
        _events("/root/testdata/sf0.001/events.parquet")
        .filter(F.to_date("ts") == "2024-01-01")
        .withColumn("user_id", F.col("user_id") + F.lit(10**9))
        .cache()
    )
    n_batch = batch.count()

    results = {}
    for label, src in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        events = _events(f"{src}/events.parquet")
        days = sorted(
            str(r.d)
            for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        idx = tempfile.mkdtemp(prefix=f"feat_idx_{label}_")
        shutil.rmtree(idx)  # apply creates it
        try:
            t0 = time.time()
            for d in days:
                apply_feature_batch(
                    spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
                )
            t_index = round(time.time() - t0, 2)

            t_apply = None
            for _ in range(2):  # replay overwrites its own partition: idempotent
                t0 = time.time()
                apply_feature_batch(spark, idx, batch, "2025-07-01")
                dt = round(time.time() - t0, 2)
                t_apply = dt if t_apply is None else min(t_apply, dt)

            t_read = None
            for _ in range(2):
                spark.catalog.clearCache()
                batch.cache().count()
                t0 = time.time()
                n_users = read_user_features(spark, idx).count()
                dt = round(time.time() - t0, 2)
                t_read = dt if t_read is None else min(t_read, dt)

            folded = compact_feature_ledger(spark, idx, "2025-01-01")
            t_read_c = None
            for _ in range(2):
                spark.catalog.clearCache()
                batch.cache().count()
                t0 = time.time()
                read_user_features(spark, idx).count()
                dt = round(time.time() - t0, 2)
                t_read_c = dt if t_read_c is None else min(t_read_c, dt)

            results[label] = {
                "store_users": n_users,
                "history_days": len(days),
                "t_build_once_s": t_index,
                "t_daily_apply_s": t_apply,
                "t_read_vectors_s": t_read,
                "folded_partitions": folded,
                "t_read_after_compact_s": t_read_c,
            }
            print(
                json.dumps({"mode": "feature", "corpus": label, **results[label]}),
                flush=True,
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    batch.unpersist()

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": "feature",
                "batch_events": n_batch,
                "store_growth": round(r10["store_users"] / r1["store_users"], 1),
                "apply_growth": round(
                    r10["t_daily_apply_s"] / max(r1["t_daily_apply_s"], 0.01), 2
                ),
                "read_growth": round(
                    r10["t_read_vectors_s"] / max(r1["t_read_vectors_s"], 0.01), 2
                ),
                "compacted_read_growth": round(
                    r10["t_read_after_compact_s"]
                    / max(r1["t_read_after_compact_s"], 0.01),
                    2,
                ),
            }
        ),
        flush=True,
    )


def run_session(spark, rep_dir: str, extra_corpora: list[tuple[str, str]] = ()) -> None:
    """Per-day economics for maintained incremental sessionization
    (operators/session_store.py): apply cost must track the BATCH (one
    day's events sessionized + a partition write — no store read);
    the seam-merge read costs session-count rows, which grows with the
    user multiple but never re-touches events. ``extra_corpora`` adds
    (label, events-dir) points past the default 1x/10x — e.g.
    ``--session-extra 300x=/tmp/scale_300`` for the 300x read point."""
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.operators.session_store import (
        apply_session_batch,
        read_sessions,
    )

    def _events(path):
        return spark.read.parquet(path).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    results = {}
    corpora = [("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)] + list(extra_corpora)
    for label, src in corpora:
        events = _events(f"{src}/events.parquet")
        days = sorted(
            str(r.d)
            for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        idx = tempfile.mkdtemp(prefix=f"sess_idx_{label}_")
        shutil.rmtree(idx)
        try:
            t0 = time.time()
            for d in days:
                apply_session_batch(
                    spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
                )
            t_index = round(time.time() - t0, 2)

            # fixed daily batch: replay the LAST day (idempotent overwrite)
            batch = events.filter(F.to_date("ts") == F.lit(days[-1]))
            t_apply = None
            for _ in range(2):
                t0 = time.time()
                apply_session_batch(spark, idx, batch, days[-1])
                dt = round(time.time() - t0, 2)
                t_apply = dt if t_apply is None else min(t_apply, dt)

            t_read = None
            n_sessions = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                n_sessions = read_sessions(spark, idx).count()
                dt = round(time.time() - t0, 2)
                t_read = dt if t_read is None else min(t_read, dt)

            results[label] = {
                "history_days": len(days),
                "sessions": n_sessions,
                "t_build_once_s": t_index,
                "t_daily_apply_s": t_apply,
                "t_read_sessions_s": t_read,
            }
            print(
                json.dumps({"mode": "session", "corpus": label, **results[label]}),
                flush=True,
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    r1 = results["1x"]
    summary = {"mode": "session"}
    for label, _ in corpora[1:]:
        r = results[label]
        summary[f"session_growth_{label}"] = round(r["sessions"] / r1["sessions"], 1)
        summary[f"apply_growth_{label}"] = round(
            r["t_daily_apply_s"] / max(r1["t_daily_apply_s"], 0.01), 2
        )
        summary[f"read_growth_{label}"] = round(
            r["t_read_sessions_s"] / max(r1["t_read_sessions_s"], 0.01), 2
        )
    print(json.dumps(summary), flush=True)


def run_attribution(spark, rep_dir: str) -> None:
    """Per-day economics for the maintained attribution store
    (operators/attribution_store.py): apply cost must track the BATCH
    (one day's events windowed + two partition writes); the read joins
    purchase-count rows against <= 7 day partitions of USER-bounded
    last-click rows — never event history."""
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.operators.attribution_store import (
        apply_attribution_batch,
        read_attribution,
        read_attribution_linear,
        read_attribution_position,
    )

    def _events(path):
        return spark.read.parquet(path).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    results = {}
    for label, src_dir in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        events = _events(f"{src_dir}/events.parquet")
        days = sorted(
            str(r.d)
            for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        idx = tempfile.mkdtemp(prefix=f"attr_idx_{label}_")
        shutil.rmtree(idx)
        try:
            t0 = time.time()
            for d in days:
                apply_attribution_batch(
                    spark, idx, events.filter(F.to_date("ts") == F.lit(d)), d
                )
            t_index = round(time.time() - t0, 2)

            batch = events.filter(F.to_date("ts") == F.lit(days[-1]))
            t_apply = None
            for _ in range(2):
                t0 = time.time()
                apply_attribution_batch(spark, idx, batch, days[-1])
                dt = round(time.time() - t0, 2)
                t_apply = dt if t_apply is None else min(t_apply, dt)

            t_read = None
            n_purchases = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                n_purchases = read_attribution(spark, idx).count()
                dt = round(time.time() - t0, 2)
                t_read = dt if t_read is None else min(t_read, dt)

            t_linear = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                read_attribution_linear(spark, idx).count()
                dt = round(time.time() - t0, 2)
                t_linear = dt if t_linear is None else min(t_linear, dt)

            t_position = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                read_attribution_position(spark, idx).count()
                dt = round(time.time() - t0, 2)
                t_position = dt if t_position is None else min(t_position, dt)

            results[label] = {
                "history_days": len(days),
                "purchases": n_purchases,
                "t_build_once_s": t_index,
                "t_daily_apply_s": t_apply,
                "t_read_s": t_read,
                "t_linear_read_s": t_linear,
                "t_position_read_s": t_position,
            }
            print(
                json.dumps({"mode": "attribution", "corpus": label, **results[label]}),
                flush=True,
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": "attribution",
                "purchase_growth": round(r10["purchases"] / r1["purchases"], 1),
                "apply_growth": round(
                    r10["t_daily_apply_s"] / max(r1["t_daily_apply_s"], 0.01), 2
                ),
                "read_growth": round(r10["t_read_s"] / max(r1["t_read_s"], 0.01), 2),
                "linear_read_growth": round(
                    r10["t_linear_read_s"] / max(r1["t_linear_read_s"], 0.01), 2
                ),
                "position_read_growth": round(
                    r10["t_position_read_s"] / max(r1["t_position_read_s"], 0.01), 2
                ),
            }
        ),
        flush=True,
    )


def run_attribution_stream(spark, rep_dir: str) -> None:
    """Economics for the ANY-SPLIT attribution ledger (the streaming
    front's representation): the read reconstructs window state from a
    date-pruned 8-day click join — per-purchase cost must be bounded by
    its own window, not store age. Batches land as day files here
    purely for convenience; the representation makes no day-purity
    assumption (tests pin scrambled splits)."""
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.operators.attribution_store import (
        land_attribution_batch,
        read_attribution_linear_stream,
        read_attribution_position_stream,
        read_attribution_stream,
    )

    def _events(path):
        return spark.read.parquet(path).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    results = {}
    for label, src_dir in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        events = _events(f"{src_dir}/events.parquet").select(
            "event_id", "user_id", "ts", "event_type", "value"
        )
        days = sorted(
            str(r.d)
            for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        idx = tempfile.mkdtemp(prefix=f"attr_stream_{label}_")
        shutil.rmtree(idx)
        try:
            t0 = time.time()
            for i, d in enumerate(days):
                land_attribution_batch(
                    spark,
                    idx,
                    events.filter(F.to_date("ts") == F.lit(d)),
                    f"b{i:04d}",
                )
            t_build = round(time.time() - t0, 2)
            timings = {}
            n_purchases = None
            for name, reader in (
                ("t_read_s", read_attribution_stream),
                ("t_linear_read_s", read_attribution_linear_stream),
                ("t_position_read_s", read_attribution_position_stream),
            ):
                best = None
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    n = reader(spark, idx).count()
                    dt = round(time.time() - t0, 2)
                    best = dt if best is None else min(best, dt)
                    if name == "t_read_s":
                        n_purchases = n
                timings[name] = best
            results[label] = {
                "history_days": len(days),
                "purchases": n_purchases,
                "t_build_once_s": t_build,
                **timings,
            }
            print(
                json.dumps(
                    {"mode": "attribution_stream", "corpus": label, **results[label]}
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "mode": "attribution_stream",
                "purchase_growth": round(r10["purchases"] / r1["purchases"], 1),
                "read_growth": round(r10["t_read_s"] / max(r1["t_read_s"], 0.01), 2),
                "linear_read_growth": round(
                    r10["t_linear_read_s"] / max(r1["t_linear_read_s"], 0.01), 2
                ),
                "position_read_growth": round(
                    r10["t_position_read_s"] / max(r1["t_position_read_s"], 0.01), 2
                ),
            }
        ),
        flush=True,
    )


def run_autocompact(spark, rep_dir: str, n_applies: int = 60, max_dirs: int = 10) -> None:
    """The auto-compaction policy's long-run economics (VERDICT r12 #2):
    the SAME n_applies daily vocab lands, once with the dir-count policy
    (``auto_keep_from`` at max_dirs, fold-to-half hysteresis — exactly
    what ``--auto-compact-max-dirs`` drives) and once unbounded. Claims
    measured: (a) the policy holds the live dir count bounded by
    max_dirs for the whole run while the unbounded twin grows linearly;
    (b) end-state model reads are cheaper on the bounded store; (c) the
    fold fires ~n_applies/(max_dirs/2) times, i.e. amortized O(1) folds
    per apply, and total fold wall is reported so the maintenance cost
    is priced, not hidden."""
    import tempfile

    from data_ingestion_lambda_spark.operators.base_fold import auto_keep_from
    from data_ingestion_lambda_spark.operators.vocab import (
        compact_vocab,
        read_vocab,
        update_vocab,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .limit(400)
    )
    root = tempfile.mkdtemp(prefix="gate_autocompact_")

    def _date(d):
        return f"2025-{(d // 28) + 1:02d}-{(d % 28) + 1:02d}"

    def _dirs(idx):
        return len(
            [n for n in os.listdir(idx) if n.startswith("date=") and n[5:6] != "0"]
        ) if os.path.exists(idx) else 0

    results = {}
    for label, policy in (("bounded", True), ("unbounded", False)):
        idx = f"{root}/{label}"
        folds, fold_wall, max_live = 0, 0.0, 0
        t0 = time.time()
        for d in range(n_applies):
            batch = docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(d * 1_000_000)
            )
            update_vocab(spark, idx, batch, _date(d))
            if policy:
                kf = auto_keep_from(spark, idx, max_dirs=max_dirs)
                if kf is not None:
                    tf0 = time.time()
                    compact_vocab(spark, idx, kf)
                    fold_wall += time.time() - tf0
                    folds += 1
            max_live = max(max_live, _dirs(idx))
        apply_wall = time.time() - t0
        def _read_once():
            tr = time.time()
            read_vocab(spark, idx).count()
            return time.time() - tr

        read_wall = min(_read_once() for _ in range(3))
        results[label] = {
            "applies": n_applies,
            "max_live_dirs": max_live,
            "final_dirs": _dirs(idx),
            "folds": folds,
            "fold_wall_s": round(fold_wall, 2),
            "apply_wall_s": round(apply_wall, 2),
            "read_s": round(read_wall, 3),
        }
        print(
            json.dumps({"mode": "autocompact", "store": f"vocab/{label}", **results[label]}),
            flush=True,
        )
    b, u = results["bounded"], results["unbounded"]
    print(
        json.dumps(
            {
                "mode": "autocompact",
                "summary": True,
                "max_dirs_policy": max_dirs,
                "bounded_max_live": b["max_live_dirs"],
                "unbounded_final": u["final_dirs"],
                "read_speedup": round(u["read_s"] / max(b["read_s"], 1e-9), 2),
                "folds": b["folds"],
                "fold_overhead_frac": round(
                    b["fold_wall_s"] / max(b["apply_wall_s"], 1e-9), 3
                ),
            }
        ),
        flush=True,
    )


def run_corpusbuild(spark, n_days: int = 30, warmup_drops: int = 0) -> None:
    """Composed per-drop economics for the incremental corpus-build
    (operators/corpus_build.py): N daily drops — each the sf0.001
    documents table under fresh ids with scale_probe's `r{i}_` token
    rewrite, so drops are mutually dissimilar (within-drop dup/quality
    structure preserved, no cross-drop near-dup blowup) — flow through
    gate_and_ledger_batch into one work dir. The claim under test: a
    drop's wall is batch-sized (gates probe persisted indexes, scoring
    is row-local), so per-drop cost must stay ~flat while the indexed
    corpus grows N×; the finalize (CC + BFS + assembly over accumulated
    ledgers) is priced once at the end.

    ``warmup_drops`` (VERDICT r13 #5): run that many UNMEASURED drops
    into a throwaway work dir first, so JVM/codegen session warm-up is
    paid before the measured sequence starts and the head/tail flatness
    claim stands on clean adjacent pairs — the measured work dir's
    content is untouched by the warm-up."""
    import shutil

    from data_ingestion_lambda_spark.operators.corpus_build import (
        finalize_disposition,
        gate_and_ledger_batch,
    )
    from data_ingestion_lambda_spark.plans.registry import release_pinned
    from tools.scale_probe import ID_STRIDE

    work = "/tmp/gate_probe_corpusbuild"
    shutil.rmtree(work, ignore_errors=True)
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text", "n_chars"
    ).persist()
    base.count()
    if warmup_drops:
        wwork = work + "_warmup"
        shutil.rmtree(wwork, ignore_errors=True)
        for d in range(warmup_drops):
            gate_and_ledger_batch(spark, wwork, base, f"d{d:03d}")
        shutil.rmtree(wwork, ignore_errors=True)
    walls = []
    for d in range(n_days):
        drop = base.withColumn("doc_id", F.col("doc_id") + F.lit(d * ID_STRIDE))
        if d > 0:
            drop = drop.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"r{d}_$1")
            ).withColumn("n_chars", F.length("text"))
        t0 = time.time()
        rep = gate_and_ledger_batch(spark, work, drop, f"d{d:03d}")
        walls.append(round(time.time() - t0, 2))
        print(
            json.dumps({"mode": "corpusbuild", "day": d, "wall_s": walls[-1],
                        "pairs": rep["near_dup_pairs"]}),
            flush=True,
        )
    t0 = time.time()
    n_rows = finalize_disposition(spark, work).count()
    fin = round(time.time() - t0, 2)
    release_pinned()
    base.unpersist()
    if warmup_drops:
        head = sum(walls[:5]) / 5  # warm-up already paid off-ledger
    else:
        head = sum(walls[1:6]) / 5  # day 0 pays session warm-up; skip it
    tail = sum(walls[-5:]) / 5
    print(
        json.dumps(
            {
                "mode": "corpusbuild",
                "summary": True,
                "days": n_days,
                "warmup_drops": warmup_drops,
                "drop_wall_days_1_5_s": round(head, 2),
                "drop_wall_last_5_s": round(tail, 2),
                "growth_ratio": round(tail / max(head, 1e-9), 2),
                "finalize_s": fin,
                "disposition_rows": n_rows,
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--modes",
        default="minhash,exact,embedding,vocab",
        help="comma-separated gate lanes to measure",
    )
    ap.add_argument(
        "--session-extra",
        default="",
        help="extra session corpora as comma-separated LABEL=EVENTS_DIR "
        "pairs (e.g. 300x=/tmp/scale_300), measured after the 1x/10x pair",
    )
    ap.add_argument(
        "--warmup-drops",
        type=int,
        default=0,
        help="corpusbuild only: unmeasured drops into a throwaway work "
        "dir first, so the measured head carries no session warm-up",
    )
    args = ap.parse_args()

    spark = get_spark("gate_probe")
    rep_dir = "/tmp/gate_probe_10x"
    modes = [m for m in args.modes.split(",") if m]
    # corpusbuild builds its own drops from sf0.001 — don't pay the 10x
    # replication for a run that never reads it
    if set(modes) != {"corpusbuild"} and not os.path.exists(
        f"{rep_dir}/documents.parquet"
    ):
        build_replicated(spark, "/root/testdata/sf0.1", rep_dir, 10)

    for mode in [m for m in args.modes.split(",") if m]:
        if mode == "vocab":
            run_vocab(spark, rep_dir)
        elif mode == "bucketed":
            run_bucketed(spark, rep_dir)
        elif mode == "ann":
            run_ann(spark, rep_dir)
        elif mode == "bm25":
            run_bm25(spark, rep_dir)
        elif mode == "feature":
            run_feature(spark, rep_dir)
        elif mode == "attribution":
            run_attribution(spark, rep_dir)
        elif mode == "attribution-stream":
            run_attribution_stream(spark, rep_dir)
        elif mode == "autocompact":
            run_autocompact(spark, rep_dir)
        elif mode == "corpusbuild":
            run_corpusbuild(spark, warmup_drops=args.warmup_drops)
        elif mode == "session":
            extra = [
                tuple(pair.split("=", 1))
                for pair in args.session_extra.split(",")
                if pair
            ]
            run_session(spark, rep_dir, extra_corpora=extra)
        else:
            run_mode(spark, mode, rep_dir)


if __name__ == "__main__":
    main()
