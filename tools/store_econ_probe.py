#!/usr/bin/env python
"""Store-read economics probe for the maintained stores:
does the READ cost stay flat as the ledger grows?

Claims, each measured rather than asserted:

- bloom / dsir: read cost is flat in LEDGER AGE (the fold aggregates
  <=128*B / <=1024*B calendar-bounded rows) — measured as screen/score
  wall over a 3-batch vs 30-batch ledger built from the same corpus;
- markov: read cost is flat in EVENT VOLUME (the read aggregates
  user x day summary structs and a <=36-integer grid, never raw
  events) — measured as credit-read wall over 1x vs Nx replicated
  events (shifted user keys, the scale_probe fact isometry);
- touch (r10): the Shapley coalition read is flat in event volume —
  the fold is user-bounded (bit_or/max per user), the walk <=2^n rows;
- attrib_age (r10): the ANY-SPLIT attribution ledger read vs LEDGER
  AGE, its unbounded axis — same events landed as 3 vs 300 hash-split
  batches, last-touch + linear reads measured over both;
- postings (r10): what compaction buys — partition-dir count and
  search wall on a 30-day index BEFORE vs AFTER
  ``compact_postings_index`` (scores are equality-pinned in tests; the
  probe prices the LIST/file-index side).

Ledgers land under /tmp (never in the read-only testdata tree) and are
rebuilt per run. Output: one JSON line per measurement (stdout).

Usage:
  python tools/store_econ_probe.py [--sf /root/testdata/sf0.01]
      [--modes bloom,dsir,markov,touch,attrib_age,postings,ann_age,erase_age,corpus_age,fold]
      [--mult 10] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_lambda_spark import get_spark
from data_ingestion_lambda_spark.sources.catalog import load_table

ID_STRIDE = 100_000_000


def _median_wall(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(sorted(ts)[len(ts) // 2], 3)


def _build_split(spark, idx, frame, n_batches, apply_fn):
    shutil.rmtree(idx, ignore_errors=True)
    for d in range(n_batches):
        batch = frame.filter(F.col("doc_id") % n_batches == d)
        apply_fn(spark, idx, batch, f"2025-{(d // 28) + 1:02d}-{(d % 28) + 1:02d}")


def probe_bloom(spark, sf, reps):
    from data_ingestion_lambda_spark.operators.bloom_store import (
        apply_bloom_batch,
        screen_docs,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    members = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    probe = docs.select("doc_id", "text")
    for nb in (3, 30):
        idx = f"/tmp/econ_bloom_{nb}"
        _build_split(spark, idx, members, nb, apply_bloom_batch)
        wall = _median_wall(lambda: screen_docs(spark, idx, probe).count(), reps)
        print(json.dumps({"store": "bloom", "batches": nb, "read_sec": wall}))


def probe_dsir(spark, sf, reps):
    from data_ingestion_lambda_spark.operators.dsir_store import (
        apply_dsir_batch,
        score_docs,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    for nb in (3, 30):
        idx = f"/tmp/econ_dsir_{nb}"
        _build_split(spark, idx, docs, nb, apply_dsir_batch)
        wall = _median_wall(lambda: score_docs(spark, idx, docs).count(), reps)
        print(json.dumps({"store": "dsir", "batches": nb, "read_sec": wall}))


def probe_markov(spark, sf, mult, reps):
    from data_ingestion_lambda_spark.operators.markov_store import (
        apply_markov_batch,
        read_attribution_markov,
    )

    ev = load_table(spark, sf, "events")
    for m in (1, mult):
        data = _replicate_events(spark, ev, m).persist()
        data.count()
        idx = f"/tmp/econ_markov_{m}"
        shutil.rmtree(idx, ignore_errors=True)
        dates = sorted(
            str(r.d)
            for r in data.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        t0 = time.time()
        for d in dates:
            apply_markov_batch(spark, idx, data.filter(F.to_date("ts") == d), d)
        apply_total = round(time.time() - t0, 2)
        wall = _median_wall(
            lambda: read_attribution_markov(spark, idx).collect(), reps
        )
        print(
            json.dumps(
                {
                    "store": "markov",
                    "mult": m,
                    "apply_total_sec": apply_total,
                    "read_sec": wall,
                }
            )
        )
        data.unpersist()


def _replicate_events(spark, ev, m: int):
    if m == 1:
        return ev
    return ev.crossJoin(spark.range(m).withColumnRenamed("id", "copy")).select(
        (F.col("event_id") + F.col("copy") * ID_STRIDE).alias("event_id"),
        (F.col("user_id") + F.col("copy") * ID_STRIDE).alias("user_id"),
        "ts",
        "event_type",
        "value",
        "props",
    )


def probe_touch(spark, sf, mult, reps):
    from data_ingestion_lambda_spark.operators.touch_store import (
        apply_touch_batch,
        read_attribution_shapley,
    )

    ev = load_table(spark, sf, "events")
    for m in (1, mult):
        data = _replicate_events(spark, ev, m).persist()
        data.count()
        idx = f"/tmp/econ_touch_{m}"
        shutil.rmtree(idx, ignore_errors=True)
        dates = sorted(
            str(r.d)
            for r in data.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        t0 = time.time()
        for d in dates:
            apply_touch_batch(spark, idx, data.filter(F.to_date("ts") == d), d)
        apply_total = round(time.time() - t0, 2)
        wall = _median_wall(
            lambda: read_attribution_shapley(spark, idx).collect(), reps
        )
        print(
            json.dumps(
                {
                    "store": "touch",
                    "mult": m,
                    "apply_total_sec": apply_total,
                    "read_sec": wall,
                }
            )
        )
        data.unpersist()


def probe_attrib_age(spark, sf, reps, ages=(3, 300)):
    """Ledger-AGE economics for the any-split attribution ledger: the
    same events landed as N hash-split batches (N = the trigger count a
    long-running stream accumulates), reads measured at both ages."""
    from data_ingestion_lambda_spark.operators.attribution_store import (
        land_attribution_batch,
        read_attribution_linear_stream,
        read_attribution_stream,
    )

    ev = load_table(spark, sf, "events").persist()
    ev.count()
    for nb in ages:
        idx = f"/tmp/econ_attrib_age_{nb}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        for b in range(nb):
            batch = ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(nb)) == b)
            land_attribution_batch(spark, idx, batch, f"b{b:04d}")
        apply_total = round(time.time() - t0, 2)
        last = _median_wall(
            lambda: read_attribution_stream(spark, idx).count(), reps
        )
        linear = _median_wall(
            lambda: read_attribution_linear_stream(spark, idx).count(), reps
        )
        print(
            json.dumps(
                {
                    "store": "attrib_age",
                    "batches": nb,
                    "apply_total_sec": apply_total,
                    "read_last_touch_sec": last,
                    "read_linear_sec": linear,
                }
            )
        )
    # r10: the residual age growth is the per-trigger dir listing —
    # price what the base-fold buys on the oldest ledger
    from data_ingestion_lambda_spark.operators.attribution_store import (
        compact_attribution_ledger,
    )

    idx = f"/tmp/econ_attrib_age_{ages[-1]}"
    compact_attribution_ledger(spark, idx, "b9999")
    last = _median_wall(lambda: read_attribution_stream(spark, idx).count(), reps)
    linear = _median_wall(
        lambda: read_attribution_linear_stream(spark, idx).count(), reps
    )
    print(
        json.dumps(
            {
                "store": "attrib_age",
                "batches": f"{ages[-1]}_compacted",
                "read_last_touch_sec": last,
                "read_linear_sec": linear,
            }
        )
    )
    ev.unpersist()


def probe_ann_age(spark, sf, reps, ages=(3, 300)):
    """IVF-index probe wall vs LEDGER AGE (VERDICT r12 quality item #3):
    the same corpus appended as N date batches against one frozen
    quantizer — the shape of a long-lived index that is never retrained
    (one date dir x cell subdirs per batch). Measures probe_topk wall at
    each age, then prices what the cells date-fold buys at the oldest
    age (row equality is pinned in tests/test_ann_index.py; this probe
    prices the directory-listing / file-index side)."""
    from data_ingestion_lambda_spark.operators.ann_index import (
        append_batch,
        compact_index_cells,
        probe_topk,
        train_index,
    )

    vecs = load_table(spark, sf, "embeddings").select("vec_id", "embedding").persist()
    vecs.count()
    queries = (
        vecs.orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist()
    )
    queries.count()
    for nb in ages:
        idx = f"/tmp/econ_ann_age_{nb}"
        shutil.rmtree(idx, ignore_errors=True)
        train_index(spark, idx, vecs)
        t0 = time.time()
        for b in range(nb):
            batch = vecs.filter(F.pmod(F.xxhash64("vec_id"), F.lit(nb)) == b)
            append_batch(spark, idx, batch, f"2024-{1 + b // 28:02d}-{1 + b % 28:02d}")
        apply_total = round(time.time() - t0, 2)
        # one unmeasured probe first: the 3-batch point runs right after
        # session start and would otherwise carry codegen warm-up that the
        # later points don't (the r12 autocompact comparability caveat)
        probe_topk(spark, idx, queries).count()
        wall = _median_wall(lambda: probe_topk(spark, idx, queries).count(), reps)
        print(
            json.dumps(
                {
                    "store": "ann_age",
                    "batches": nb,
                    "cells_dirs": _count_dirs(f"{idx}/cells"),
                    "apply_total_sec": apply_total,
                    "probe_topk_sec": wall,
                }
            )
        )
    idx = f"/tmp/econ_ann_age_{ages[-1]}"
    fold = compact_index_cells(spark, idx, "2024-12-31")
    wall = _median_wall(lambda: probe_topk(spark, idx, queries).count(), reps)
    print(
        json.dumps(
            {
                "store": "ann_age",
                "batches": f"{ages[-1]}_folded",
                "cells_dirs": _count_dirs(f"{idx}/cells"),
                "folded": fold["folded"],
                "probe_topk_sec": wall,
            }
        )
    )
    queries.unpersist()
    vecs.unpersist()


def probe_erase_age(spark, sf, reps, ages=(3, 300), n_keys=10):
    """What a store erase COSTS vs ledger age (VERDICT r12 Next #1's
    pricing row): the dedup-gate exact index built as N hash-split daily
    batches, then one GDPR request for {n_keys} subjects priced end to
    end — erase_store wall (pass 1's affected-partition scan is the
    age-sensitive term; pass 2 rewrites only the <= n_keys affected
    partitions), the idempotent replay wall (finds nothing, rewrites
    nothing), and the zero-residual verify wall. ``reps`` is unused:
    an erase mutates, so each wall is a single honest measurement."""
    from data_ingestion_lambda_spark.operators.dedup_gate import apply_batch
    from data_ingestion_lambda_spark.operators.store_erasure import (
        erase_store,
        verify_store_erasure,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "text").persist()
    docs.count()
    keys = docs.select("doc_id").orderBy("doc_id").limit(n_keys)
    for nb in ages:
        idx = f"/tmp/econ_erase_gate_{nb}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        for b in range(nb):
            batch = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(nb)) == b)
            apply_batch(spark, idx, batch, f"b{b:04d}", mode="exact")
        apply_total = round(time.time() - t0, 2)
        t1 = time.time()
        rep = erase_store(spark, "dedup-gate", idx, keys, request_id=f"econ-{nb}")
        erase_sec = round(time.time() - t1, 3)
        t2 = time.time()
        rep2 = erase_store(spark, "dedup-gate", idx, keys, request_id=f"econ-{nb}")
        replay_sec = round(time.time() - t2, 3)
        t3 = time.time()
        residual = verify_store_erasure(spark, "dedup-gate", idx, keys)
        verify_sec = round(time.time() - t3, 3)
        print(
            json.dumps(
                {
                    "store": "erase_age",
                    "batches": nb,
                    "apply_total_sec": apply_total,
                    "erase_sec": erase_sec,
                    "rows_erased": rep["rows_erased"],
                    "partitions_rewritten": rep["partitions_rewritten"]
                    + rep["partitions_deleted"],
                    "replay_sec": replay_sec,
                    "replay_rows_erased": rep2["rows_erased"],
                    "verify_sec": verify_sec,
                    "residual": residual,
                }
            )
        )
    docs.unpersist()


def probe_postings(spark, sf, reps, n_days=30):
    from data_ingestion_lambda_spark.operators.postings import (
        compact_postings_index,
        count_partition_dirs,
        search_topk,
        update_postings,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    idx = "/tmp/econ_postings"
    _build_split(spark, idx, docs, n_days, update_postings)

    def _measure(stage: str) -> None:
        wall = _median_wall(
            lambda: search_topk(spark, idx, queries).count(), reps
        )
        print(
            json.dumps(
                {
                    "store": "postings",
                    "stage": stage,
                    "partition_dirs": count_partition_dirs(spark, idx),
                    "search_sec": wall,
                }
            )
        )

    _measure("before_compaction")
    # fold all of January's 28 batches, keep February's
    compact_postings_index(spark, idx, "2025-02-01")
    _measure("after_compaction")


def _count_dirs(idx: str) -> int:
    return sum(
        1
        for n in os.listdir(idx)
        if (n.startswith("date=") or n.startswith("ingest_batch="))
        and os.path.isdir(os.path.join(idx, n))
    )


def _day_events(spark, date: str, n_users=40, n_per_user=4):
    rows = [
        (
            u,
            u * 1000 + i,
            f"{date} {8 + (i * 3) % 12:02d}:{(u * 7 + i * 11) % 60:02d}:00",
            ["view", "click", "signup", "purchase"][(u + i) % 4],
            float((u * 13 + i) % 100),
        )
        for u in range(n_users)
        for i in range(n_per_user)
    ]
    return spark.createDataFrame(
        rows,
        "user_id bigint, event_id bigint, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def probe_fold(spark, sf, reps, n_days=30, stores_filter=None, keep_days=None):
    """r11: what the generalized base-fold buys per store — partition
    dir count and read wall on an n_days ledger BEFORE vs AFTER its
    compaction entrypoint (reads are equality-pinned in
    tests/test_store_compaction.py; this probe prices the LIST axis).
    r12: ``n_days``/``keep_days``/``stores_filter`` parametrize the
    ledger AGE (VERDICT r11 #5 asks for drift+bloom at 300 dirs — at 30
    dirs those two measured flat-to-marginally-worse, so the
    listing-dominates claim needed the longer axis). ``keep_days``
    dirs survive the fold (default: everything from Feb on, the r11
    behavior)."""
    from data_ingestion_lambda_spark.operators import (
        bloom_store,
        cms_store,
        drift_monitor,
        dsir_store,
        hh_store,
        markov_store,
        session_store,
        touch_store,
        vocab,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    items = docs.select(
        "doc_id", F.concat(F.lit("i"), (F.col("doc_id") % 64)).alias("item")
    )

    def _date(d):
        return f"2025-{(d // 28) + 1:02d}-{(d % 28) + 1:02d}"

    def _split_apply(idx, frame, apply_fn):
        shutil.rmtree(idx, ignore_errors=True)
        for d in range(n_days):
            apply_fn(frame.filter(F.col("doc_id") % n_days == d), _date(d))

    def _daily_apply(idx, apply_fn):
        shutil.rmtree(idx, ignore_errors=True)
        for d in range(n_days):
            apply_fn(_day_events(spark, _date(d)), _date(d))

    stores = {
        "vocab": (
            lambda idx: _split_apply(
                idx,
                docs,
                lambda b, dt: vocab.update_vocab(spark, idx, b, dt),
            ),
            lambda idx: vocab.read_vocab(spark, idx).count(),
            vocab.compact_vocab,
        ),
        "cms": (
            lambda idx: _split_apply(
                idx,
                items,
                lambda b, dt: cms_store.apply_cms_batch(
                    spark, idx, b.select("item"), dt
                ),
            ),
            lambda idx: cms_store.read_cms(spark, idx).count(),
            cms_store.compact_cms_store,
        ),
        "bloom": (
            lambda idx: _split_apply(
                idx,
                docs,
                lambda b, dt: bloom_store.apply_bloom_batch(spark, idx, b, dt),
            ),
            lambda idx: bloom_store.screen_docs(
                spark, idx, docs.limit(200)
            ).count(),
            bloom_store.compact_bloom_store,
        ),
        "dsir": (
            lambda idx: _split_apply(
                idx,
                docs,
                lambda b, dt: dsir_store.apply_dsir_batch(spark, idx, b, dt),
            ),
            lambda idx: dsir_store.score_docs(spark, idx, docs.limit(200)).count(),
            dsir_store.compact_dsir_store,
        ),
        "hh": (
            lambda idx: _split_apply(
                idx,
                items,
                lambda b, dt: hh_store.apply_hh_batch(
                    spark, idx, b.select("item"), dt
                ),
            ),
            lambda idx: hh_store.read_heavy_hitters(spark, idx).count(),
            hh_store.compact_hh_store,
        ),
        "touch": (
            lambda idx: _daily_apply(
                idx,
                lambda ev, dt: touch_store.apply_touch_batch(spark, idx, ev, dt),
            ),
            lambda idx: touch_store.read_touch_state(spark, idx).count(),
            touch_store.compact_touch_store,
        ),
        "session": (
            lambda idx: _daily_apply(
                idx,
                lambda ev, dt: session_store.apply_session_batch(
                    spark, idx, ev, dt
                ),
            ),
            lambda idx: session_store.read_sessions(spark, idx).count(),
            session_store.compact_session_store,
        ),
        "markov": (
            lambda idx: _daily_apply(
                idx,
                lambda ev, dt: markov_store.apply_markov_batch(
                    spark, idx, ev, dt
                ),
            ),
            lambda idx: markov_store.read_transition_counts(spark, idx).count(),
            markov_store.compact_markov_store,
        ),
        "drift": (
            lambda idx: _daily_apply(
                idx,
                lambda ev, dt: drift_monitor.apply_histogram_batch(
                    spark, idx, ev, dt
                ),
            ),
            lambda idx: drift_monitor.read_drift(spark, idx).count(),
            drift_monitor.compact_drift_monitor,
        ),
    }
    keep_from = _date(n_days - keep_days) if keep_days is not None else "2025-02-01"
    for name, (build, read, compact) in stores.items():
        if stores_filter is not None and name not in stores_filter:
            continue
        idx = f"/tmp/econ_fold_{name}"
        build(idx)
        before = {
            "dirs": _count_dirs(idx),
            "read_sec": _median_wall(lambda: read(idx), reps),
        }
        compact(spark, idx, keep_from)
        after = {
            "dirs": _count_dirs(idx),
            "read_sec": _median_wall(lambda: read(idx), reps),
        }
        print(
            json.dumps(
                {
                    "store": name,
                    "mode": "fold",
                    "n_days": n_days,
                    "keep_from": keep_from,
                    "before": before,
                    "after": after,
                }
            ),
            flush=True,
        )


def probe_corpus_age(spark, sf, reps, ages=(30, 300)):
    """Corpus-build finalize wall vs WORK-DIR LEDGER AGE (VERDICT r13
    #2): the same ledger/index ROWS landed as N hash-split ``date=``
    partitions (the attrib_age isometry — content identical, only the
    partition-count axis varies, so a wall delta is pure LIST/file-index
    cost), finalize_disposition measured at each age, then at the oldest
    age again AFTER the ledger fold (compact_corpus_ledgers) + both gate
    folds (compact_gate_index). Seed content comes from ONE real
    one-shot gate_and_ledger_batch pass, so every store holds exactly
    what the pipeline writes."""
    from data_ingestion_lambda_spark.operators.corpus_build import (
        DOCS,
        EXACT_INDEX,
        LEDGERS,
        MINHASH_INDEX,
        compact_corpus_ledgers,
        finalize_disposition,
        gate_and_ledger_batch,
    )
    from data_ingestion_lambda_spark.operators.dedup_gate import (
        compact_gate_index,
    )
    from data_ingestion_lambda_spark.operators.upsert import (
        replace_partitions,
    )
    from data_ingestion_lambda_spark.plans.corpus_build import (
        corpus_with_recrawl,
    )
    from data_ingestion_lambda_spark.plans.registry import release_pinned

    seed = "/tmp/econ_corpus_seed"
    shutil.rmtree(seed, ignore_errors=True)
    gate_and_ledger_batch(spark, seed, corpus_with_recrawl(spark, sf), "d000")

    split_key = {name: "doc_id" for name in (DOCS, EXACT_INDEX, MINHASH_INDEX)}
    split_key.update({"verdicts": "doc_id", "grams": "doc_id",
                      "pairs": "new_doc", "exact_matches": "new_doc"})

    def _finalize_wall(work: str) -> float:
        def _once():
            finalize_disposition(spark, work).count()
            release_pinned()

        _once()  # unmeasured warm-up: codegen/file-index caches
        return _median_wall(_once, reps)

    for nb in ages:
        work = f"/tmp/econ_corpus_age_{nb}"
        shutil.rmtree(work, ignore_errors=True)
        dates = [f"d{i:03d}" for i in range(nb)]
        for name in (*LEDGERS, EXACT_INDEX, MINHASH_INDEX):
            src = f"{seed}/{name}"
            if not os.path.isdir(src):
                continue
            rows = spark.read.parquet(src).drop("date")
            split = rows.withColumn(
                "date",
                F.concat(
                    F.lit("d"),
                    F.lpad(
                        F.pmod(
                            F.xxhash64(F.col(split_key[name]).cast("string")),
                            F.lit(nb),
                        ).cast("string"),
                        3,
                        "0",
                    ),
                ),
            )
            replace_partitions(spark, f"{work}/{name}", split, dates)
        print(
            json.dumps(
                {
                    "store": "corpus_age",
                    "batches": nb,
                    "ledger_dirs": sum(
                        _count_dirs(f"{work}/{n}") for n in LEDGERS
                    ),
                    "finalize_sec": _finalize_wall(work),
                }
            ),
            flush=True,
        )
    work = f"/tmp/econ_corpus_age_{ages[-1]}"
    fold = compact_corpus_ledgers(spark, work, f"d{ages[-1]:03d}")
    for name in (EXACT_INDEX, MINHASH_INDEX):
        compact_gate_index(spark, f"{work}/{name}", f"d{ages[-1]:03d}")
    print(
        json.dumps(
            {
                "store": "corpus_age",
                "batches": f"{ages[-1]}_folded",
                "ledger_dirs": sum(_count_dirs(f"{work}/{n}") for n in LEDGERS),
                "folded": fold["folded"],
                "finalize_sec": _finalize_wall(work),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--modes", default="bloom,dsir,markov")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fold-days", type=int, default=30, help="ledger age for --modes fold")
    ap.add_argument(
        "--fold-keep-days", type=int, default=None,
        help="dirs surviving the fold (default: fold January only, the r11 form)",
    )
    ap.add_argument(
        "--fold-stores", default=None,
        help="comma-separated store subset for --modes fold (default all nine)",
    )
    args = ap.parse_args()
    spark = get_spark("store_econ_probe")
    modes = set(args.modes.split(","))
    if "bloom" in modes:
        probe_bloom(spark, args.sf, args.reps)
    if "dsir" in modes:
        probe_dsir(spark, args.sf, args.reps)
    if "markov" in modes:
        probe_markov(spark, args.sf, args.mult, args.reps)
    if "touch" in modes:
        probe_touch(spark, args.sf, args.mult, args.reps)
    if "attrib_age" in modes:
        probe_attrib_age(spark, args.sf, args.reps)
    if "postings" in modes:
        probe_postings(spark, args.sf, args.reps)
    if "ann_age" in modes:
        probe_ann_age(spark, args.sf, args.reps)
    if "erase_age" in modes:
        probe_erase_age(spark, args.sf, args.reps)
    if "corpus_age" in modes:
        probe_corpus_age(spark, args.sf, args.reps)
    if "fold" in modes:
        probe_fold(
            spark,
            args.sf,
            args.reps,
            n_days=args.fold_days,
            stores_filter=set(args.fold_stores.split(",")) if args.fold_stores else None,
            keep_days=args.fold_keep_days,
        )


if __name__ == "__main__":
    main()
