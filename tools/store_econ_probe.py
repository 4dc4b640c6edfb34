#!/usr/bin/env python
"""Store-read economics probe for the round-9 maintained stores:
does the READ cost stay flat as the ledger grows?

Three claims, each measured rather than asserted:

- bloom / dsir: read cost is flat in LEDGER AGE (the fold aggregates
  <=128*B / <=1024*B calendar-bounded rows) — measured as screen/score
  wall over a 3-batch vs 30-batch ledger built from the same corpus;
- markov: read cost is flat in EVENT VOLUME (the read aggregates
  user x day summary structs and a <=36-integer grid, never raw
  events) — measured as credit-read wall over 1x vs Nx replicated
  events (shifted user keys, the scale_probe fact isometry).

Ledgers land under /tmp (never in the read-only testdata tree) and are
rebuilt per run. Output: one JSON line per measurement (stdout).

Usage:
  python tools/store_econ_probe.py [--sf /root/testdata/sf0.01]
      [--modes bloom,dsir,markov] [--mult 10] [--reps 3]
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
        data = (
            ev
            if m == 1
            else ev.crossJoin(
                spark.range(m).withColumnRenamed("id", "copy")
            ).select(
                (F.col("event_id") + F.col("copy") * ID_STRIDE).alias("event_id"),
                (F.col("user_id") + F.col("copy") * ID_STRIDE).alias("user_id"),
                "ts",
                "event_type",
                "value",
                "props",
            )
        ).persist()
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--modes", default="bloom,dsir,markov")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("store_econ_probe")
    modes = set(args.modes.split(","))
    if "bloom" in modes:
        probe_bloom(spark, args.sf, args.reps)
    if "dsir" in modes:
        probe_dsir(spark, args.sf, args.reps)
    if "markov" in modes:
        probe_markov(spark, args.sf, args.mult, args.reps)


if __name__ == "__main__":
    main()
