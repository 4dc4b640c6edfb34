#!/usr/bin/env python
"""Measure the maintained dedup gate's per-day economics: the cost of
probing a FIXED daily batch against a persisted signature index as the
indexed corpus grows 10x.

The claim under operators/dedup_gate.py: a day's cost is the batch's own
signature build + a band join against the stored (doc_id, sig) table —
the corpus's TEXT is never re-read and no old-old pair is enumerated, so
per-day wall should grow far slower than the corpus (only the band
join's index-side scan grows). This script measures exactly that:

  corpus 1x  = sf0.1 documents (5k docs)   -> index, probe fixed batch
  corpus 10x = scale_probe 10x replication -> index, probe same batch

Batch = the sf0.001 documents (500 docs) shifted to fresh doc_ids.
Prints one JSON line per corpus and a summary line.
"""

from __future__ import annotations

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


def main() -> None:
    spark = get_spark("gate_probe")
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select((F.col("doc_id") + BATCH_ID_OFFSET).alias("doc_id"), "text")
        .cache()
    )
    n_batch = batch.count()

    rep_dir = "/tmp/gate_probe_10x"
    if not os.path.exists(f"{rep_dir}/documents.parquet"):
        build_replicated(spark, "/root/testdata/sf0.1", rep_dir, 10)

    results = {}
    for label, src in (("1x", "/root/testdata/sf0.1"), ("10x", rep_dir)):
        corpus = spark.read.parquet(f"{src}/documents.parquet").select("doc_id", "text")
        idx = tempfile.mkdtemp(prefix=f"gate_idx_{label}_")
        try:
            t0 = time.time()
            apply_batch(spark, idx, corpus, "2025-07-01")
            t_index = round(time.time() - t0, 2)

            t_probe = None
            for _ in range(2):
                spark.catalog.clearCache()
                batch.cache().count()
                t0 = time.time()
                n_pairs = probe_batch(spark, idx, batch).count()
                dt = round(time.time() - t0, 2)
                t_probe = dt if t_probe is None else min(t_probe, dt)
            results[label] = {
                "corpus_docs": corpus.count(),
                "t_index_once_s": t_index,
                "t_daily_probe_s": t_probe,
                "probe_pairs": n_pairs,
            }
            print(json.dumps({"corpus": label, **results[label]}), flush=True)
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    r1, r10 = results["1x"], results["10x"]
    print(
        json.dumps(
            {
                "batch_docs": n_batch,
                "corpus_growth": round(r10["corpus_docs"] / r1["corpus_docs"], 1),
                "probe_growth": round(
                    r10["t_daily_probe_s"] / r1["t_daily_probe_s"], 2
                ),
                "index_growth": round(r10["t_index_once_s"] / r1["t_index_once_s"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
