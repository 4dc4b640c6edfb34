#!/usr/bin/env python
"""Scale-evidence probe for the S7 upsert sink: MERGE cost must depend on
the BATCH's partitions, not the table's total size.

Builds date-partitioned consumption tables with 5 / 50 / 200 historical
dates (same rows per date), then times the same single-date batch MERGE
into each. If partition pruning works, wall-time is ~flat as the table
grows 40×; if the merge read the whole table it would scale with dates.

Usage:  python tools/upsert_probe.py [--rows-per-date 20000]
Output: one JSON line per table size + a summary verdict.
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
from data_ingestion_lambda_spark.operators.upsert import upsert_into_parquet

BASE = "/tmp/upsert_probe"


def make_table(spark, path: str, n_dates: int, rows_per_date: int):
    if os.path.exists(path):
        shutil.rmtree(path)
    df = (
        spark.range(n_dates * rows_per_date)
        .select(
            F.date_add(F.lit("2026-01-01"), (F.col("id") % n_dates).cast("int")).cast(
                "string"
            ).alias("date"),
            (F.col("id") / n_dates).cast("long").alias("client_id"),
            (F.col("id") % 1000).cast("double").alias("consumption"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("updated_at"),
        )
        .withColumn("created_at", F.col("updated_at"))
    )
    df.write.mode("overwrite").partitionBy("date").parquet(path)


def one_date_batch(spark, rows_per_date: int):
    return spark.range(rows_per_date).select(
        F.lit("2026-01-01").alias("date"),
        F.col("id").cast("long").alias("client_id"),
        (F.col("id") % 777).cast("double").alias("consumption"),
        F.to_timestamp(F.lit("2026-06-01 00:00:00")).alias("updated_at"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-date", type=int, default=20000)
    ap.add_argument("--dates", default="5,50,200")
    args = ap.parse_args()

    spark = get_spark("upsert_probe")
    batch = one_date_batch(spark, args.rows_per_date)
    results = {}
    for n_dates in (int(x) for x in args.dates.split(",")):
        path = f"{BASE}/t{n_dates}"
        make_table(spark, path, n_dates, args.rows_per_date)
        # two merges, keep the min (first includes codegen warmup)
        best = None
        for _ in range(2):
            t0 = time.time()
            upsert_into_parquet(spark, path, batch, keys=["date", "client_id"])
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        results[n_dates] = best
        print(json.dumps({"n_dates": n_dates, "merge_sec": best}), flush=True)

    sizes = sorted(results)
    ratio = round(results[sizes[-1]] / results[sizes[0]], 2)
    print(
        json.dumps(
            {
                "rows_per_date": args.rows_per_date,
                "merge_sec_by_table_dates": results,
                "largest_vs_smallest_ratio": ratio,
                "verdict": "partition-pruned (flat)" if ratio < 1.5 else "SCALES WITH TABLE SIZE",
            }
        )
    )


if __name__ == "__main__":
    main()
