#!/usr/bin/env python
"""Bloom FP-rate probe — VERDICT r9 #2 "done" evidence.

Round 9's 100x scale point showed the DEFAULT m=4096 filter saturating
at ~25k members (flags everything). This probe re-runs the same 100x
replica (scale_probe's prefix-rotation build, so member slices replicate
proportionally) and measures the FALSE-POSITIVE rate of BOTH lanes from
their own output columns (bloom_hit vs exact_member — the self-auditing
design): the default lane shows the saturation, the SIZED lane
(m=2^20, k=5) shows FP restored by sizing alone, with the identical
broadcast-probe plan.

Usage:  python tools/bloom_fp_probe.py [--mult 100] [--base /root/testdata/sf0.1]
Output: one JSON line per (lane, scale) with member/hit/FP counts + wall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_lambda_spark import get_spark
from data_ingestion_lambda_spark.plans import all_specs
from tools.scale_probe import build_replicated

LANES = ("dedup_bloom_screen", "dedup_bloom_screen_sized")


def measure(spark, specs, sf_dir: str, name: str, scale: str) -> dict:
    t0 = time.time()
    agg = (
        specs[name]
        .builder(spark, sf_dir)
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("exact_member").cast("long")).alias("members"),
            F.sum(F.col("bloom_hit").cast("long")).alias("hits"),
            F.sum(
                (F.col("bloom_hit") & ~F.col("exact_member")).cast("long")
            ).alias("false_pos"),
        )
        .collect()[0]
    )
    wall = round(time.time() - t0, 2)
    spark.catalog.clearCache()
    non_members = agg.docs - agg.members
    out = {
        "lane": name,
        "scale": scale,
        "docs": agg.docs,
        "members": agg.members,
        "bloom_hits": agg.hits,
        "false_pos": agg.false_pos,
        "fp_rate": round(agg.false_pos / non_members, 6) if non_members else None,
        "wall_sec": wall,
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--out", default="/tmp/bloom_fp_probe_data")
    args = ap.parse_args()

    spark = get_spark("bloom-fp-probe")
    specs = all_specs()
    for lane in LANES:
        measure(spark, specs, args.base, lane, "1x")
    build_replicated(spark, args.base, args.out, args.mult)
    for lane in LANES:
        measure(spark, specs, args.out, lane, f"{args.mult}x")


if __name__ == "__main__":
    main()
