#!/usr/bin/env python
"""Per-lane optimization probe (round 14): noop-sink wall times + formatted
plans for a named list of lanes, in one warm session — the measure-first
harness behind OPTIMIZATION_r14.md.

    python tools/perf_probe.py --out plans/r14 --suffix before lane1 lane2 ...

For each lane: 1 warm-up run, then N timed noop runs (min reported), and the
.explain("formatted") text written to <out>/<lane>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_lambda_spark import get_spark
from data_ingestion_lambda_spark.plans import all_specs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lanes", nargs="+")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("perf-probe")
    specs = all_specs()

    for name in args.lanes:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = spec.builder(spark, SF_DIR)
        if not args.no_plan:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(args.out, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        samples = []
        for i in range(args.runs + 1):
            t0 = time.time()
            spec.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i > 0:  # discard warm-up
                samples.append(dt)
        print(
            f"{name}: min {min(samples):.3f}s  all {[round(s, 3) for s in samples]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
