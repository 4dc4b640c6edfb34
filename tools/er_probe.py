#!/usr/bin/env python
"""Scale evidence for the two customer-table lanes the main scale_probe
cannot cover (it passes dimension tables through unchanged):

  er_resolve_customers      — entity resolution over replicated customers
  feature_negative_sampling — hash-drawn negatives over replicated
                              customers + their orders/lineitem facts

Replication isometry (the scale_probe discipline, adapted per lane):
copies must be isomorphic but MUTUALLY NON-INTERACTING, so measured
growth is the engine's, not output-structure growth.

- ER blocks on (c_nationkey, c_mktsegment, bal_pfx); identical copies
  would share every block and the candidate join would grow
  quadratically. Copy i therefore shifts c_nationkey by i*25 (the key
  is only ever used for equality blocking, so the shift is an
  isomorphism) and c_custkey by i*ID_STRIDE — blocks are copy-disjoint,
  candidate pairs scale exactly xMULT, and each copy plants the same
  1-in-13 typo'd re-registrations the lane itself synthesizes.
- Negative sampling draws K hash candidates per customer and anti-joins
  the customer's own interactions. Copy i shifts c_custkey /
  o_orderkey / o_custkey / l_orderkey by i*ID_STRIDE (the scale_probe
  fact shift — customers stay attached to their own copy's orders);
  the part CATALOG passes through unchanged, exactly how a recsys
  corpus grows 100x users over the same item set.

Usage:  python tools/er_probe.py [--er-mults 10,300] [--ns-mults 10,100]
Output: one JSON line per (lane, mult) + a summary line per lane.
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
from data_ingestion_lambda_spark.plans import all_specs

BASE = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/er_probe"
ID_STRIDE = 100_000_000  # scale_probe's stride: far above any real key
NATION_STRIDE = 25  # TPC-H nation domain is 0..24


def _replicate_er(spark, out: str, mult: int) -> None:
    cust = spark.read.parquet(f"{BASE}/customer.parquet")
    copies = [
        cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * ID_STRIDE))
        .withColumn("c_nationkey", F.col("c_nationkey") + F.lit(i * NATION_STRIDE))
        for i in range(mult)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(f"{out}/customer.parquet")


def _replicate_ns(spark, out: str, mult: int) -> None:
    shifts = {
        "customer": ("c_custkey",),
        "orders": ("o_orderkey", "o_custkey"),
        "lineitem": ("l_orderkey",),
    }
    for name, keys in shifts.items():
        t = spark.read.parquet(f"{BASE}/{name}.parquet")
        copies = []
        for i in range(mult):
            c = t
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * ID_STRIDE))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    # the part CATALOG passes through: 100x customers, same items
    spark.read.parquet(f"{BASE}/part.parquet").write.mode("overwrite").parquet(
        f"{out}/part.parquet"
    )


def _time_query(spark, name: str, sf_dir: str, passes: int = 2) -> float:
    spec = all_specs()[name]
    best = None
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.time()
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 2)
        best = dt if best is None else min(best, dt)
    return best


def _run_lane(spark, lane: str, mults: list[int], replicate) -> None:
    t1 = _time_query(spark, lane, BASE)
    print(json.dumps({"query": lane, "mult": 1, "t_s": t1}), flush=True)
    ratios = {}
    for m in mults:
        out = f"{OUT_ROOT}/{lane}_{m}x"
        if not os.path.exists(out):
            replicate(spark, out, m)
        tm = _time_query(spark, lane, out)
        ratios[m] = round(tm / max(t1, 0.01), 2)
        print(
            json.dumps({"query": lane, "mult": m, "t_s": tm, "ratio": ratios[m]}),
            flush=True,
        )
    verdict = {
        m: ("linear-or-better" if r <= m else "SUPERLINEAR") for m, r in ratios.items()
    }
    print(json.dumps({"query": lane, "ratios": ratios, "verdicts": verdict}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--er-mults", default="10,300")
    ap.add_argument("--ns-mults", default="10,100")
    ap.add_argument("--wipe", action="store_true", help="rebuild replicas")
    args = ap.parse_args()
    if args.wipe:
        shutil.rmtree(OUT_ROOT, ignore_errors=True)

    spark = get_spark("er_probe")
    if args.er_mults:
        _run_lane(
            spark,
            "er_resolve_customers",
            [int(m) for m in args.er_mults.split(",")],
            _replicate_er,
        )
    if args.ns_mults:
        _run_lane(
            spark,
            "feature_negative_sampling",
            [int(m) for m in args.ns_mults.split(",")],
            _replicate_ns,
        )


if __name__ == "__main__":
    main()
