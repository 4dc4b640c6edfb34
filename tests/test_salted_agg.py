"""Plan-shape proof for the salted two-phase aggregation.

Correctness (vs the plain GROUP BY oracle) is checked by the harness; this
test pins the *physical* property that makes salting worth doing: the
first exchange partitions on (l_returnflag, _salt) — fanning a hot key
across _N_SALT reducers — and a second exchange merges on l_returnflag
alone.
"""

from __future__ import annotations

import re

from data_ingestion_lambda_spark.plans.relational import agg_salted_skew

SF_DIR = "/root/testdata/sf0.001"


def test_salted_plan_has_two_stage_exchange(spark):
    df = agg_salted_skew(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_salt" in p and "l_returnflag" in p for p in parts), (
        f"no (l_returnflag, _salt) exchange in plan:\n{plan}"
    )
    assert any("_salt" not in p and "l_returnflag" in p for p in parts), (
        f"no final l_returnflag-only exchange in plan:\n{plan}"
    )


def test_salted_matches_unsalted(spark):
    got = {
        r.l_returnflag: (r.n_rows, r.sum_qty, r.max_price)
        for r in agg_salted_skew(spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    from pyspark.sql import functions as F

    exp = {
        r.l_returnflag: (r.n, float(r.sq), r.mp)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sq"),
            F.max("l_extendedprice").alias("mp"),
        )
        .collect()
    }
    assert got == exp


def test_salted_join_fans_key_across_salts(spark):
    """The salted replicate-join's exchange partitions on (key, _salt) and
    no broadcast join sneaks in (the hint pins the shuffled shape the
    pattern exists to fix)."""
    from data_ingestion_lambda_spark.plans.relational import join_salted_skew

    df = join_salted_skew(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_salt" in p and "suppkey" in p for p in parts), (
        f"no (suppkey, _salt) exchange in plan:\n{plan}"
    )
