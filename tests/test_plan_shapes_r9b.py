"""Plan-shape pins for the round-9 lanes: the Bloom screen's probe must
stay a broadcast join (never shuffle the corpus against the 128-word
filter), DSIR's scoring join must broadcast the 1024-row model, and the
Shapley lane's only DATA-sized exchange must be the user rollup (the
coalition walk is constant-size)."""

from __future__ import annotations

import re

from data_ingestion_lambda_spark.plans import all_specs

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_screen_probe_is_broadcast(spark):
    """dedup_bloom_screen: both the word probe and the exact-member
    check broadcast filter-sized tables; the documents side must never
    sort-merge against them."""
    plan = _plan(spark, "dedup_bloom_screen")
    assert "BroadcastExchange" in plan, f"filter broadcast missing:\n{plan[:2000]}"
    assert "SortMergeJoin" not in plan, (
        f"corpus shuffled against a KB-scale filter:\n{plan[:3000]}"
    )
    assert "CartesianProduct" not in plan


def test_dsir_scoring_joins_broadcast_model(spark):
    """text_dsir_weights: the bits model is <=1024 rows — the scoring
    join must broadcast it, and the only data-sized exchanges are the
    doc-keyed feature aggregates."""
    plan = _plan(spark, "text_dsir_weights")
    assert "BroadcastHashJoin" in plan, f"model broadcast missing:\n{plan[:2000]}"
    assert "SortMergeJoin" not in plan, (
        f"features sort-merged against the 1024-row model:\n{plan[:3000]}"
    )


def test_shapley_single_user_exchange(spark):
    """events_attribution_shapley: ONE hash exchange keyed by user_id is
    the lane's only data-sized shuffle; every other exchange operates on
    the <=8-row coalition table or the 3-row channel table."""
    plan = _plan(spark, "events_attribution_shapley")
    # the builder collects the <=8 coalition rows eagerly (ONE user
    # exchange in that job) and the returned plan works off the local
    # relation: no events scan, no user exchange, no cache pinned
    assert "FileScan" not in plan, f"events re-scanned:\n{plan[:3000]}"
    assert "hashpartitioning(user_id" not in plan
    assert "InMemoryTableScan" not in plan, "nothing should be block-cached"
    # a CartesianProduct over the 3-row channel x 8-row coalition LOCAL
    # relations is fine — the no-FileScan assertion above is what keeps
    # anything data-sized out of it


def test_markov_rollup_is_user_keyed(spark):
    """events_attribution_markov: the builder's Spark side (the
    transition-count rollup feeding the 36-integer collect) runs the
    journey windows off user-keyed exchanges — no global window, no
    cartesian."""
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.plans._util import t

    # reconstruct the rollup plan the builder collects (the registered
    # builder returns a createDataFrame result, whose plan is a local
    # scan — the shape worth pinning is the aggregation feeding it)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = t(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "event_type", us.alias("ts_us")
    )
    touches = e.filter(F.col("event_type").isin("view", "click", "signup"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = touches.select("user_id", F.lag("event_type").over(w).alias("prev"))
    plan = seq._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "hashpartitioning(user_id" in plan
    assert re.search(r"Window \[lag\(.*\bwindowspecdefinition\(user_id", plan), (
        f"journey window must partition by user:\n{plan[:2000]}"
    )


def test_runtime_bloom_filter_join_pruning_available(spark):
    """Catalyst's runtime bloom-filter injection (InjectRuntimeFilter)
    works on this engine's join shapes: a selective dimension filter
    sprouts a might_contain probe on the fact side, pruning fact rows
    BEFORE the shuffle. At toy scale the size thresholds suppress it
    (rightly — the filter costs more than it saves), so the test
    lowers the application-side threshold to prove the capability; at
    100 TB the DEFAULT thresholds enable it on exactly this shape."""
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.plans._util import t

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        li = t(spark, SF_SMOKE, "lineitem")
        o = t(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, (
            f"runtime bloom filter not injected:\n{plan[:3000]}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
