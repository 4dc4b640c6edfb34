"""Misra-Gries heavy-hitter sketch: the mergeable-summaries guarantee
(every item above the support threshold survives the merged sketch with
an undercount <= N/(K+1)) must hold under ANY partitioning of the input
— partition count and item placement change sketch CONTENT, never the
gauge booleans. The registered lane pins the default partitioning via
its oracle; this file adversarially repartitions THROUGH the lane's own
mg_sketch pipeline (one implementation to trust).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans import all_specs
from data_ingestion_lambda_spark.plans.profiling import (
    _HH_K,
    _hh_exact_counts,
    _hh_items,
    mg_sketch,
)

from .conftest import SF_SMOKE


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
        sketch = {r.item: r.g for r in mg_sketch(layout).collect()}
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
