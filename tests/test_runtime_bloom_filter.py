"""Runtime bloom-filter join pruning: the 100 TB lever that skips fact
rows before the shuffle when a selective dimension filter exists.

Spark injects `might_contain(bloom_filter(dim_keys))` onto the fact scan
of a shuffle join when the filtered creation side is small and the
application side is large. Production defaults gate on a 10 GB
application-side scan, so test-scale data never triggers it — the test
lowers that gate to 0 to prove the engine path is live with this repo's
session config (AQE on, filter pushdown on), then restores defaults.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_selective_dim_filter_injects_bloom_filter(spark):
    prev_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        # force the shuffle-join path: a broadcast join prunes differently
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "might_contain" in plan or "bloom" in plan
        # and the filter actually runs: result matches the unfiltered-path answer
        rows = j.collect()
        assert len(rows) == 1 and rows[0]["count"] > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_thresh,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
