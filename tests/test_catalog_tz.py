"""A foreign session with a non-UTC timezone must still get UTC-correct
day/window boundaries from catalog frames: load_table pins the session to
UTC (logged when it clobbers a real non-UTC setting) because catalog
frames are lazy and TZ-sensitive expressions resolve at execution time."""

from __future__ import annotations

import warnings

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _day_counts(spark):
    df = load_table(spark, SF, "events")
    return sorted(
        (str(r["d"]), r["n"])
        for r in df.groupBy(F.to_date("ts").alias("d")).agg(F.count("*").alias("n")).collect()
    )


def test_non_utc_session_gets_utc_boundaries_and_warns(spark):
    baseline = _day_counts(spark)  # session already UTC-pinned

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            shifted = _day_counts(spark)
        assert shifted == baseline, "non-UTC session must not shift day boundaries"
        assert any("overriding session timeZone" in str(w.message) for w in caught)
        # the pin persists (lazy frames need it at execution time)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
