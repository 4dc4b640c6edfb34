"""Partition-pruning proof over the upsert sink's date-partitioned layout.

The 100 TB claim behind `PARTITION_COL = date` is that a date-filtered
read lists and scans ONLY the matching partition directories. This pins
the plan property: the filter lands in the scan's PartitionFilters (not a
post-scan Filter) and the scan selects exactly one partition.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.functions.normalize import normalize_consumption
from data_ingestion_lambda_spark.operators.upsert import upsert_into_parquet


def _ingest(spark, target, rows):
    df = spark.createDataFrame(
        rows,
        "date string, client_id string, client_name string, service_name string, "
        "total_consumed_tokens string",
    )
    good, _ = normalize_consumption(
        df.withColumn("_ingest_seq", F.monotonically_increasing_id())
    )
    upsert_into_parquet(spark, target, good)


def test_date_filter_becomes_partition_filter(spark, tmp_path):
    target = str(tmp_path / "consumptions")
    _ingest(
        spark,
        target,
        [
            ("2025-05-01", "CLI001", "TechCorp", "API", "100"),
            ("2025-05-02", "CLI001", "TechCorp", "API", "200"),
            ("2025-05-03", "CLI001", "TechCorp", "API", "300"),
        ],
    )
    q = spark.read.parquet(target).filter(F.col("date") == "2025-05-02")
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "2025-05-02" in m.group(1), f"date filter not pushed to listing:\n{plan}"
    assert q.count() == 1
    # the executed scan must have LISTED only the matching partition:
    # the scan node's numFiles metric counts post-pruning files (1 date
    # dir), not the table's three (inputFiles() would show all three —
    # it ignores partition filters).
    scan = q._jdf.queryExecution().executedPlan().collectLeaves().head()
    num_files = scan.metrics().apply("numFiles").value()
    total_files = len(spark.read.parquet(target)._jdf.inputFiles())
    assert num_files < total_files, (num_files, total_files)
