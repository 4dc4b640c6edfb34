"""Parquet aggregate pushdown: MIN/MAX/COUNT served from footer statistics.

`spark.sql.parquet.aggregatePushdown` + the V2 parquet source answer
stats-only queries from row-group metadata without scanning data pages —
at 100 TB the difference between a metadata read and a full-table scan
for "how many rows / what's the key range". `useV1SourceList` is a
STATIC conf, so the demonstration runs in a subprocess JVM; the test
pins both the plan (PushedAggregation carries the aggregates) and the
values against the shared session's normal scan.
"""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql import functions as F

from .conftest import SF_SMOKE

_CHILD = f"""
import json, re, sys
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[2]")
  .config("spark.sql.parquet.aggregatePushdown", "true")
  .config("spark.sql.sources.useV1SourceList", "")
  .config("spark.ui.enabled", "false")
  .getOrCreate())
df = spark.read.parquet("{SF_SMOKE}/lineitem.parquet")
q = df.agg(F.count("*").alias("n"),
           F.min("l_orderkey").alias("mn"),
           F.max("l_partkey").alias("mx"))
plan = q._jdf.queryExecution().executedPlan().toString()
m = re.search(r"PushedAggregation: \\[[^\\]]*\\]", plan)
row = q.collect()[0]
print(json.dumps({{"pushed": m.group(0) if m else None,
                   "n": row["n"], "mn": row["mn"], "mx": row["mx"]}}))
"""


def test_stats_only_query_is_served_from_parquet_footers(spark):
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    pushed = got["pushed"]
    assert pushed and "COUNT(*)" in pushed and "MIN(l_orderkey)" in pushed and (
        "MAX(l_partkey)" in pushed
    ), f"aggregates not pushed: {pushed}"
    # values equal the ordinary scan's answer in the shared session
    want = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .agg(F.count("*"), F.min("l_orderkey"), F.max("l_partkey"))
        .collect()[0]
    )
    assert (got["n"], got["mn"], got["mx"]) == (want[0], want[1], want[2])
