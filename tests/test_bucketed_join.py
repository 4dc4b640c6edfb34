"""Bucketing: the co-located-join strategy for repeated big-big joins.

At 100 TB, two fact tables joined repeatedly on the same key should be
written bucketed by that key: every join then reads matching buckets
directly and the per-query shuffle disappears. This test proves the plan
shape — a join of two tables bucketed by the join key contains NO shuffle
exchange (with broadcast disabled to force the merge-join path).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_plans_without_shuffle(spark, tmp_path):
    left = spark.range(0, 20_000).withColumn("amount", F.col("id") % 97)
    right = spark.range(0, 20_000).withColumn("status", (F.col("id") % 3).cast("string"))
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        (
            df.write.bucketBy(8, "id")
            .sortBy("id")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the merge-join path: broadcast would mask the bucket benefit
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # no shuffle anywhere: bucket layout satisfies the join's
        # hash-partitioning requirement on both sides
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert joined.count() == 20_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
