"""Window functions (SURVEY.md §2.5 — all EXT, none in the reference).

Ranking, analytic, and frame-based aggregates. Every window orders by a
unique key suffix so results are deterministic; every windowed SUM of
doubles goes through decimal (window frames reassociate otherwise).

Scale note: a window over ``partitionBy(k)`` is one shuffle on ``k`` plus a
per-partition sort — same cost class as a groupBy on ``k``. Skewed
partition keys (one giant customer) are the hazard; AQE does not split
window skew, so key choice matters more than for aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans.decimals import dec
from data_ingestion_lambda_spark.plans.registry import register
from data_ingestion_lambda_spark.plans._util import t


@register(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (the canonical per-group
    top-k: one shuffle on the partition key, no global sort)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"), "rn")
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate)  OVER w AS prev_orderdate,
           LEAD(o_orderdate) OVER w AS next_orderdate,
           CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS INTEGER) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each customer's order history + day deltas."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_orderdate"),
        F.lead("o_orderdate").over(w).alias("next_orderdate"),
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
    FROM orders
    """,
    tags=("window",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (decimal-exact prefix sums)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "win_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           CAST(RANK()       OVER w AS INTEGER) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS bal_dense_rank,
           CAST(NTILE(4)     OVER w AS INTEGER) AS bal_quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS bal_pct_rank
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("window",),
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank over one global ordering.

    (Unpartitioned window = single-task sort; fine for a 100-row dim,
    an anti-pattern for facts — flagged here deliberately.)"""
    s = t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_name",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).cast("double").alias("bal_pct_rank"),
    )


@register(
    "win_sliding_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_3order_sum,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_n
    FROM orders
    """,
    tags=("window",),
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (2 preceding..current) per customer order history.

    Ordered by (o_orderdate, o_orderkey) — a total order; ROWS frames over
    an ambiguous ordering are nondeterministic (lineitem's (orderkey,
    linenumber) is NOT unique in this dataset, found the hard way)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_3order_sum"),
        F.count("*").over(w).alias("frame_n"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_orderdate,
           LAST_VALUE(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_orderdate
    FROM orders
    """,
    tags=("window",),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an explicit full-partition frame."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_orderdate"),
        F.last("o_orderdate").over(w).alias("last_orderdate"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT s_suppkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           COUNT(*) OVER (
               ORDER BY s_acctbal
               RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_500
    FROM supplier
    """,
    tags=("window",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering (peers by value, not row)."""
    s = t(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal").rangeBetween(-500, Window.currentRow)
    return s.select(
        "s_suppkey",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
        F.count("*").over(w).alias("n_within_500"),
    )


@register(
    "win_distribution",
    oracle="""
    SELECT n_name, s_suppkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(nth_value(s_acctbal, 3) OVER (
               PARTITION BY n_name ORDER BY s_acctbal, s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DOUBLE) AS third_lowest
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal, s_suppkey)
    """,
    tags=("window",),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: percent_rank / cume_dist / nth_value
    per nation (the remaining SQL-window functions not covered by the
    ranking/analytic/frame queries). Suppkey tie-break keeps both
    engines' orderings identical; nth_value needs the full-partition
    frame (default frame stops at CURRENT ROW in both engines)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy("s_acctbal", "s_suppkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "s_suppkey",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("s_acctbal", 3).over(wfull).cast("double").alias("third_lowest"),
        )
    )
