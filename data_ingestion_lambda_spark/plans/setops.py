"""Set operations (SURVEY.md §2.7).

The reference's nearest analogs are O(n²) Python list merges
(src/s3_processor.py:34-37 union-dedup, :176 difference); here they are
the full relational set-op family. Spark plans UNION as a zero-shuffle
concatenation; INTERSECT/EXCEPT become (left-semi/anti) hash joins after
de-duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans.registry import register
from data_ingestion_lambda_spark.plans._util import t


def _year_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")


_Y95 = "SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"
_Y96 = "SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"


@register(
    "setop_union_all",
    oracle=f"SELECT o_custkey FROM ({_Y95} UNION ALL {_Y96})",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no shuffle, plain concatenation)."""
    return _year_custkeys(spark, sf_dir, 1995).unionAll(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_union_distinct",
    oracle=f"{_Y95} UNION {_Y96}",
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set union = concatenation + distinct, one shuffle)."""
    return _year_custkeys(spark, sf_dir, 1995).union(_year_custkeys(spark, sf_dir, 1996)).distinct()


@register(
    "setop_intersect",
    oracle=f"{_Y95} INTERSECT {_Y96}",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    return _year_custkeys(spark, sf_dir, 1995).intersect(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_except",
    oracle=f"{_Y95} EXCEPT {_Y96}",
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — customers active in 1995 but not 1996."""
    return _year_custkeys(spark, sf_dir, 1995).subtract(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_intersect_all",
    oracle=f"{_Y95} INTERSECT ALL {_Y96}",
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — keeps min multiplicity)."""
    return _year_custkeys(spark, sf_dir, 1995).intersectAll(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_except_all",
    oracle=f"{_Y95} EXCEPT ALL {_Y96}",
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity-aware difference)."""
    return _year_custkeys(spark, sf_dir, 1995).exceptAll(_year_custkeys(spark, sf_dir, 1996))


@register(
    "setop_union_by_name",
    oracle="""
    SELECT k AS entity_key, kind FROM (
        SELECT c_custkey AS k, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT s_suppkey AS k, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000
    )
    """,
    tags=("setop",),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union of differently-ordered projections."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("entity_key"), F.lit("customer").alias("kind"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("entity_key"))
    )
    return c.unionByName(s)
