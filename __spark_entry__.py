"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered capability from
``data_ingestion_lambda_spark.plans`` (SURVEY.md §2 inventory) for the
driver's DuckDB-oracle comparison at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_lambda_spark.plans import ordered_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    specs = ordered_specs()
    return specs["q01_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's first-50 correctness window covers every
    operator category (plans.DRIVER_PRIORITY); same-shape variants
    overflow past 50 and are verified by tools/check_oracle.py."""
    return {name: spec.builder for name, spec in ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in ordered_specs().items() if spec.oracle is not None
    }
