"""Shared helpers for query builders."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_lambda_spark.sources.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
