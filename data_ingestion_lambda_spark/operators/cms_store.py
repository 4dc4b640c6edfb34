"""Maintained Count-Min sketch store — the PRODUCTION form of
``profile_heavy_hitters_cms`` (plans/profiling.py), and the
no-undercount dual of the Misra-Gries heavy-hitter store
(operators/hh_store.py): MG answers "which items are heavy" with
counters that never OVERcount; CMS answers "how often did THIS item
occur" with estimates that never UNDERcount. A production monitor keeps
both and brackets the truth.

Why the ledger is exact under any split: a CMS table is a d x w grid of
integer cell counts, and the CMS of a union is the CELL-WISE SUM of the
parts' grids — strictly additive, like the feature store's moments, so
N daily applications followed by a read-side sum equals the one-shot
sketch over everything (pinned in tests/test_cms_store.py). No merge
step loses information (unlike MG, whose merge subtracts), so the
ledger read is a plain map-side-combinable aggregate over
d x w x |batches| rows — bounded by the calendar, never by data.

Table layout: ``date=<batch>``-partitioned parquet of (j, bucket, cnt)
cell rows, <= d*w per partition — the batch-id-keyed sink idiom
(replay overwrites only itself; idempotent). Point queries
(``estimate_items``) cost |items| x d probe rows joined against the
summed grid.

Reference intent: the reference's daily loop touches only the new day's
files against its stored table (src/lambda_handler.py:38-102); applied
to frequency monitoring this means each batch is hashed into the grid
exactly once, on the day it arrives.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.upsert import replace_partitions
from data_ingestion_lambda_spark.plans.profiling import cms_counters, cms_estimate


def apply_cms_batch(
    spark: SparkSession, index_dir: str, items: DataFrame, batch_date: str
) -> dict:
    """Land one batch's CMS grid under ``date=<batch_date>``. Idempotent
    per (batch, date)."""
    _dt.date.fromisoformat(batch_date)
    grid = cms_counters(items).withColumn("date", F.lit(batch_date))
    replace_partitions(spark, index_dir, grid, [batch_date])
    return {"index": index_dir, "date": batch_date}


def read_cms(spark: SparkSession, index_dir: str) -> DataFrame:
    """The current grid: cell-wise sum across batch partitions. Works
    over both ledger keyings (CLI date= and the streaming front's
    ingest_batch= partitions)."""
    return (
        spark.read.parquet(index_dir)
        .drop("date", "ingest_batch")
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def estimate_items(
    spark: SparkSession, index_dir: str, items: DataFrame
) -> DataFrame:
    """(item, est) for the distinct query items: min over hash rows of
    the summed grid's cells — never an undercount of the item's true
    total across every applied batch."""
    return cms_estimate(items, read_cms(spark, index_dir))
