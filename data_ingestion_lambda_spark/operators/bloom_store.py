"""Maintained Bloom-filter store — the PRODUCTION form of
``dedup_bloom_screen`` (plans/llm_ops.py): a membership blocklist that
GROWS daily (new benchmark releases, new opt-out batches, new banned
URLs) without ever rebuilding, because a Bloom filter of a union is the
BITWISE OR of the parts' filters.

Why the ledger is exact under any split: the filter is 128 BIGINT words
and ``bit_or`` is associative, commutative and IDEMPOTENT — so N daily
applications followed by a read-side bit_or equals the one-shot filter
over every member EXACTLY (pinned in tests/test_bloom_store.py), and a
replayed batch is a true no-op even at the bit level (idempotence is
stronger than the CMS store's additivity, which needs replay to
overwrite its own partition to stay exact — this store gets that
protection too, but would survive without it).

Table layout: ``date=<batch>``-partitioned parquet of (word_idx, word)
rows, <= 128 per partition — the batch-id-keyed sink idiom (replay
overwrites only itself). The fold is a <=128*|batches| row aggregate,
bounded by the calendar, never by member count; the probe side is the
lane's own ``bloom_screen`` against the folded words.

Reference intent: the reference's daily loop touches only the new day's
files against stored state (src/lambda_handler.py:38-102); applied to a
blocklist this means each member batch is hashed into the filter once,
on the day it lands, and screening never re-reads member text.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.cms_store import check_keying_marker
from data_ingestion_lambda_spark.operators.upsert import replace_partitions
from data_ingestion_lambda_spark.plans.llm_ops import (
    bloom_screen,
    bloom_words,
    polyhash,
)


def _fps(members: DataFrame) -> DataFrame:
    """Distinct polynomial text fingerprints for a (.., text) DataFrame."""
    return members.select(polyhash(F.col("text")).alias("fp")).distinct()


def apply_bloom_batch(
    spark: SparkSession, index_dir: str, members: DataFrame, batch_date: str
) -> dict:
    """Hash one member batch's texts into filter words and land them
    under ``date=<batch_date>``. Idempotent per (batch, date); refuses
    an index keyed by the streaming front's ``ingest_batch=``."""
    _dt.date.fromisoformat(batch_date)
    check_keying_marker(spark, index_dir, "date")
    words = bloom_words(_fps(members)).withColumn("date", F.lit(batch_date))
    replace_partitions(spark, index_dir, words, [batch_date])
    return {"index": index_dir, "date": batch_date}


def read_bloom(spark: SparkSession, index_dir: str) -> DataFrame:
    """The current filter: bitwise-OR fold across batch partitions —
    exactly the one-shot filter over every applied member. Works over
    both ledger keyings (CLI ``date=`` and a streaming front's
    ``ingest_batch=``)."""
    return (
        spark.read.parquet(index_dir)
        .drop("date", "ingest_batch")
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def screen_docs(
    spark: SparkSession, index_dir: str, docs: DataFrame
) -> DataFrame:
    """(doc_id, bloom_hit) for probe docs (doc_id, text) against the
    folded filter — the lane's own probe path, so store and lane cannot
    diverge. No false negatives over every member ever applied."""
    probes = docs.select("doc_id", polyhash(F.col("text")).alias("fp"))
    return bloom_screen(probes, read_bloom(spark, index_dir))
