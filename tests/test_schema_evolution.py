"""Additive schema evolution on the parquet upsert target
(operators/upsert.py::_align_schemas).

Contract: a new batch column widens the table (old rows read NULL); a
column the producer stopped sending survives with NULLs on new rows;
a type change on a shared column is rejected loudly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.upsert import upsert_into_parquet

KEYS = ["date", "client_code"]


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "updated_at", F.to_timestamp("updated_at")
    )


_BASE = "date string, client_code string, total_consumed_tokens long, updated_at string"
_WIDE = (
    "date string, client_code string, total_consumed_tokens long, "
    "region string, updated_at string"
)


def test_new_column_widens_table_and_old_rows_read_null(spark, tmp_path):
    target = str(tmp_path / "t")
    upsert_into_parquet(
        spark, target, _mk(spark, [("2025-06-01", "A", 1, "2025-06-01 00:00:00")], _BASE),
        keys=KEYS,
    )
    upsert_into_parquet(
        spark,
        target,
        _mk(spark, [("2025-06-02", "B", 2, "eu", "2025-06-02 00:00:00")], _WIDE),
        keys=KEYS,
    )
    got = {
        r.client_code: (r.total_consumed_tokens, r.region)
        for r in spark.read.option("mergeSchema", "true").parquet(target).collect()
    }
    assert got == {"A": (1, None), "B": (2, "eu")}


def test_evolved_column_updates_through_the_merge(spark, tmp_path):
    """The same key re-merged after evolution: the new column's value wins
    per LWW, proving evolution composes with the merge, not just append."""
    target = str(tmp_path / "t")
    upsert_into_parquet(
        spark, target, _mk(spark, [("2025-06-01", "A", 1, "2025-06-01 00:00:00")], _BASE),
        keys=KEYS,
    )
    upsert_into_parquet(
        spark,
        target,
        _mk(spark, [("2025-06-01", "A", 5, "us", "2025-06-01 01:00:00")], _WIDE),
        keys=KEYS,
    )
    rows = spark.read.option("mergeSchema", "true").parquet(target).collect()
    assert len(rows) == 1 and (rows[0].total_consumed_tokens, rows[0].region) == (5, "us")


def test_dropped_column_is_preserved_with_nulls(spark, tmp_path):
    target = str(tmp_path / "t")
    upsert_into_parquet(
        spark,
        target,
        _mk(spark, [("2025-06-01", "A", 1, "eu", "2025-06-01 00:00:00")], _WIDE),
        keys=KEYS,
    )
    # the producer stops sending region; same date so the merge must align
    upsert_into_parquet(
        spark, target, _mk(spark, [("2025-06-01", "B", 2, "2025-06-01 01:00:00")], _BASE),
        keys=KEYS,
    )
    got = {r.client_code: r.region for r in spark.read.parquet(target).collect()}
    assert got == {"A": "eu", "B": None}, "history must never be dropped by a producer change"


def test_type_change_is_rejected_loudly(spark, tmp_path):
    target = str(tmp_path / "t")
    upsert_into_parquet(
        spark, target, _mk(spark, [("2025-06-01", "A", 1, "2025-06-01 00:00:00")], _BASE),
        keys=KEYS,
    )
    bad = "date string, client_code string, total_consumed_tokens string, updated_at string"
    with pytest.raises(ValueError, match="incompatible schema evolution"):
        upsert_into_parquet(
            spark,
            target,
            _mk(spark, [("2025-06-01", "A", "one", "2025-06-01 01:00:00")], bad),
            keys=KEYS,
        )
