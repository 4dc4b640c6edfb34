"""Spark 4 Python DataSource API lane (sources/python_datasource.py).

The oracle row (source_python_datasource) pins content against DuckDB;
these tests pin the SOURCE mechanics: partition planning, pushdown-driven
partition pruning (externally observable as planned-partition count),
advisory-pushdown correctness, and determinism across reads.
"""

from __future__ import annotations

import pytest

from data_ingestion_lambda_spark.sources.python_datasource import (
    _rows_for_day,
    register_python_sources,
)


@pytest.fixture()
def source(spark):
    register_python_sources(spark)
    return lambda **opts: spark.read.format("synthetic_events").options(
        **{k: str(v) for k, v in opts.items()}
    ).load()


def test_plans_one_partition_per_day_and_matches_model(source):
    df = source(days=3, rows_per_day=10)
    assert df.rdd.getNumPartitions() == 3
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(row for d in range(3) for row in _rows_for_day(d, 10))
    assert got == want


def test_pushed_day_bounds_prune_partitions(source):
    assert source().filter("day = 2").rdd.getNumPartitions() == 1
    assert source().filter("day >= 1 AND day < 3").rdd.getNumPartitions() == 2
    # advisory pushdown: Spark re-applies the predicate, so a bound that
    # prunes to one partition still filters rows exactly
    rows = source(days=4, rows_per_day=50).filter("day = 2").collect()
    assert len(rows) == 50 and all(r.day == 2 for r in rows)


def test_unpushable_filter_stays_correct_without_pruning(source):
    df = source(days=2, rows_per_day=100).filter("event_type = 'purchase'")
    assert df.rdd.getNumPartitions() == 2, "non-day filters must not prune"
    assert df.count() == sum(
        1 for d in range(2) for row in _rows_for_day(d, 100) if row[3] == "purchase"
    )


def test_reads_are_deterministic(source):
    a = sorted(tuple(r) for r in source().collect())
    b = sorted(tuple(r) for r in source().collect())
    assert a == b and len(a) == 2000


def test_contradictory_bounds_plan_zero_partitions(source):
    df = source().filter("day > 2 AND day < 2")
    assert df.count() == 0
