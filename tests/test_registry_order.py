"""Lock the driver-facing registration contract.

The correctness driver verifies only the FIRST 50 entries of
``__spark_entry__.queries()``; these tests guarantee that window always
covers every operator category and that the entry-point ordering matches
``plans.DRIVER_PRIORITY`` exactly. Pure-Python — no SparkSession needed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_ingestion_lambda_spark.plans import DRIVER_PRIORITY, all_specs

# Every operator category must have >= 1 query in the driver's window.
CATEGORY_PREFIXES = (
    "join_",
    "agg_",
    "win_",
    "setop_",
    "scalar_",
    "subq_",
    "text_",
    "dedup_",
    "ann_",
    "media_",
    "events_",
    "upsert_",
    "source_",
    "split_",
)


def test_priority_is_exactly_the_driver_window():
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50, "duplicates in DRIVER_PRIORITY"


def test_queries_order_starts_with_priority():
    names = list(entrymod.queries())
    assert names[:50] == list(DRIVER_PRIORITY)
    # nothing registered gets dropped
    assert set(names) == set(all_specs())


def test_every_category_inside_window():
    window = set(DRIVER_PRIORITY)
    for prefix in CATEGORY_PREFIXES:
        assert any(n.startswith(prefix) for n in window), f"no {prefix}* query in first 50"
    assert "q01_pricing_summary" in window


def test_every_query_has_oracle_or_is_known_rows_only():
    specs = all_specs()
    no_oracle = sorted(n for n, s in specs.items() if s.oracle is None)
    # Each entry here is a DELIBERATE rows-only query with the reason on
    # its registration; anything else landing here is a missing oracle.
    known_rows_only = [
        # HLL sketch distincts cannot hash-match another engine; the exact
        # twins (events_retention_cohorts / profile_table) carry the
        # value-hash evidence for these sketch variants.
        "events_retention_cohorts_approx",
        "profile_table_approx",
    ]
    assert no_oracle == known_rows_only
