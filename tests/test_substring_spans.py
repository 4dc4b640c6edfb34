"""Semantics of the exact substring-span dedup (plans/llm_ops.py::substring_spans).

Handcrafted documents with KNOWN shared token runs pin the gaps-and-islands
merge: span length, run splitting across a gap, the doc-frequency boilerplate
guard, and the a<b orientation.
"""

from __future__ import annotations

from data_ingestion_lambda_spark.plans.llm_ops import substring_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_single_shared_run_span_length(spark):
    """Docs sharing exactly one 12-token run report span 12, one island."""
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, f"a0 a1 a2 {shared} a3 a4"),
        (2, f"b0 {shared} b1 b2 b3 b4"),
    ]
    got = substring_spans(_docs(spark, rows), k=4, min_span=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["max_span_tokens"] == 12
    assert r["n_spans"] == 1
    assert r["dup_tokens"] == 12


def test_gap_splits_runs_into_two_islands(spark):
    """A one-token edit inside a long shared region splits it into two runs
    (the ExactSubstr property: spans are EXACT, not fuzzy)."""
    left = " ".join(f"s{i}" for i in range(10))
    right = " ".join(f"t{i}" for i in range(10))
    rows = [
        (1, f"{left} X {right}"),
        (2, f"{left} Y {right}"),
    ]
    got = substring_spans(_docs(spark, rows), k=4, min_span=10).collect()
    assert len(got) == 1
    r = got[0]
    assert r["max_span_tokens"] == 10
    assert r["n_spans"] == 2
    assert r["dup_tokens"] == 20


def test_below_threshold_pairs_are_dropped(spark):
    shared = " ".join(f"s{i}" for i in range(6))  # span 6 < min_span 10
    rows = [
        (1, f"a0 a1 a2 a3 {shared}"),
        (2, f"{shared} b0 b1 b2 b3"),
    ]
    assert substring_spans(_docs(spark, rows), k=4, min_span=10).count() == 0


def test_boilerplate_df_cap_suppresses_hot_shingles(spark):
    """A run present in MORE than max_df docs is boilerplate: its shingles
    are dropped, so no pair qualifies through it."""
    boiler = " ".join(f"h{i}" for i in range(12))
    rows = [(i, f"{boiler} u{i}a u{i}b u{i}c u{i}d") for i in range(1, 6)]
    # df = 5 docs > max_df = 4 -> suppressed entirely
    assert (
        substring_spans(_docs(spark, rows), k=4, min_span=10, max_df=4).count() == 0
    )
    # raising the cap to 5 restores all C(5,2) = 10 pairs
    got = substring_spans(_docs(spark, rows), k=4, min_span=10, max_df=5)
    assert got.count() == 10
    assert all(r["max_span_tokens"] == 12 for r in got.collect())


def test_short_docs_do_not_crash(spark):
    """Docs shorter than k tokens produce no shingles (guarded sequence)."""
    rows = [(1, "a b"), (2, "a b"), (3, "x")]
    assert substring_spans(_docs(spark, rows), k=4, min_span=4).count() == 0
