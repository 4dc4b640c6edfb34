"""Curation suite: semantics + plan-shape pins for the r5 operators.

Three properties matter at 100 TB and are pinned here:
- `text_pii_scrub` stays shuffle-free (regex in the scan pipeline) and
  provably removes every injected marker (residual = 0 on every row);
- `corpus_source_cap` / `pack_sequences` plan exactly ONE exchange — the
  window's source-keyed shuffle is reused by the final aggregation
  (a second exchange would double the job's network cost for nothing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans import all_specs
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_is_shuffle_free_and_leaves_no_residual(spark):
    assert "Exchange" not in _plan(spark, "text_pii_scrub")
    rows = all_specs()["text_pii_scrub"].builder(spark, SF_SMOKE).collect()
    assert rows, "empty corpus"
    for r in rows:
        # injection arithmetic: doc_id % 3 -> email, % 5 -> ip, % 7 -> phone
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0)
        assert r.n_ips == (1 if r.doc_id % 5 == 0 else 0)
        assert r.n_phones == (1 if r.doc_id % 7 == 0 else 0)
        assert r.n_residual == 0
    assert any(r.n_emails for r in rows) and any(r.n_ips for r in rows)


def test_source_cap_and_packing_plan_single_exchange(spark):
    for name in ("corpus_source_cap", "pack_sequences"):
        assert _plan(spark, name).count("Exchange") == 1, name


def test_packing_bins_respect_budget_shape(spark):
    out = all_specs()["pack_sequences"].builder(spark, SF_SMOKE)
    bins = out.collect()
    assert bins
    # every bin is keyed once and carries positive token mass
    assert len({(b.source, b.bin_id) for b in bins}) == len(bins)
    assert all(b.bin_tokens > 0 and b.n_docs > 0 for b in bins)
    # per source, bin ids are the contiguous prefix 0..max (next-fit packing
    # never skips a bin)
    per_src: dict[str, list[int]] = {}
    for b in bins:
        per_src.setdefault(b.source, []).append(b.bin_id)
    for src, ids in per_src.items():
        assert sorted(ids) == list(range(max(ids) + 1)), src
    # total mass conservation vs a direct count
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("s")
    ).collect()[0].s
    assert sum(b.bin_tokens for b in bins) == total
