"""dedup_graph_pagerank + corpus_final_selection invariants.

Oracle rows pin exact values; these tests pin the *semantic* invariants a
value-hash can't express: rank-mass conservation under damping, stage
partitioning, and cap enforcement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans import all_specs
from tests.conftest import SF_SMOKE


def test_pagerank_mass_and_positivity(spark):
    rows = all_specs()["dedup_graph_pagerank"].builder(spark, SF_SMOKE).collect()
    assert rows, "empty dedup graph at smoke SF"
    assert all(r.pagerank > 0 and r.degree >= 1 for r in rows)
    total = sum(r.pagerank for r in rows)
    # fixed-point floor division can only LOSE mass, never create it;
    # 3 iterations on a small graph keep the loss well under 5%
    assert 0.95 <= total <= 1.0 + 1e-9, total
    # within a symmetric 2-clique (degree-1 pair linked to each other),
    # both endpoints must get identical rank — quick structural sanity
    by_rank: dict[float, int] = {}
    for r in rows:
        by_rank[r.pagerank] = by_rank.get(r.pagerank, 0) + 1
    assert max(by_rank.values()) >= 2, "no symmetric pair got equal rank"


def test_final_selection_partitions_and_caps(spark):
    sel = all_specs()["corpus_final_selection"].builder(spark, SF_SMOKE).collect()
    docs_n = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(sel) == docs_n, "every document must receive exactly one stage"
    stages = {r.stage for r in sel}
    assert stages <= {"selected", "dropped_curation", "dropped_cap"}
    # the cap bounds selected docs per source at K=50
    per_src: dict[str, int] = {}
    for r in sel:
        if r.stage == "selected":
            per_src[r.source] = per_src.get(r.source, 0) + 1
    assert per_src and all(v <= 50 for v in per_src.values())
    # consistency with the verdict it composes: selected+dropped_cap == kept
    kept = sum(
        1 for r in all_specs()["corpus_keep_decision"].builder(spark, SF_SMOKE).collect() if r.keep
    )
    assert sum(1 for r in sel if r.stage != "dropped_curation") == kept
