#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the flagship queries.

The repo's scale claims live in plan shapes — pushdown reaching the scan,
partial aggregation before exchanges, broadcasts on bounded sides, no
stray shuffles. This tool materializes those shapes so a reviewer can
read them without running Spark:

    python tools/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_lambda_spark import get_spark
from data_ingestion_lambda_spark.plans import all_specs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, the property the plan must show)
FLAGSHIPS = [
    ("q01_pricing_summary", "partial_sum/avg before ONE exchange; scan reads only the 7 needed columns"),
    ("filter_pushdown_scan", "PushedFilters reach the parquet scan; ReadSchema is pruned"),
    ("join_broadcast_dims", "dimension sides arrive as BroadcastExchange, fact side unshuffled"),
    ("agg_salted_skew", "two-stage exchange: (key, _salt) partial then key-only final"),
    ("dedup_minhash_lsh", "band-bucket equi-join on signatures; text never shuffles"),
    ("text_chunk_documents", "zero Exchange operators — scan-parallel end to end"),
    ("events_resample_hourly_ff", "grid bounds broadcast; single (type, hour) rollup exchange"),
    ("scd2_user_segments", "lag + lead share one user_id hashpartitioning"),
    ("profile_table", "hash-path Expand distincts cross-joined with 1-row min/max agg"),
    ("upsert_last_writer_wins", "window dedup partitions on the merge key only"),
    ("decontaminate_against_eval", "gram-hash semi-join vs distinct eval grams; no cartesian anywhere"),
    ("materialize_packed_sequences", "one source exchange shared by running-sum window and bin agg; sorted collect"),
    ("scalar_variant", "parse_json once per row; variant_get extractions stay in one scan-parallel agg"),
    ("events_funnel", "ONE user_id exchange, ObjectHashAggregate with partial collect — zero Window operators (r6 rewrite)"),
    ("events_interarrival_hist", "bucket rollup with partial_count before its exchange; cumulative window sees bucket rows only"),
    ("dedup_incremental_embedding", "one (band, grp) exchange into FlatMapGroupsInPandas — candidate pairs never exist as join rows"),
    ("search_bm25_topk", "query term bag broadcasts into the postings join; exact-long score contributions partial-sum map-side; corpus stats cross-join as a broadcast 1-row aggregate, zero plan-build driver jobs (r7, stats in-plan r11)"),
    ("search_hybrid_rrf", "fusion is a Union of two top-k lists + grouped integer sum — zero joins added beyond the retrievers' own (r7)"),
    ("events_markov_transitions", "one user-keyed adjacency window; persisted matrix read by both consumers; broadcast normalize (late r7)"),
    ("events_distribution_drift", "persisted (type, day, bucket) histogram feeds self-join + totals; raw events scanned once (late r7)"),
    ("shipping_latency_quantiles", "orderkey fact join, then day-bucket rollup + group-partitioned cumulative window — no exact percentile (late r7)"),
    ("events_asof_join_nearest", "backward+forward frames over ONE user exchange; winner picked row-locally (late r7)"),
    ("feature_scale_numeric", "3-row group-stats aggregate broadcast back over the scan; no second fact exchange (late r7)"),
    ("feature_quantile_bucketize", "coarse-bounded two-phase cumsum; 9-cut array broadcast into a codegen filter-count assignment (late r7)"),
    ("events_autocorrelation", "volume collapses in the first partial_count rollup; lag self-join sees calendar rows only (late r7)"),
    ("feature_point_in_time", "all 7 cumulative moments + last-event struct max in ONE Window over one user exchange (late r7)"),
    ("profile_heavy_hitters_mg", "Misra-Gries partials shuffle <=K rows per partition; global reduce windows only the summary (late r7)"),
    ("er_resolve_customers", "ER candidates via block-key equi-join (nation, segment, balance prefix) — never all-pairs; lev inside the join (late r7)"),
    ("feature_negative_sampling", "hash-drawn candidates; part-rank index broadcast; interactions distinct-reduced before the anti-join (late r7)"),
    ("ann_hard_negatives_ivf", "candidates from the probed-cell equi-join (never corpus x queries); ceiling filter before the per-query window (r8)"),
    ("events_dau_wau_mau", "presence pairs explode in-row to their <=30 covered days and equi-group; only nested-loop is the broadcast day-spine semi join (r8)"),
    ("sample_recency_decayed", "pure scan-stage filter: no exchange, join, window, or sort anywhere (r8)"),
    ("events_attribution_last_touch", "ONE user exchange; last click rides a running struct max — no purchase x clicks join (r8)"),
    ("agg_market_basket", "pair candidates bounded by within-order self-join; marginals one part-keyed agg; top-k after support filter (r8)"),
    ("events_user_lorenz", "cumulative window runs over the count-of-counts spectrum, never a global user sort (r8)"),
    ("profile_heavy_hitters_cms", "d x w grid aggregates map-side; probes join the broadcast grid (r8)"),
    ("events_attribution_shapley", "one cached user-keyed rollup (single events scan) feeds the constant 8-row coalition walk; coalition joins are hinted BroadcastNestedLoop, never CartesianProduct (r9, hint r10)"),
    ("dedup_bloom_screen", "corpus probes join the broadcast 128-word filter in the scan stage; no sort-merge anywhere (r9)"),
    ("text_dsir_weights", "doc-keyed feature aggregate; the 1024-row bits model broadcasts into the scoring join; totals in-plan via a 1-row broadcast, no collect (r9, r10)"),
    ("eval_binary_auc", "rank-sum AUC: corpus collapses to distinct-score rows before the only ordered walk (r9)"),
    ("search_mrr_ndcg_bm25", "planted docs union into the scan; the metric wrapper runs on |queries|*k rows after the retriever's own plan (r10)"),
    ("profile_ks_statistic", "two per-value partial aggregates merge full-outer; the CDF walk and supremum see value-domain rows only (r10)"),
    ("eval_regression_metrics", "group means (<=5 rows) and the global mean (1 row) broadcast back over the scan; one map-side-combinable final aggregate (r10)"),
    ("profile_chi_square", "one (a, b) rollup off the scan; grid completion, marginals and the wide divmod arithmetic all run on contingency-cell rows (r10)"),
    ("events_ab_cuped", "one user groupBy ledger; theta's co-moment agg and the variant rollup are re-aggregations of it, broadcast back (r10)"),
    ("eval_confusion_multiclass", "centroids from a posexplode rollup re-assembled and BROADCAST; classification is one codegen zip_with scan, no vector shuffle (r10)"),
    ("corpus_temperature_mix", "source-keyed token aggregate + 1-row broadcast total; weights/epochs are row-local decimal arithmetic (r10)"),
    ("ann_ivf_topk_c32", "sized 32-cell quantizer: broadcast-centroid argmax assignment; probe fans each query to n_probe cells via equi-join — identical shape to the 16-cell lane, only the knob moved (r11)"),
]


def main() -> None:
    spark = get_spark("dump_plans")
    specs = all_specs()
    print("# PLANS — formatted physical plans for the flagship queries")
    print()
    print(f"Generated by `python tools/dump_plans.py` at sf_dir={SF_DIR}.")
    print("Each section states the property the plan exists to demonstrate;")
    print("regenerate after plan-affecting changes (the plan-shape tests in")
    print("`tests/` enforce the properties; this file makes them readable).")
    for name, claim in FLAGSHIPS:
        df = specs[name].builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip volatile ids/paths so regeneration diffs stay reviewable
        plan = re.sub(r"#\d+L?", "#_", plan)
        plan = re.sub(r"file:[^\],\s]+", "file:<sf_dir>", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=_", plan)
        print()
        print(f"## {name}")
        print()
        print(f"**Property:** {claim}")
        print()
        print("```")
        print(plan.rstrip())
        print("```")


if __name__ == "__main__":
    main()
