#!/usr/bin/env python
"""Scale-evidence probe: do the dedup/ANN headliners scale ~linearly?

Replicates sf0.1's documents/embeddings MULT× as ISOMORPHIC BUT MUTUALLY
DISSIMILAR universes, runs the headline dedup/ANN queries at 1× and
MULT×, and reports wall-time ratios. A query whose ratio is far above
MULT is superlinear and needs a plan fix or a documented cap.

Replication design (matters!): a naive copy with a per-copy text suffix
keeps copies NEAR-IDENTICAL, so every doc gains ~C(MULT,2) true near-dup
partners and the query OUTPUT grows quadratically — the probe then
measures dup-structure growth, not engine scaling (observed: 16-33×
wall-time at 10× data). Instead each copy i rewrites every token with an
'r{i}_' prefix (documents) / circular-shifts the vector by i (embeddings
— an orthogonal transform): similarity WITHIN a copy is preserved
exactly (token overlap ratios and pairwise cosines are invariant), while
ACROSS copies nothing collides, so true output scales exactly ×MULT and
the wall-time ratio isolates the engine.

The replicated data lands under /tmp (never in the read-only testdata
tree) and is rebuilt on every run — this is a probe, not a dataset.

Usage:  python tools/scale_probe.py [--mult 10] [--base /root/testdata/sf0.1]
Output: one JSON line per query + a summary JSON line (stdout).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_lambda_spark import get_spark
from data_ingestion_lambda_spark.plans import all_specs
from data_ingestion_lambda_spark.sources.catalog import load_table

QUERIES = [
    "dedup_simhash",
    "dedup_simhash_wide",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    # relational / events headliners (round 5): facts replicate with
    # shifted keys — 10x orders from 10x customers, 10x order-lines, 10x
    # events from 10x users — against the SAME dimension catalog, the
    # realistic way a fact table grows 10x.
    "q01_pricing_summary",
    "q09_product_profit",
    "win_topk_per_group",
    "events_sessionize",
    "upsert_last_writer_wins",
    # curation suite (round 5): documents replicate with per-copy token
    # prefixes, so token counts per doc — and therefore packing bins and
    # per-source caps — replicate exactly; scrub regexes are scan-bound.
    "text_pii_scrub",
    "corpus_source_cap",
    "pack_sequences",
    # event analytics (round 5): funnels and cohorts replicate with the
    # shifted user keys — 10x users, same per-user history shape.
    "events_funnel",
    "events_retention_cohorts",
    # late round-5 additions: pipeline composition, graph iteration,
    # robust stats, image-modality dedup
    "corpus_final_selection",
    "dedup_graph_pagerank",
    "events_funnel_users",
    "events_anomaly_mad",
    "sample_weighted",
    "text_token_spectrum",
    "media_phash_candidates",
    "agg_rfm_segmentation",
    "embedding_label_centroids",
    "embedding_label_separation",
    # final round-5 additions: exact-span dedup (positional shingle join),
    # graph triangles, one-pass profiling, salted skew join, PQ ANN
    "dedup_substring_spans",
    "dedup_graph_triangles",
    "profile_table",
    "join_salted_skew",
    "ann_pq_topk",
    # post-brief round-5 additions
    "text_chunk_documents",
    "decontaminate_against_eval",
    "events_user_stats",
    "events_resample_hourly_ff",
    "scd2_user_segments",
    "embedding_drift_splits",
    "corpus_mixture_rates",
    "media_shot_signal",
    "pack_chunked_sequences",
    "profile_key_skew",
    "text_lang_confusion",
    "profile_numeric_histogram",
    "scalar_variant",
    "materialize_packed_sequences",
    "profile_referential_integrity",
    "embedding_kmeans_clusters",
    "sample_cluster_balanced",
    "events_seasonality_profile",
    "events_interarrival_stats",
    # round-6 additions: the distributed percentile lane (histogram
    # twins of the exact-buffer aggregates)
    "events_interarrival_hist",
    "events_anomaly_mad_hist",
    "profile_numeric_quantiles",
    "dedup_incremental_minhash",
    "dedup_incremental_embedding",
    # round-7 addition: the RFM histogram twin (two-phase prefix sum)
    "agg_rfm_segmentation_hist",
    # round-7 additions: corpus-statistics text lanes (token-keyed vocab
    # joins — the prefix-rotated replicas grow the vocab with the corpus)
    "text_unigram_surprisal",
    "text_collocations_lift",
    # late-r7 additions: the search surface (fixed 8-doc query set; the
    # rotated replicas keep candidate volume constant, so these measure
    # the corpus statistics build — see SCALE.md's honest reading)
    "search_bm25_topk",
    "search_hybrid_rrf",
    # late-r7 additions: calendar-bounded time-series lanes (rollup then
    # day-row math), exact-moment statistics (one aggregation each), and
    # bounded-hop BFS over the near-dup graph
    "events_trend_slope",
    "events_ewma_daily",
    "profile_correlation_exact",
    "profile_benford_first_digit",
    "graph_blast_radius",
    "events_markov_transitions",
    "events_changepoint_cusum",
    "graph_contamination_radius",
    "profile_functional_dependencies",
    "events_distribution_drift",
    "events_asof_join_nearest",
    "events_cumulative_reach",
    "shipping_latency_quantiles",
    "dedup_containment",
    "dedup_canonical_by_quality",
    # round-8 addition: IVF-probed hard-negative mining — the scale-safe
    # replacement for the brute-force ann_hard_negatives (3.26x at 10x in
    # the r7 sweep), expected to track ann_ivf_topk's profile
    "ann_hard_negatives_ivf",
    # round-8 lanes: n-gram text (prefix-rotated replicas grow the
    # vocab), event analytics (shifted user/event keys), within-order
    # basket mining, sketch grid, calendar-bounded monitors
    "text_bigram_surprisal",
    "text_top_keywords",
    "corpus_rank_blend",
    "sample_recency_decayed",
    "events_cohort_revenue",
    "events_seasonal_anomaly",
    "events_dau_wau_mau",
    "events_attribution_last_touch",
    "events_attribution_linear",
    "events_user_lorenz",
    "agg_market_basket",
    "profile_null_drift_daily",
    "scd2_as_of_read",
    "profile_heavy_hitters_cms",
    # round-9 lanes: coalition-aggregated Shapley (constant-size stage 2),
    # fixed-bucket DSIR models, constant-size Bloom screen — all expected
    # to track their scan/exchange floor
    "events_attribution_shapley",
    "text_dsir_weights",
    "dedup_bloom_screen",
    "events_attribution_markov",
    "text_bpe_train_merges",
    "profile_contract_violations",
    "eval_binary_auc",
    "eval_precision_recall_curve",
    "agg_pareto_abc",
    # r11 definitive-sweep completion (VERDICT r10 #5): every bench
    # headliner (v1+v2+v3) plus the r11 lanes now runs under the probe
    # (dedup_edit_distance stays in its own --char-rotate mode; the
    # customer-only governance trio keeps its r10 10x-customer isometry
    # measurements -- customer is a PASSTHROUGH dim here).
    "agg_salted_skew",
    "ann_block_matrix_topk",
    "ann_cosine_topk",
    "ann_hard_negatives",
    "ann_lsh_bucketed",
    "corpus_split_assign",
    "corpus_temperature_mix",
    "dedup_bloom_screen_sized",
    "dedup_exact_text",
    "dedup_incremental_exact",
    "eval_bradley_terry",
    "eval_confusion_multiclass",
    "eval_mcnemar",
    "eval_rank_correlation",
    "eval_regression_metrics",
    "events_ab_cuped",
    "events_asof_join",
    "events_attribution_time_decay",
    "events_retention_cohorts_approx",
    "events_tumbling_window",
    "feature_point_in_time",
    "feature_user_session_stats",
    "feature_user_vectors",
    "join_broadcast_dims",
    "join_right_outer",
    "media_byte_features",
    "media_decode_resize",
    "media_frame_sample",
    "profile_chi_square",
    "profile_heavy_hitters_mg",
    "profile_ks_statistic",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "q18_large_volume_customer",
    "scalar_to_json",
    "search_mrr_ndcg_hybrid",
    "text_bpe_token_count",
    "text_fingerprint",
    "text_quality_score",
    "text_repetition_signals",
    "win_running_sum",
    "ann_ivf_topk_c32",
    "text_heaps_law",
]

# Queries that read the embeddings table — skipped (default list) or
# rejected (explicit --queries) when mult > dim leaves it unreplicated.
_EMBEDDING_QUERIES = {
    "ann_ivf_topk",
    "ann_pq_topk",
    "dedup_embedding_cosine",
    "dedup_incremental_embedding",
    "embedding_label_centroids",
    "embedding_label_separation",
    "embedding_drift_splits",
    "embedding_kmeans_clusters",
    "sample_cluster_balanced",
    "search_hybrid_rrf",  # fuses ann_cosine_topk's dense list
    "ann_hard_negatives",
    "ann_hard_negatives_ivf",
}

ID_STRIDE = 100_000_000  # far above any real doc_id/vec_id in the corpus

# Fact-table replication: per copy i, shift every identity/grouping key by
# i*ID_STRIDE so rows stay attached to their copy's entities (order lines
# to their order, events to their user's sessions) and copies never
# interact through a window or join key. Dimension tables pass through
# unchanged — more facts over the same catalog.
_FACT_SHIFTS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "events": ("event_id", "user_id"),
}
_PASSTHROUGH = ("region", "nation", "customer", "supplier", "part")


# Per-copy alphabet rotation for CHARACTER-level lanes (--char-rotate):
# the token-prefix scheme above keeps token sets disjoint across copies,
# but interior character q-grams still collide ("r3_hello" and "r5_hello"
# share "hel"/"ell"/"llo"), so a char-q-gram candidate index would meet
# across copies and the probe would measure cross-copy candidate growth,
# not engine scaling. Rotating letters by i mod 26 and digits by i mod 10
# (lcm 130 > any probed mult, so no two copies alias) is an EDIT-DISTANCE
# ISOMETRY within each copy — a bijection on the alphabet preserves every
# levenshtein distance exactly — while across copies no letter-bearing
# gram survives. Rotation changes literal token text, so SEMANTIC
# heuristics (stopword/language scoring) see different inputs: probe
# char-level queries in their own run, not mixed with the curation suite.
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()
_DIGIT = "0123456789"


def _rotate_alphabet(i: int) -> tuple[str, str]:
    r, d = i % 26, i % 10
    src = _LOWER + _UPPER + _DIGIT
    dst = _LOWER[r:] + _LOWER[:r] + _UPPER[r:] + _UPPER[:r] + _DIGIT[d:] + _DIGIT[:d]
    return src, dst


def build_replicated(
    spark, base: str, out: str, mult: int, char_rotate: bool = False
) -> bool:
    """Build the mult× replica under `out` (wiping any previous build, so
    a stale lower-mult embeddings.parquet can never leak into this run).
    Returns True iff the embeddings table was replicated — False in the
    mult > dim regime, where embedding-dependent queries must be skipped."""
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)

    docs = load_table(spark, base, "documents")

    def copy_text(i: int):
        txt = (
            F.col("text")
            if i == 0
            else F.regexp_replace("text", r"(\S+)", f"r{i}_$1")
        )
        if char_rotate and i > 0:
            txt = F.translate(txt, *_rotate_alphabet(i))
        return txt

    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_STRIDE)).withColumn(
            "text", copy_text(i)
        )
        for i in range(mult)
    ]
    rep = copies[0]
    for c in copies[1:]:
        rep = rep.unionByName(c)
    rep.withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb = load_table(spark, base, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    # Copy i applies a coordinate PERMUTATION (cosine-invariant within a
    # copy): circular shift by i for i < dim, and reverse∘shift for
    # dim <= i < 2*dim (reversal is its own permutation, so the two
    # families are disjoint and each shift stays distinct). Past 2*dim
    # the families alias, silently violating the probe's premise — so
    # there the embeddings table is SKIPPED (documents/facts still
    # replicate; main() rejects embedding-dependent queries).
    embeddings_written = True
    if mult > 2 * dim:
        print(
            f"  mult {mult} > 2x embedding dim {dim}: skipping embeddings "
            "replication (document/fact queries only)",
            file=sys.stderr,
        )
        embeddings_written = False
    else:
        ecopies = _embedding_copies(emb, dim, mult)
        erep = ecopies[0]
        for c in ecopies[1:]:
            erep = erep.unionByName(c)
        erep.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for table, keys in _FACT_SHIFTS.items():
        fact = load_table(spark, base, table)
        copies = []
        for i in range(mult):
            c = fact
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * ID_STRIDE))
            copies.append(c)
        rep = copies[0]
        for c in copies[1:]:
            rep = rep.unionByName(c)
        rep.write.mode("overwrite").parquet(f"{out}/{table}.parquet")

    for table in _PASSTHROUGH:
        load_table(spark, base, table).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
    return embeddings_written


def _embedding_copies(emb, dim: int, mult: int) -> list:
    def _permuted(i: int):
        s = i % dim
        shifted = (
            F.col("embedding")
            if s == 0
            else F.expr(
                f"concat(slice(embedding, {s + 1}, {dim - s}), slice(embedding, 1, {s}))"
            )
        )
        return F.reverse(shifted) if i >= dim else shifted

    return [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_STRIDE)).withColumn(
            "embedding", _permuted(i)
        )
        for i in range(mult)
    ]


def run_once(spark, specs, sf_dir: str, name: str) -> float:
    t0 = time.time()
    specs[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = round(time.time() - t0, 3)
    # Queries persist() intermediates (signatures, fingerprints) and a
    # shared probe session accumulates them; leaked cache + codegen state
    # from earlier queries measurably pollutes later timings (observed 8x
    # on dedup_minhash_lsh). Each timing starts from a clean cache.
    spark.catalog.clearCache()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_probe_data")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--queries",
        default=",".join(QUERIES),
        help="comma-separated subset (default: all headliners)",
    )
    ap.add_argument(
        "--skip-build",
        action="store_true",
        help="reuse an existing --out replication (chunked sweeps); the "
        "caller must have built it with the SAME --mult",
    )
    ap.add_argument(
        "--char-rotate",
        action="store_true",
        help="rotate letters/digits per copy (edit-distance isometry; use "
        "for character-level lanes like dedup_edit_distance — see the "
        "_rotate_alphabet block comment; do not mix with semantic-heuristic "
        "queries in one run)",
    )
    args = ap.parse_args()
    query_list = [q for q in args.queries.split(",") if q]
    explicit_queries = args.queries != ",".join(QUERIES)

    # Char-level lanes are only meaningful under the rotation isometry:
    # without it, interior q-grams collide across copies and the candidate
    # join measures cross-copy dup-structure growth, not engine scaling.
    char_level = [q for q in query_list if q.startswith("dedup_edit_distance")]
    if char_level and not (args.char_rotate or args.skip_build):
        sys.exit(f"{char_level} require --char-rotate (see its help text)")

    spark = get_spark("scale_probe")
    specs = all_specs()

    if args.skip_build:
        if not os.path.exists(f"{args.out}/documents.parquet"):
            sys.exit(f"--skip-build: no replication found under {args.out}")
        embeddings_written = os.path.exists(f"{args.out}/embeddings.parquet")
        print(f"reusing replication under {args.out}", file=sys.stderr)
    else:
        print(
            f"building {args.mult}x replication under {args.out} ...", file=sys.stderr
        )
        t0 = time.time()
        embeddings_written = build_replicated(
            spark, args.base, args.out, args.mult, char_rotate=args.char_rotate
        )
        print(f"  built in {time.time() - t0:.1f}s", file=sys.stderr)

    if not embeddings_written:
        named = [q for q in query_list if q in _EMBEDDING_QUERIES]
        if named and explicit_queries:
            sys.exit(
                f"--queries names embedding-dependent {named} but mult "
                f"{args.mult} exceeds 2x the embedding dim, so no replicated "
                "embeddings table exists; drop them or lower --mult"
            )
        if named:
            print(f"  skipping embedding-dependent queries: {named}", file=sys.stderr)
            query_list = [q for q in query_list if q not in _EMBEDDING_QUERIES]

    # Session/JIT warmup so the first timed query doesn't absorb startup
    # (observed +9 s on the first query without this).
    run_once(spark, specs, args.base, query_list[0])

    results = {}
    for name in query_list:
        t1 = min(run_once(spark, specs, args.base, name) for _ in range(args.passes))
        tN = min(run_once(spark, specs, args.out, name) for _ in range(args.passes))
        ratio = round(tN / t1, 2) if t1 > 0 else float("inf")
        results[name] = {"t_1x": t1, f"t_{args.mult}x": tN, "ratio": ratio}
        print(json.dumps({"query": name, **results[name]}), flush=True)

    verdicts = {
        n: ("linear-or-better" if r["ratio"] <= args.mult * 1.3 else "SUPERLINEAR")
        for n, r in results.items()
    }
    print(json.dumps({"mult": args.mult, "queries": results, "verdicts": verdicts}))


if __name__ == "__main__":
    main()
