"""Similarity search over the `embeddings` table (SURVEY §2.11).

Brute-force cosine top-k as the correctness baseline, and an LSH-bucketed
variant as the scale path. All vector math is double-precision Catalyst
higher-order functions executed in the SAME sequential order as the DuckDB
oracle's list functions, so scores are bit-identical across engines
(verified: dot products match to the last ulp).

Scale notes:
- brute force: queries broadcast; candidates never shuffle; per-executor
  cost is Q×N×d multiply-adds inside codegen. For large Q use the
  block-matrix Pandas-UDF path in operators/ann.py instead.
- LSH: sign-bucket join bounds the candidate set; the bucketing function
  is data-independent (fixed hyperplanes), so it parallelizes trivially
  and is reproducible (SURVEY §7.3e).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans.registry import register
from data_ingestion_lambda_spark.plans._util import t

DIM = 64
N_QUERIES = 8  # vec_id < 8 are the demo query vectors
TOP_K = 5


def as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# DuckDB twins: CAST(... AS DOUBLE[]) + list_sum(list_transform(...)) sums in
# the same element order as F.aggregate, giving bit-identical doubles.
_SQL_DOT = (
    "list_sum(list_transform(generate_series(1, {dim}), i -> {a}[i] * {b}[i]))"
)


def _sql_cos(a: str, b: str, dim: int = DIM) -> str:
    d_ab = _SQL_DOT.format(a=a, b=b, dim=dim)
    d_aa = _SQL_DOT.format(a=a, b=a, dim=dim)
    d_bb = _SQL_DOT.format(a=b, b=b, dim=dim)
    return f"{d_ab} / (sqrt({d_aa}) * sqrt({d_bb}))"


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    q AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT query_id, v.vec_id AS neighbor_id,
               {_sql_cos('qv', 've')} AS cosine
        FROM q JOIN v ON v.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("llm", "ann"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact baseline every ANN variant is
    measured against). Broadcast the query set; per-group top-k window."""
    v = t(spark, sf_dir, "embeddings").select("vec_id", as_double("embedding").alias("ve"))
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qv")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("ve")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


_N_PLANES = 4  # axis-aligned sign hyperplanes → 16 buckets


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
               (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
               (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
               (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
               (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
        FROM embeddings),
    q AS (SELECT vec_id AS query_id, ve AS qv, bucket FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT query_id, v.vec_id AS neighbor_id, v.bucket,
               {_sql_cos('qv', 've')} AS cosine
        FROM q JOIN v ON v.bucket = q.bucket AND v.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, bucket, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("llm", "ann"),
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: sign-of-coordinate hyperplanes (random-hyperplane
    LSH with fixed axis planes) → equi-join within bucket → top-k.

    The candidate set shrinks ~2^planes-fold; recall is traded for the
    equi-join's scalability (the join key is the bucket id, so Catalyst
    plans a plain shuffled hash join — no cross product anywhere)."""
    e = t(spark, sf_dir, "embeddings")
    bucket = sum(
        (
            F.when(F.element_at("embedding", i + 1) > 0, 1 << i).otherwise(0)
            for i in range(_N_PLANES)
        ),
        start=F.lit(0),
    )
    v = e.select("vec_id", as_double("embedding").alias("ve"), bucket.alias("bucket"))
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qv"), F.col("bucket").alias("qb")
    )
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            cosine(F.col("qv"), F.col("ve")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


@register(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           sqrt({_SQL_DOT.format(a='ve', b='ve', dim=DIM)}) AS l2_norm,
           len(list_filter(ve, x -> x > 0)) AS n_positive
    FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)
    """,
    tags=("llm", "ann"),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector diagnostics: L2 norm + positive-coordinate count (the
    normalize-before-index sanity check of any embedding pipeline)."""
    e = t(spark, sf_dir, "embeddings")
    ve = as_double(F.col("embedding"))
    return e.select(
        "vec_id",
        "label",
        F.sqrt(dot(ve, ve)).alias("l2_norm"),
        F.size(F.filter(ve, lambda x: x > 0)).alias("n_positive"),
    )


_NEARDUP_THRESHOLD = 0.35  # synthetic embeddings are random; max pairwise ~0.51


def _bucket_expr() -> Column:
    """Sign-of-coordinate LSH bucket (same fixed hyperplanes as
    ann_lsh_bucketed) — data-independent, reproducible."""
    return sum(
        (
            F.when(F.element_at("embedding", i + 1) > 0, 1 << i).otherwise(0)
            for i in range(_N_PLANES)
        ),
        start=F.lit(0),
    )


_SQL_BUCKET = (
    "(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) + "
    "(CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) + "
    "(CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) + "
    "(CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)"
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
                      {_SQL_BUCKET} AS bucket
               FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_sql_cos('a.ve', 'b.ve')} AS cosine
        FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs
    WHERE cosine >= {_NEARDUP_THRESHOLD}
    """,
    tags=("llm", "dedup", "ann"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: candidate pairs from a sign-hyperplane
    LSH bucket join, kept when cosine >= threshold.

    Scale: the bucket id is the join key, so Catalyst plans a shuffled
    hash join over 2^planes buckets — pair count drops ~2^planes-fold vs
    all-pairs, and only (vec_id, vector) tuples shuffle. More planes (or
    banded multi-probe) tighten the candidate set at higher scale; the
    verification cost per pair is a 64-dim dot inside codegen."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("ve"), _bucket_expr().alias("bucket")
    )
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.ve"), F.col("b.ve")).alias("cosine"),
        )
        .filter(F.col("cosine") >= _NEARDUP_THRESHOLD)
    )


@register(
    "ann_block_matrix_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    q AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT query_id, v.vec_id AS neighbor_id,
               round({_sql_cos('qv', 've')}, 6) AS cosine
        FROM q JOIN v ON v.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("llm", "ann", "pandas-udf"),
)
def ann_block_matrix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-matrix Pandas-UDF ANN (operators/ann.py): Arrow batches ×
    broadcast query matrix via one BLAS matmul per batch, per-batch top-k
    prune, tiny global window. The scale path once the query set outgrows
    per-row expression evaluation; scores rounded to 6 dp for engine
    portability (see operators/ann.py determinism contract)."""
    from data_ingestion_lambda_spark.operators.ann import block_cosine_topk

    e = t(spark, sf_dir, "embeddings")
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    return block_cosine_topk(e, queries, TOP_K)
