"""Sparse lexical retrieval + hybrid fusion — the keyword half of the
similarity-search surface (the ANN suite in plans/similarity.py is the
dense half). A training-data pipeline leans on lexical top-k for
decontamination sweeps, near-dup triage and hard-negative mining, and
on rank fusion to combine it with embedding search.

Determinism discipline (the registry contract): no transcendentals —
BM25's ln-idf is replaced by its exact RATIONAL core and the whole
per-term contribution is computed as a ratio of two exact integers,
floored at a fixed scale; scores are then exact LONG sums, associative
and combiner-safe, identical in Spark and DuckDB (the
``text_tfidf_top_terms`` / ``text_unigram_surprisal`` precedent:
libm-vs-JVM last-ulp drift cannot exist when there is no libm call).

Reference intent: the reference has no search surface; these extend
the §2.11 LLM-pipeline scope (SURVEY.md) alongside the dedup/ANN
stack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.llm_ops import SQL_TOKENS, tokens
from data_ingestion_lambda_spark.plans.registry import REGISTRY as _REG
from data_ingestion_lambda_spark.plans.registry import register
from data_ingestion_lambda_spark.plans.similarity import ann_cosine_topk

N_QUERIES = 8  # doc_id < 8 are the demo query documents (the ANN suite's convention)
TOP_K = 5
_SCALE = 1_000_000_000  # fixed-point scale for per-term BM25 contributions
_RRF_SCALE = 1_000_000_000_000  # fixed-point scale for 1/(60+rank)
_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


# BM25 with k1 = 6/5 and b = 3/4 folded into integer arithmetic.
# Per matched term, with N docs, T total tokens, tf the term's in-doc
# count, df its document frequency and dl the doc length:
#
#   tf-saturation  tf·(k1+1) / (tf + k1·(1−b+b·dl·N/T))
#     = 44·T·tf / (20·T·tf + 6·T + 18·N·dl)        (×20T top and bottom)
#   rational idf   (N − df + ½) / (df + ½) = (2N − 2df + 1) / (2df + 1)
#
# so the contribution is (idf_num·w_num) / (idf_den·w_den) — two exact
# BIGINT products (bounded: at 500k docs / 10^8 tokens the numerator
# peaks ~2·10^18, inside int64; beyond that, widen to decimal), one
# correctly-rounded double division, one floor at _SCALE. Both engines
# perform the identical IEEE ops on identical integers.


def bm25_contribution(n_docs: int, t_tokens: int) -> Column:
    """The scaled-long per-term BM25 contribution over columns
    (tf, df, dl) — shared by the registered one-shot query and the
    maintained postings index (operators/postings.py), so their scores
    are equal BY CONSTRUCTION, not by parallel maintenance."""
    num = (F.lit(2 * n_docs + 1) - 2 * F.col("df")) * (
        F.col("tf") * F.lit(44 * t_tokens)
    )
    den = (2 * F.col("df") + 1) * (
        F.col("tf") * F.lit(20 * t_tokens)
        + F.lit(6 * t_tokens)
        + F.col("dl") * F.lit(18 * n_docs)
    )
    return F.floor(
        num.cast("double") / den.cast("double") * F.lit(float(_SCALE))
    ).cast("long")


@register(
    "search_bm25_topk",
    oracle=f"""
    WITH ex AS (SELECT doc_id, UNNEST({SQL_TOKENS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM ex GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    tt AS (SELECT CAST(SUM(dl) AS BIGINT) AS t FROM dl),
    q AS (SELECT DISTINCT doc_id AS query_id, tok FROM tf WHERE doc_id < {N_QUERIES}),
    cand AS (
        SELECT q.query_id, tf.doc_id, tf.tf, dl.dl, dfq.df, nn.n, tt.t
        FROM q JOIN tf USING (tok)
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN dfq ON tok = dfq.tok
        CROSS JOIN nn CROSS JOIN tt
        WHERE tf.doc_id <> q.query_id),
    contrib AS (
        SELECT query_id, doc_id,
               CAST(FLOOR(
                   CAST((2*n + 1 - 2*df) * (44*t*tf) AS DOUBLE)
                   / CAST((2*df + 1) * (20*t*tf + 6*t + 18*n*dl) AS DOUBLE)
                   * {_SCALE}.0) AS BIGINT) AS c
        FROM cand),
    scored AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_n
               FROM contrib GROUP BY query_id, doc_id)
    SELECT query_id, doc_id AS match_id,
           CAST(score_n AS DOUBLE) / {_SCALE}.0 AS bm25,
           CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score_n DESC, doc_id) AS rank
          FROM scored)
    WHERE rank <= {TOP_K}
    """,
    tags=("llm", "search"),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-as-query BM25 top-{TOP_K}: each demo query document's token
    bag retrieves the corpus documents that share its rarest terms,
    weighted by the classic saturating tf and (rational) idf — the
    lexical decontamination/triage sweep.

    Scale: pure inverted-index shape — tf/df/dl are token- or doc-keyed
    aggregates off one exploded scan; candidates are an equi-join of
    the (tiny, broadcast) query term bag against the postings, so the
    work is sum-of-df over query terms, linear in the corpus for a
    fixed query set. Contributions are exact longs, so the score
    aggregate partially combines map-side. The production levers are
    the standard ones this shape admits: impact-ordered postings /
    WAND-style upper-bound pruning drop low-idf terms before the join
    (documented, not needed at test scale)."""
    d = t(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = d.count()  # two bounded driver scalars, re-broadcast as literals
    t_tokens = dl.agg(F.sum("dl")).collect()[0][0]

    q = (
        tf.filter(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "tok")
        .distinct()
    )
    cand = (
        F.broadcast(q)
        .join(tf, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dfq, "tok")
        .join(dl, "doc_id")
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.sum(bm25_contribution(n_docs, t_tokens)).alias("score_n")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_n"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("doc_id").alias("match_id"),
            (F.col("score_n").cast("double") / F.lit(float(_SCALE))).alias("bm25"),
            "rank",
        )
    )


_BM25_SQL = _REG["search_bm25_topk"].oracle
_COS_SQL = _REG["ann_cosine_topk"].oracle


@register(
    "search_hybrid_rrf",
    oracle=f"""
    WITH bm AS (SELECT query_id, match_id, rank FROM ({_BM25_SQL}) tb),
    dn AS (SELECT query_id, neighbor_id AS match_id, rank FROM ({_COS_SQL}) td),
    u AS (SELECT query_id, match_id, {_RRF_SCALE} // ({_RRF_K} + rank) AS c FROM bm
          UNION ALL
          SELECT query_id, match_id, {_RRF_SCALE} // ({_RRF_K} + rank) AS c FROM dn),
    fused AS (SELECT query_id, match_id,
                     CAST(SUM(c) AS BIGINT) AS rrf_n,
                     CAST(COUNT(*) AS BIGINT) AS n_lists
              FROM u GROUP BY query_id, match_id)
    SELECT query_id, match_id, rrf_n, n_lists, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rrf_n DESC, match_id) AS rank
          FROM fused)
    WHERE rank <= {TOP_K}
    """,
    tags=("llm", "search"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the lexical (BM25 over `documents`) and
    dense (brute-force cosine over `embeddings`, the same id space)
    top-{TOP_K} lists: score = Σ 1/({_RRF_K}+rank) over the lists a
    candidate appears in — computed as exact integer {_RRF_SCALE}//(k+r)
    so the fusion is engine-identical without a single double. The
    standard hybrid-search combiner (Cormack et al., SIGIR'09): rank
    positions only, no score calibration across modalities.

    Scale: trivially bounded — each query contributes ≤ {TOP_K} rows
    per list, so fusion runs on lists·k·|queries| rows regardless of
    corpus size; the cost lives in the underlying retrievers."""
    bm = search_bm25_topk(spark, sf_dir).select("query_id", "match_id", "rank")
    dn = ann_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("match_id"), "rank"
    )
    u = bm.unionByName(dn).withColumn(
        "c", F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rank)")
    )
    fused = u.groupBy("query_id", "match_id").agg(
        F.sum("c").alias("rrf_n"), F.count("*").alias("n_lists")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_n"), F.asc("match_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "match_id", "rrf_n", "n_lists", "rank")
    )
