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
from data_ingestion_lambda_spark.plans.registry import pin
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


def bm25_contribution_cols(nn: Column, tt: Column) -> Column:
    """The scaled-long per-term BM25 contribution over columns
    (tf, df, dl) with the corpus stats (N docs, T tokens) ALSO as
    columns — the fully in-plan form: the one-shot lanes cross-join a
    broadcast 1-row (nn, tt) aggregate exactly like the oracle's
    nn/tt CTEs, so building the plan launches NO job (review r10's
    watch item: the previous form collected two driver scalars per
    plan build). All arithmetic stays exact LONG (the casts pin the
    promotion the literal form got implicitly)."""
    nn, tt = nn.cast("long"), tt.cast("long")
    num = (2 * nn + 1 - 2 * F.col("df")) * (F.col("tf") * (44 * tt))
    den = (2 * F.col("df") + 1) * (
        F.col("tf") * (20 * tt) + 6 * tt + F.col("dl") * (18 * nn)
    )
    return F.floor(
        num.cast("double") / den.cast("double") * F.lit(float(_SCALE))
    ).cast("long")


def bm25_contribution(n_docs: int, t_tokens: int) -> Column:
    """The driver-scalar form over (tf, df, dl) — used where N and T
    are ALREADY materialized tiny scalars (the maintained postings
    index's per-batch stats rows, operators/postings.py::read_stats);
    delegates to the column form so lane and index scores stay equal
    BY CONSTRUCTION, not by parallel maintenance."""
    return bm25_contribution_cols(F.lit(n_docs), F.lit(t_tokens))


def _bm25_sql(docs_rel: str) -> str:
    """The BM25 top-k pipeline SQL over any (doc_id, text) relation —
    the registered lane runs it over ``documents``; the ranking gauges
    run the SAME text over their planted-augmented corpus, so lane and
    gauge cannot drift."""
    return f"""
    WITH ex AS (SELECT doc_id, UNNEST({SQL_TOKENS}) AS tok FROM {docs_rel}),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM ex GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    nn AS (SELECT COUNT(*) AS n FROM {docs_rel}),
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
    """


def _bm25_topk_over(d: DataFrame) -> DataFrame:
    """The BM25 top-k plan over any (doc_id, text, ...) DataFrame — the
    Spark twin of ``_bm25_sql``, shared by the lane and the gauges.

    r14 shuffle audit (guide §2.3/§2.4): dl, tt, nn and the query term
    bags are all derivable from the documents SCAN row-locally —
    ``SUM(tf) GROUP BY doc_id`` over the exploded tf table is exactly
    ``size(tokens(text))`` per doc, and ``DISTINCT tok WHERE doc_id <
    N`` is exactly ``explode(array_distinct(tokens))`` over the N query
    docs (pushdown-pruned scan) — same integers by construction, so the
    oracle is untouched while THREE tf-wide exchanges (dl's, tt's
    re-aggregation of dl, q's distinct) drop out of the plan. tf keeps
    its single exchange and feeds only the df aggregate and the
    candidate join."""
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .transform(pin)
    )
    # dl per doc == SUM(tf) per doc == total token count — computed in
    # the scan stage, no exchange (and docs with zero tokens have no tf
    # rows, so the join below drops them identically to the old form).
    dl = d.select("doc_id", F.size(tokens("text")).cast("long").alias("dl"))
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # corpus stats IN-PLAN (the oracle's nn/tt CTEs): one broadcast
    # 1-row scan-stage aggregate — nn = COUNT(*), tt = SUM(dl)
    stats = d.agg(
        F.count("*").cast("long").alias("nn"),
        F.sum(F.size(tokens("text")).cast("long")).cast("long").alias("tt"),
    )

    q = (
        d.filter(F.col("doc_id") < N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(tokens("text"))).alias("tok"),
        )
    )
    cand = (
        F.broadcast(q)
        .join(tf, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dfq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.sum(bm25_contribution_cols(F.col("nn"), F.col("tt"))).alias("score_n")
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


@register(
    "search_bm25_topk",
    oracle=_bm25_sql("documents"),
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
    return _bm25_topk_over(t(spark, sf_dir, "documents"))


_BM25_SQL = _REG["search_bm25_topk"].oracle
_COS_SQL = _REG["ann_cosine_topk"].oracle


def _rrf_sql(bm_sql: str) -> str:
    """RRF fusion SQL over any BM25 top-k SQL (the dense list is always
    the brute-cosine oracle) — shared by the lane and the hybrid gauge."""
    return f"""
    WITH bm AS (SELECT query_id, match_id, rank FROM ({bm_sql}) tb),
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
    """


def _rrf_fuse(bm: DataFrame, dn: DataFrame) -> DataFrame:
    """Spark twin of ``_rrf_sql`` over two (query_id, match_id, rank)
    lists — shared by the lane and the hybrid gauge."""
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


@register(
    "search_hybrid_rrf",
    oracle=_rrf_sql(_BM25_SQL),
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
    return _rrf_fuse(bm, dn)


# ---------------------------------------------------------------------------
# Ranking-quality gauges: MRR + NDCG@k on PLANTED graded relevance (r10,
# VERDICT r9 #6) — the dedup/ANN stacks self-measure with recall gauges;
# these are the retrieval twins. The corpus is augmented with 3 planted
# documents per demo query at graded token overlap (the recall-curve
# planting idiom, adapted to BM25: the plant is the query's kept-prefix
# — 19/20, 16/20, 11/20 of its tokens — REPEATED TWICE; the doubling
# drives the saturating tf toward its cap on exactly the covered terms,
# which is what separates a genuinely relevant doc in this synthetic
# corpus, whose tiny vocabulary makes mere bag overlap non-
# discriminative — measured: with junk-padded single copies the plants
# rank below ordinary corpus docs, with the doubled prefix grade 3
# ranks #1 for 7 of 8 queries), grade := 3/2/1, everything else grade
# 0. Relevance is ARITHMETIC (planted doc_id = 10^9 + query_id*10 +
# grade), so no judgment table is carried.
#
# Determinism: MRR's reciprocal rank is the exact integer 10^9 div rank;
# NDCG's 1/log2(rank+1) discounts are a k-row LITERAL integer-ppb table
# (the Benford e0-literal discipline — no transcendental evaluated in
# either engine), so DCG is an exact BIGINT sum and NDCG is ONE IEEE
# division by the constant ideal DCG (planting fixes the grade multiset
# per query at {3,2,1}, so IDCG is the same literal for every query).
# ---------------------------------------------------------------------------

_PLANT_BASE = 1_000_000_000
_PLANT_GRADES = ((1, 11), (2, 16), (3, 19))  # (grade, kept twentieths)
# floor(1e9 / log2(rank + 1)) for rank 1..TOP_K
_NDCG_DISC_PPB = (1_000_000_000, 630_929_753, 500_000_000, 430_676_558, 386_852_807)
assert len(_NDCG_DISC_PPB) == TOP_K
# ideal DCG numerator: gains (2^g - 1) for grades 3,2,1 at ranks 1,2,3
_IDCG_N = 7 * _NDCG_DISC_PPB[0] + 3 * _NDCG_DISC_PPB[1] + 1 * _NDCG_DISC_PPB[2]


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ 3 planted docs per demo query at graded overlap."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    q = d.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("qid"), tokens("text").alias("toks")
    )
    grades = spark.createDataFrame(list(_PLANT_GRADES), "grade int, keep int")
    planted = (
        q.crossJoin(F.broadcast(grades))
        .withColumn("pid", F.lit(_PLANT_BASE) + F.col("qid") * 10 + F.col("grade"))
        .withColumn("n_keep", F.expr("CAST((size(toks) * keep) div 20 AS INT)"))
        .select(
            F.col("pid").alias("doc_id"),
            F.array_join(
                F.expr("concat(slice(toks, 1, n_keep), slice(toks, 1, n_keep))"),
                " ",
            ).alias("text"),
        )
        # pinned (bounded: 3·|queries| = 24 rows) — the r14 bm25 rewrite
        # derives dl/stats/q from the documents scan, so the augmented
        # frame gains one consumer per branch; caching the plant keeps
        # each branch at ONE parquet scan + a 24-row cache read instead
        # of re-running the tokenize+slice plant pipeline per branch.
        .transform(pin)
    )
    return d.unionByName(planted)


_PLANTED_SQL = f"""
    planted AS (
        SELECT {_PLANT_BASE} + qid * 10 + grade AS doc_id,
               array_to_string(
                   list_concat(toks[1:(len(toks) * keep) // 20],
                               toks[1:(len(toks) * keep) // 20]),
                   ' ') AS text
        FROM (SELECT doc_id AS qid, {SQL_TOKENS} AS toks
              FROM documents WHERE doc_id < {N_QUERIES}) q
        CROSS JOIN (VALUES {", ".join(f"({g}, {k})" for g, k in _PLANT_GRADES)})
                   AS gr(grade, keep)
    ),
    docs_aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM planted
    )"""


def _ranking_gauge_sql(topk_sql: str) -> str:
    """Wrap a (query_id, match_id, rank) top-k SQL over ``docs_aug``
    with the planted corpus and the MRR/NDCG arithmetic."""
    disc_rows = ", ".join(
        f"({r + 1}, {d})" for r, d in enumerate(_NDCG_DISC_PPB)
    )
    return f"""
    WITH {_PLANTED_SQL.lstrip()},
    topk AS (SELECT query_id, match_id, rank FROM ({topk_sql}) tk),
    graded AS (
        SELECT query_id, rank,
               CASE WHEN match_id >= {_PLANT_BASE}
                         AND (match_id - {_PLANT_BASE}) // 10 = query_id
                         AND (match_id - {_PLANT_BASE}) % 10 BETWEEN 1 AND 3
                    THEN (match_id - {_PLANT_BASE}) % 10 ELSE 0 END AS grade
        FROM topk
    ),
    disc(rank, d_ppb) AS (VALUES {disc_rows}),
    perq AS (
        SELECT query_id,
               MIN(CASE WHEN grade > 0 THEN rank END) AS frr,
               CAST(SUM(((1 << grade) - 1) * d_ppb) AS BIGINT) AS dcg_n
        FROM graded JOIN disc USING (rank)
        GROUP BY query_id
    )
    SELECT query_id,
           CAST(frr AS BIGINT) AS first_rel_rank,
           CAST(COALESCE({_PLANT_BASE} // frr, 0) AS BIGINT) AS rr_ppb,
           dcg_n,
           CAST(dcg_n AS DOUBLE) / {_IDCG_N}.0 AS ndcg{TOP_K}
    FROM perq
    """


def _ranking_metrics(topk: DataFrame) -> DataFrame:
    """Per-query MRR/NDCG components from a (query_id, match_id, rank)
    top-k frame — the Spark twin of ``_ranking_gauge_sql``'s wrapper."""
    rel = (F.col("match_id") - _PLANT_BASE) % 10
    owner = F.expr(f"(match_id - {_PLANT_BASE}) div 10")
    grade = (
        F.when(
            (F.col("match_id") >= _PLANT_BASE)
            & (owner == F.col("query_id"))
            & rel.between(1, 3),
            rel,
        )
        .otherwise(0)
        .cast("int")
    )
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NDCG_DISC_PPB]), F.col("rank").cast("int")
    ).cast("long")
    # 2^grade - 1 via a literal lookup (F.shiftleft needs a python-int
    # bit count): grades 0..3 -> gains 0,1,3,7
    gain = F.element_at(
        F.array(F.lit(0), F.lit(1), F.lit(3), F.lit(7)), grade + 1
    ).cast("long")
    scored = topk.select(
        "query_id", "rank", grade.alias("grade"), (gain * disc).alias("dg_n")
    )
    perq = scored.groupBy("query_id").agg(
        F.min(F.when(F.col("grade") > 0, F.col("rank")))
        .cast("long")
        .alias("first_rel_rank"),
        F.sum("dg_n").cast("long").alias("dcg_n"),
    )
    return perq.select(
        "query_id",
        "first_rel_rank",
        F.coalesce(
            F.expr(f"CAST({_PLANT_BASE} div first_rel_rank AS BIGINT)"),
            F.lit(0).cast("long"),
        ).alias("rr_ppb"),
        "dcg_n",
        (F.col("dcg_n").cast("double") / F.lit(float(_IDCG_N))).alias(
            f"ndcg{TOP_K}"
        ),
    )


@register(
    "search_mrr_ndcg_bm25",
    oracle=_ranking_gauge_sql(_bm25_sql("docs_aug")),
    tags=("llm", "search", "quality"),
)
def search_mrr_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR + NDCG@{TOP_K} of ``search_bm25_topk`` on planted graded
    relevance — one row per demo query with the first relevant rank,
    the exact integer reciprocal rank (ppb), the exact integer DCG
    numerator, and NDCG as one IEEE division by the constant ideal.
    The lexical ranker should place the 19/20-overlap plant at or near
    rank 1; the gauge is what a pipeline owner watches when tuning
    tokenization or k1/b.

    Scale: the plant adds 3·|queries| docs (constant); the pipeline is
    the lane's own inverted-index shape; the metric wrapper runs on
    |queries|·k rows."""
    return _ranking_metrics(
        _bm25_topk_over(_augmented_docs(spark, sf_dir)).select(
            "query_id", "match_id", "rank"
        )
    )


@register(
    "search_mrr_ndcg_hybrid",
    oracle=_ranking_gauge_sql(_rrf_sql(_bm25_sql("docs_aug"))),
    tags=("llm", "search", "quality"),
)
def search_mrr_ndcg_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR + NDCG@{TOP_K} of the HYBRID fusion on the same planted
    relevance: the dense list (brute cosine over the unmodified
    embeddings — planted docs carry no vectors, exactly like fresh
    crawl text before an embedding pass) competes with the lexical
    list inside RRF, so this gauge prices what fusion costs/buys on
    lexically-judged relevance relative to ``search_mrr_ndcg_bm25``.
    Same exact-integer discipline, same constant ideal."""
    bm = _bm25_topk_over(_augmented_docs(spark, sf_dir)).select(
        "query_id", "match_id", "rank"
    )
    dn = ann_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("match_id"), "rank"
    )
    return _ranking_metrics(
        _rrf_fuse(bm, dn).select("query_id", "match_id", "rank")
    )
