"""End-to-end corpus-build capstone: ONE per-document disposition table
from the whole training-data pipeline, composed from the registered
lanes — nothing re-stated, everything re-used.

The pipeline (the production order every stage's own lane documents):

1. **Ingest + exact-dup gate** — the corpus is the documents table plus a
   modeled RE-CRAWL batch (every 17th doc arrives again under id
   +1,000,000 with byte-identical content — the same non-vacuous modeling
   as ``dedup_incremental_exact``, because the synthetic corpus carries
   zero natural exact dups). The md5 hash-groupBy keeps the minimum id
   per content group; later copies are ``exact_duplicate``.
2. **Near-dup clustering × quality × repetition** — ``keep_verdict``
   (graph_ops), the exact precedence ``corpus_keep_decision`` ships:
   non-canonical cluster members are ``duplicate``, then ``quality``,
   then ``repetition``.
3. **Decontamination + contamination radius** — eval-overlap seeds
   (``decontaminate_against_eval``) are ``contaminated``; every doc
   within CONTAM_HOPS near-dup hops of a seed is ``contamination_radius``
   (the ``graph_contamination_radius`` closure).
4. **Curation selection** — survivors pass the per-source cap
   (``corpus_source_cap``'s _CAP_K longest docs per source); overflow is
   ``dropped_cap``.
5. **Split assignment** — selected docs get ``corpus_split_assign``'s
   pure-hash train/val/test split; every other disposition has split
   NULL.

The LSH pair graph is computed ONCE (pinned) and feeds both the cluster
assignment and the contamination BFS — composing the registered lanes
verbatim would build it twice.

The DuckDB oracle is assembled at import time from the constituent
lanes' REGISTERED SQL (corpus_keep_decision, graph_contamination_radius,
corpus_split_assign) — the ``corpus_final_selection`` idiom extended to
the full pipeline, so the composed verdict can never drift from the
stages it composes.

The maintained, incremental form of this pipeline — the N-day runner
driven by the persisted dedup-gate indexes, gram store and verdict
ledger, whose final table row-equals this one-shot lane — is
``operators/corpus_build.py`` (pinned in tests/test_corpus_build.py).

Scale (100 TB): every stage inherits its own lane's bounds — the exact
gate shuffles 16-byte digests, the pair graph is banded LSH (never
all-pairs), CC is star contraction over edges only, BFS state is
(id, hop), the cap windows are per-source, the split is a scan-stage
hash. The assembly adds four doc-keyed equi-joins of narrow verdict
tables; document text never enters any of them.

Reference: the reference pipeline ingests and upserts rows
(src/lambda_handler.py:38-102) with no curation at all; this module is
the SURVEY §2.11 north-star composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.curation import _CAP_K, split_assign
from data_ingestion_lambda_spark.plans.graph_ops import (
    CONTAM_HOPS,
    bfs_hops,
    cluster_flags,
    connected_components,
    keep_verdict,
)
from data_ingestion_lambda_spark.plans.llm_ops import (
    decon_doc_grams,
    decon_verdict,
    dedup_minhash_lsh,
)
from data_ingestion_lambda_spark.plans.registry import REGISTRY, pin, register

# Re-crawl modeling — the dedup_incremental_exact constants: every 17th
# doc re-arrives under a new id one million above its original.
RECRAWL_MOD = 17
RECRAWL_OFFSET = 1_000_000


def corpus_with_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone's input corpus: documents ∪ the modeled re-crawl batch
    (doc_id, source, text, n_chars)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "text", "n_chars")
    recrawl = d.filter(F.col("doc_id") % RECRAWL_MOD == 0).select(
        (F.col("doc_id") + RECRAWL_OFFSET).alias("doc_id"), "source", "text", "n_chars"
    )
    return d.unionByName(recrawl)


def exact_dup_flags(corpus: DataFrame) -> DataFrame:
    """(doc_id, source, n_chars, is_exact_dup): hash-groupBy exact dedup —
    min doc_id per md5(text) group is canonical, later copies are flagged.
    The dedup_exact_text shuffle shape (16-byte digests, never text)."""
    hashed = corpus.select(
        "doc_id", "source", "n_chars", F.md5(F.col("text").cast("binary")).alias("_h")
    )
    canon = hashed.groupBy("_h").agg(F.min("doc_id").alias("_canon"))
    return hashed.join(canon, "_h").select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("doc_id") != F.col("_canon")).alias("is_exact_dup"),
    )


def assemble_disposition(
    meta: DataFrame,
    kd: DataFrame,
    radius: DataFrame,
    split_tbl: DataFrame,
    cap_k: int = _CAP_K,
) -> DataFrame:
    """The terminal assembly both the one-shot lane and the incremental
    runner share — the ONE place the stage precedence lives.

    Inputs: ``meta`` (doc_id, source, n_chars, is_exact_dup) for every
    corpus doc; ``kd`` (doc_id, keep, drop_reason) for every non-exact-dup
    doc; ``radius`` (doc_id, hops) for the contamination closure;
    ``split_tbl`` (doc_id, split). Output: (doc_id, source, disposition,
    split) with split non-NULL only for ``selected``.
    """
    # One narrow (5 longs + 3 short strings per doc) frame feeds BOTH the
    # survivor ranking and the final label — pinned, or every expensive
    # verdict subtree (repetition explode, decon gram join, BFS) would be
    # re-evaluated once per consumer branch.
    j = meta.join(kd, "doc_id", "left").join(radius, "doc_id", "left").transform(pin)
    surv = j.filter(
        ~F.col("is_exact_dup") & F.col("keep") & F.col("hops").isNull()
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = surv.select("doc_id", F.row_number().over(w).alias("rn"))
    out = (
        j.join(ranked, "doc_id", "left")
        .join(split_tbl.select("doc_id", "split"), "doc_id", "left")
        .withColumn(
            "disposition",
            F.when(F.col("is_exact_dup"), "exact_duplicate")
            .when(~F.col("keep"), F.col("drop_reason"))
            .when(F.col("hops") == 0, "contaminated")
            .when(F.col("hops").isNotNull(), "contamination_radius")
            .when(F.col("rn") <= cap_k, "selected")
            .otherwise("dropped_cap"),
        )
    )
    return out.select(
        "doc_id",
        "source",
        "disposition",
        F.when(F.col("disposition") == "selected", F.col("split")).alias("split"),
    )


def _disposition_oracle() -> str:
    """The composed DuckDB twin: constituent stages run verbatim as the
    REGISTERED oracles inside FROM-subqueries (each carries its own WITH
    RECURSIVE); only the exact gate (the dedup_exact_text md5-group idiom
    over the re-crawl corpus) and the final CASE are stated here, exactly
    mirroring assemble_disposition."""
    kd = REGISTRY["corpus_keep_decision"].oracle
    rad = REGISTRY["graph_contamination_radius"].oracle
    spl = REGISTRY["corpus_split_assign"].oracle
    return f"""
    WITH corpus AS (
        SELECT doc_id, source, n_chars, md5(text) AS h FROM documents
        UNION ALL
        SELECT doc_id + {RECRAWL_OFFSET}, source, n_chars, md5(text)
        FROM documents WHERE doc_id % {RECRAWL_MOD} = 0
    ),
    canon AS (SELECT h, MIN(doc_id) AS canonical FROM corpus GROUP BY h),
    meta AS (
        SELECT c.doc_id, c.source, c.n_chars,
               c.doc_id <> k.canonical AS is_exact_dup
        FROM corpus c JOIN canon k USING (h)
    ),
    kd AS (SELECT doc_id, keep, drop_reason FROM ({kd}) __kd),
    rad AS (SELECT doc_id, hops FROM ({rad}) __rad),
    spl AS (SELECT doc_id, split FROM ({spl}) __spl),
    surv AS (
        SELECT m.doc_id, m.source, m.n_chars
        FROM meta m JOIN kd ON m.doc_id = kd.doc_id
        LEFT JOIN rad ON m.doc_id = rad.doc_id
        WHERE NOT m.is_exact_dup AND kd.keep AND rad.doc_id IS NULL
    ),
    ranked AS (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id) AS rn
        FROM surv
    ),
    labeled AS (
        SELECT m.doc_id, m.source,
               CASE WHEN m.is_exact_dup THEN 'exact_duplicate'
                    WHEN NOT kd.keep THEN kd.drop_reason
                    WHEN rad.hops = 0 THEN 'contaminated'
                    WHEN rad.hops IS NOT NULL THEN 'contamination_radius'
                    WHEN r.rn <= {_CAP_K} THEN 'selected'
                    ELSE 'dropped_cap' END AS disposition,
               s.split AS _split
        FROM meta m
        LEFT JOIN kd ON m.doc_id = kd.doc_id
        LEFT JOIN rad ON m.doc_id = rad.doc_id
        LEFT JOIN ranked r ON m.doc_id = r.doc_id
        LEFT JOIN spl s ON m.doc_id = s.doc_id
    )
    SELECT doc_id, source, disposition,
           CASE WHEN disposition = 'selected' THEN _split END AS split
    FROM labeled
    """


@register(
    "corpus_build_disposition",
    oracle=_disposition_oracle(),
    tags=("llm", "curation", "pipeline", "capstone"),
)
def corpus_build_disposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One disposition per corpus document from the full pipeline (module
    docstring): exact gate → near-dup/quality/repetition verdict →
    decontamination + radius → per-source cap → split assignment.

    The LSH pair table is pinned and feeds BOTH the cluster assignment
    and the contamination BFS — one signature build, one band shuffle,
    two graph consumers."""
    from data_ingestion_lambda_spark.plans.llm_ops import (
        text_quality_score,
        text_repetition_signals,
    )

    d = t(spark, sf_dir, "documents")
    meta = exact_dup_flags(corpus_with_recrawl(spark, sf_dir))

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").transform(pin)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    assign = connected_components(edges)
    clus = cluster_flags(d.select("doc_id"), assign)
    rep = text_repetition_signals(spark, sf_dir).select(
        "doc_id", "dup_2gram_frac", "top_1gram_frac"
    )
    qual = text_quality_score(spark, sf_dir).select("doc_id", "passes_quality")
    kd = keep_verdict(clus, rep, qual)

    base = decon_doc_grams(d)
    grams = base.select("doc_id", "bucket", F.explode("ghs").alias("h"))
    decon = decon_verdict(base.select("doc_id", "bucket"), grams)
    # seeds are re-read by every BFS round's union + anti-join; pin so the
    # gram screen runs once, not once per frontier round.
    seeds = decon.where(F.col("contaminated")).select("doc_id").transform(pin)
    radius = bfs_hops(seeds, edges, CONTAM_HOPS)

    split_tbl = split_assign(d.select("doc_id", "source"))
    return assemble_disposition(meta, kd, radius, split_tbl)
