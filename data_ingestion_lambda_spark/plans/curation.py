"""Corpus-curation operators: PII scrubbing, domain capping, sequence packing.

North-star extensions (SURVEY §2.11) — the three remaining operations a
production LLM-training-data pipeline runs between dedup and tokenization:

- **PII redaction** (`text_pii_scrub`): regex scrub of emails / IPv4s /
  phone numbers. The synthetic corpus carries no PII (verified: zero
  digits in any sf0.01 text), so the query DETERMINISTICALLY INJECTS
  markers keyed on doc_id before scrubbing — identically in Spark and the
  DuckDB oracle — making the redaction path a real, non-vacuous test
  (counts are provably nonzero and the residual check provably zero).
- **Per-source capping** (`corpus_source_cap`): keep at most K docs per
  source (domain balancing à la Common Crawl curation) and report the
  retention per source.
- **Sequence packing** (`pack_sequences`): next-fit packing of docs into
  token-budget bins per source shard — the pre-tokenization batching step
  of a training pipeline.

100 TB design: everything is whole-stage codegen (regex + arithmetic in
the scan pipeline); the only shuffles are windows PARTITIONED BY source
(never a global window) and one groupBy per summary — both scale with the
number of sources, not rows-per-source beyond a single pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans.registry import register
from data_ingestion_lambda_spark.plans._util import t

# Ordering-safe: plans/__init__.py imports llm_ops BEFORE curation, so
# this import never changes the registry's registration order.
from data_ingestion_lambda_spark.plans.llm_ops import SQL_POLYHASH

# Patterns chosen for identical semantics under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround, unambiguous greedy runs.
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_RE_PHONE = r"\+1-555-\d{4}"

_SQL_INJECT = """
    CASE WHEN doc_id % 3 = 0
         THEN text || ' contact user' || doc_id || '@example.com now'
         ELSE text END
    || CASE WHEN doc_id % 5 = 0
            THEN ' node 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) || ' up'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' call +1-555-' || (1000 + doc_id % 9000) || ' today'
            ELSE '' END
"""


def _inject() -> Column:
    """Deterministic PII markers keyed on doc_id (twin of _SQL_INJECT)."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" node 10."),
            (did % 256).cast("string"),
            F.lit(".0."),
            (did % 100).cast("string"),
            F.lit(" up"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 7 == 0,
        F.concat(F.lit(" call +1-555-"), (1000 + did % 9000).cast("string"), F.lit(" today")),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, ip, phone)


@register(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '{_RE_EMAIL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(aug, '{_RE_IPV4}')) AS INTEGER) AS n_ips,
           CAST(len(regexp_extract_all(aug, '{_RE_PHONE}')) AS INTEGER) AS n_phones,
           CAST(length(redacted) AS INTEGER) AS n_chars_redacted,
           CAST(len(regexp_extract_all(redacted, '{_RE_EMAIL}'))
              + len(regexp_extract_all(redacted, '{_RE_IPV4}'))
              + len(regexp_extract_all(redacted, '{_RE_PHONE}')) AS INTEGER) AS n_residual
    FROM (
        SELECT doc_id, aug,
               regexp_replace(regexp_replace(regexp_replace(aug,
                   '{_RE_EMAIL}', '<EMAIL>', 'g'),
                   '{_RE_IPV4}', '<IP>', 'g'),
                   '{_RE_PHONE}', '<PHONE>', 'g') AS redacted
        FROM (SELECT doc_id, {_SQL_INJECT} AS aug FROM documents)
    )
    """,
    tags=("llm", "text", "pii"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and scrub emails / IPv4 addresses / phone
    numbers with engine-portable regexes, verifying zero residual matches
    after replacement. Input PII is deterministically injected (see module
    docstring) because the synthetic corpus carries none. Pure codegen —
    regex runs inside the scan's whole-stage pipeline, no shuffle at all."""
    d = t(spark, sf_dir, "documents").select("doc_id", _inject().alias("aug"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), F.lit(_RE_EMAIL), F.lit("<EMAIL>")),
            F.lit(_RE_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(_RE_PHONE),
        F.lit("<PHONE>"),
    )
    d = d.withColumn("redacted", redacted)
    return d.select(
        "doc_id",
        F.regexp_count("aug", F.lit(_RE_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("aug", F.lit(_RE_IPV4)).cast("int").alias("n_ips"),
        F.regexp_count("aug", F.lit(_RE_PHONE)).cast("int").alias("n_phones"),
        F.length("redacted").cast("int").alias("n_chars_redacted"),
        (
            F.regexp_count("redacted", F.lit(_RE_EMAIL))
            + F.regexp_count("redacted", F.lit(_RE_IPV4))
            + F.regexp_count("redacted", F.lit(_RE_PHONE))
        )
        .cast("int")
        .alias("n_residual"),
    )


_CAP_K = 50


@register(
    "corpus_source_cap",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE rn <= {_CAP_K}) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) FILTER (WHERE rn <= {_CAP_K}) AS BIGINT) AS chars_kept
    FROM (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    GROUP BY source
    """,
    tags=("llm", "curation"),
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain balancing): keep the K longest docs
    per source (ties broken by doc_id — deterministic), report per-source
    retention. One shuffle on source for the window, reused by the
    aggregation (same key, no second exchange). At 100 TB the cap bounds
    any head domain's contribution without a global sort."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    keep = F.col("rn") <= _CAP_K
    return (
        d.withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.sum(F.when(keep, F.col("n_chars"))).alias("chars_kept"),
        )
    )


_PACK_BUDGET = 2048


@register(
    "pack_sequences",
    oracle=f"""
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM (
        SELECT source, n_tokens,
               CAST((cum - 1) // {_PACK_BUDGET} AS BIGINT) AS bin_id
        FROM (
            SELECT source, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM (SELECT source, doc_id,
                         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
                  FROM documents)
        )
    )
    GROUP BY source, bin_id
    """,
    tags=("llm", "curation"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs (in doc_id order, per source shard) to
    consecutive token-budget bins via a running token sum — the
    pre-tokenization batching step of a training pipeline. bin_id =
    floor((cumsum-1)/budget), i.e. next-fit with boundary docs carried into
    the bin where they end. Windows are PARTITIONED BY source — packing is
    per-shard by design, so the plan has no global sort and scales with
    shard count."""
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.select("source", "doc_id", n_tok.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("bin_id", F.floor((F.col("cum") - F.lit(1)) / F.lit(_PACK_BUDGET)).cast("bigint"))
        .groupBy("source", "bin_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
    )


@register(
    "corpus_final_selection",
    # oracle assembled at import time from the registered corpus_keep_decision
    # oracle — see _final_selection_oracle() below (registration happens at
    # the bottom of the module so the composed SQL can never drift from the
    # pipeline it composes).
    oracle=None,
    tags=("llm", "curation", "pipeline"),
)
def corpus_final_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus selection: the keep/drop verdict (near-dup
    clustering x quality x repetition, `corpus_keep_decision`) followed by
    the per-source cap — one query that runs the whole curation pipeline
    and labels every document `dropped_curation` / `dropped_cap` /
    `selected`.

    Scale: the verdict is three doc-keyed aggregates (bounded as
    documented on corpus_keep_decision); the cap adds one source-keyed
    window over only the KEPT docs' (doc_id, source, n_chars) triples —
    payload text never moves."""
    from data_ingestion_lambda_spark.plans.graph_ops import corpus_keep_decision

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kd = corpus_keep_decision(spark, sf_dir).select("doc_id", "keep")
    j = docs.join(kd, "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = (
        j.filter(F.col("keep"))
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "rn")
    )
    stage = (
        F.when(~F.col("keep"), F.lit("dropped_curation"))
        .when(F.col("rn") <= _CAP_K, F.lit("selected"))
        .otherwise(F.lit("dropped_cap"))
    )
    return (
        j.join(ranked, "doc_id", "left")
        .select("doc_id", "source", stage.alias("stage"))
    )


def _final_selection_oracle() -> str:
    """Compose the DuckDB twin from corpus_keep_decision's registered
    oracle (the WITH RECURSIVE pipeline runs inside a FROM subquery)."""
    from data_ingestion_lambda_spark.plans.registry import REGISTRY

    kd_sql = REGISTRY["corpus_keep_decision"].oracle
    return f"""
    WITH kd AS (SELECT doc_id, keep FROM ({kd_sql}) t),
         j AS (SELECT d.doc_id, d.source, d.n_chars, kd.keep
               FROM documents d JOIN kd USING (doc_id)),
         ranked AS (
             SELECT doc_id,
                    ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY n_chars DESC, doc_id) AS rn
             FROM j WHERE keep)
    SELECT j.doc_id, j.source,
           CASE WHEN NOT j.keep THEN 'dropped_curation'
                WHEN r.rn <= {_CAP_K} THEN 'selected'
                ELSE 'dropped_cap' END AS stage
    FROM j LEFT JOIN ranked r USING (doc_id)
    """


# Late-bind the composed oracle (QuerySpec is frozen; re-register with the
# same builder and the assembled SQL).
def _attach_final_selection_oracle() -> None:
    from dataclasses import replace

    from data_ingestion_lambda_spark.plans.registry import REGISTRY

    spec = REGISTRY["corpus_final_selection"]
    REGISTRY["corpus_final_selection"] = replace(spec, oracle=_final_selection_oracle())


_attach_final_selection_oracle()


def _pack_chunked_oracle() -> str:
    """Oracle assembled from the SAME constants the Spark builder imports
    (_CHUNK_STRIDE/_CHUNK_TOKENS from llm_ops, _PACK_BUDGET here) — the
    interpolation the sibling oracles use, so changing a constant can
    never desync builder from oracle."""
    from data_ingestion_lambda_spark.plans.llm_ops import _CHUNK_STRIDE, _CHUNK_TOKENS

    return rf"""
    SELECT source, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(chunk_tokens) AS BIGINT) AS bin_tokens
    FROM (
        SELECT source, doc_id, chunk_id, chunk_tokens,
               CAST((cum - 1) // {_PACK_BUDGET} AS BIGINT) AS bin_id
        FROM (
            SELECT source, doc_id, chunk_id, chunk_tokens,
                   SUM(chunk_tokens) OVER (PARTITION BY source
                                           ORDER BY doc_id, chunk_id
                                           ROWS UNBOUNDED PRECEDING) AS cum
            FROM (
                SELECT source, doc_id,
                       CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
                       CAST(least({_CHUNK_TOKENS}, n - start) AS BIGINT) AS chunk_tokens
                FROM (
                    SELECT source, doc_id,
                           len(string_split_regex(trim(text), '\s+')) AS n,
                           UNNEST(range(0, len(string_split_regex(trim(text), '\s+')), {_CHUNK_STRIDE}))
                               AS start
                    FROM documents
                )
                WHERE n > 0
            )
        )
    )
    GROUP BY source, bin_id
    """


@register(
    "pack_chunked_sequences",
    oracle=_pack_chunked_oracle(),
    tags=("llm", "curation", "pipeline"),
)
def pack_chunked_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-then-pack — the composed sequence-assembly pipeline: every
    document's context-length chunks (text_chunk_documents' exact
    arithmetic: 64-token windows at 48-token strides; constants imported,
    so the two queries cannot drift) packed into 2048-token training bins
    per source shard via the pack_sequences running-sum idiom. Packing
    CHUNKS instead of whole docs is what a real pipeline ships: every
    unit is <= the context budget by construction, so no bin overflows
    from one oversized doc.

    Scale: the chunk derivation here carries only (source, doc_id,
    chunk_id, chunk_tokens) — chunk TEXT is never materialized (token
    counts are pure arithmetic on the token count), so the window input
    is four integers per chunk; one source-keyed exchange, reused by the
    final aggregation."""
    from data_ingestion_lambda_spark.plans.llm_ops import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
    )

    d = t(spark, sf_dir, "documents")
    base = (
        d.select(
            "source",
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"),
        )
        .filter(F.col("n") > 0)
        .withColumn(
            "start",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_STRIDE))
            ),
        )
        .select(
            "source",
            "doc_id",
            F.expr(f"start div {_CHUNK_STRIDE}").cast("bigint").alias("chunk_id"),
            F.least(F.lit(_CHUNK_TOKENS), F.col("n") - F.col("start"))
            .cast("bigint")
            .alias("chunk_tokens"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.withColumn("cum", F.sum("chunk_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.lit(1)) / F.lit(_PACK_BUDGET)).cast("bigint"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.sum("chunk_tokens").cast("long").alias("bin_tokens"),
        )
    )


_EOD = "<|eod|>"


@register(
    "materialize_packed_sequences",
    oracle=rf"""
    WITH toks AS (
        SELECT source, doc_id, text,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents
    ),
    binned AS (
        SELECT source, doc_id, text, n_tokens,
               CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - 1)
                    // {_PACK_BUDGET} AS BIGINT) AS bin_id
        FROM toks
    )
    SELECT source, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           string_agg(text, '{_EOD}' ORDER BY doc_id) AS sequence_text
    FROM binned
    GROUP BY source, bin_id
    """,
    tags=("llm", "curation", "pipeline"),
)
def materialize_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization of pack_sequences' plan: per training bin, the
    actual sequence text — documents concatenated in doc_id order with an
    end-of-document separator — plus the bin's doc and token counts. This
    is the row a tokenizer consumes; pack_sequences answers "how do the
    bins lay out", this one writes them.

    Determinism discipline: ``collect_list`` is order-nondeterministic
    under retries/partitioning, so the concatenation sorts the collected
    (doc_id, text) structs BEFORE joining — array_sort on the struct
    gives doc_id order, matching the oracle's ``string_agg(... ORDER
    BY)`` exactly. Scale: one source-keyed exchange shared by the
    running-sum window and the bin aggregation; each bin's payload is
    bounded by the token budget, so collect_list state is O(budget), not
    O(corpus)."""
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = (
        d.select("source", "doc_id", "text", n_tok.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.lit(1)) / F.lit(_PACK_BUDGET)).cast("bigint"),
        )
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda x: x["text"],
        ),
        _EOD,
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
        seq.alias("sequence_text"),
    )


# ---------------------------------------------------------------------------
# Rank-blend selection (multi-signal curation without score calibration)
# ---------------------------------------------------------------------------

_BLEND_K = 30  # docs kept per source by the blended rank


@register(
    "corpus_rank_blend",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(list_distinct(string_split_regex(trim(text), '\\s+')))
                   AS BIGINT) AS n_distinct,
               CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS BIGINT)
                   AS n_alpha
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_tokens DESC, doc_id) AS r_tokens,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_distinct DESC, doc_id) AS r_distinct,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_alpha DESC, doc_id) AS r_alpha
        FROM sig
    )
    SELECT doc_id, source,
           CAST(r_tokens AS BIGINT) AS r_tokens,
           CAST(r_distinct AS BIGINT) AS r_distinct,
           CAST(r_alpha AS BIGINT) AS r_alpha,
           CAST(r_tokens + r_distinct + r_alpha AS BIGINT) AS rank_sum,
           CAST(blended AS BIGINT) AS blended_rank,
           blended <= {_BLEND_K} AS selected
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY r_tokens + r_distinct + r_alpha, doc_id) AS blended
        FROM ranked
    )
    """,
    tags=("llm", "curation"),
)
def corpus_rank_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal curation by RANK FUSION: per source, each document is
    ranked under three independent keep-signals (token count, distinct
    tokens, alpha mass), the ranks are summed, and the top {_BLEND_K}
    by blended rank are selected. Rank aggregation is the standard
    answer to combining signals on incomparable scales (the same
    calibration-free argument as the retrieval stack's RRF —
    plans/retrieval.py — applied to curation): no weights to tune, no
    score normalization to drift, outliers capped at rank distance.

    Determinism: every signal is an exact integer, every rank a
    ROW_NUMBER under an explicit (signal DESC, doc_id) total order, the
    blend an integer sum — no floating point anywhere.

    Scale: all four windows are PARTITIONED BY source (the module's
    no-global-window discipline) and share one exchange on source; at a
    fixed per-source working set this is one shuffle of (doc_id, 3
    longs) per doc regardless of corpus size. If a single source is
    itself 100 TB, swap each ROW_NUMBER for the two-phase histogram
    prefix-sum rank (the agg_rfm_segmentation_hist recipe) — signals
    here are small integers, so the histogram is exact, not
    approximate."""
    from data_ingestion_lambda_spark.plans.llm_ops import tokens

    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    sig = d.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(F.regexp_replace("text", "[^a-z ]", "")).cast("long").alias("n_alpha"),
    )

    def _rank(col: str):
        return F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc(col), F.asc("doc_id"))
        )

    ranked = sig.select(
        "doc_id",
        "source",
        _rank("n_tokens").cast("long").alias("r_tokens"),
        _rank("n_distinct").cast("long").alias("r_distinct"),
        _rank("n_alpha").cast("long").alias("r_alpha"),
    ).withColumn(
        "rank_sum",
        (F.col("r_tokens") + F.col("r_distinct") + F.col("r_alpha")).cast("long"),
    )
    blended = F.row_number().over(
        Window.partitionBy("source").orderBy(F.asc("rank_sum"), F.asc("doc_id"))
    )
    return ranked.withColumn("blended_rank", blended.cast("long")).withColumn(
        "selected", F.col("blended_rank") <= _BLEND_K
    )


@register(
    "corpus_split_assign",
    # The oracle's hash is the canonical SQL_POLYHASH (llm_ops.py), not
    # an inline copy — a second definition would silently diverge from
    # the Spark side's polyhash() on any future change (review r10).
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source,
               {SQL_POLYHASH.format(s="CAST(doc_id AS VARCHAR)")} % 10 AS bucket
        FROM documents
    )
    SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket,
           CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
    FROM h
    """,
    tags=("llm", "curation"),
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) — the holdout
    split every training pipeline needs, done the only way that is safe
    at 100 TB: a PURE FUNCTION of the document's identity (the repo's
    polynomial hash of the id string, mod 10), so the assignment is
    reproducible across runs, engines and re-partitions, needs no
    stored split table, never shuffles (codegen in the scan stage), and
    stays STABLE under corpus growth — a doc's split never changes when
    neighbors arrive, the property a random() split lacks and the
    reason eval contamination creeps into retrained models. The bucket
    is emitted so downstream can re-cut ratios without re-hashing;
    stratification quality is auditable by grouping this lane's output
    by (source, split) — hash uniformity makes per-stratum ratios
    concentrate tightly (and systematic per-source skew would indicate
    id structure leaking into the hash, worth knowing)."""
    return split_assign(t(spark, sf_dir, "documents"))


def split_assign(d: DataFrame) -> DataFrame:
    """corpus_split_assign's pure-function assignment over any (doc_id,
    source) frame — factored so the corpus-build capstone and the
    incremental runner apply the identical hash split (the assignment IS
    the identity hash, so any caller computing it from any doc subset
    agrees with the registered lane)."""
    from data_ingestion_lambda_spark.plans.llm_ops import polyhash

    h = (polyhash(F.col("doc_id").cast("string")) % 10).cast("long")
    return d.select("doc_id", "source", h.alias("bucket")).select(
        "doc_id",
        "source",
        "bucket",
        F.when(F.col("bucket") < 8, "train")
        .when(F.col("bucket") == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
