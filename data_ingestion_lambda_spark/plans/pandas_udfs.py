"""The remaining vectorized-UDF surface (SURVEY §2.10): scalar
``@pandas_udf``, grouped-agg ``@pandas_udf``, and grouped-map
``applyInPandas`` — one oracle-checked query each.

House rule stands: UDFs are NOT the hot path (everything expressible as
built-ins uses built-ins — see plans/llm_ops.py). These exist because a
complete engine must offer the escape hatch, and each query documents the
cross-engine determinism discipline a Python UDF must follow:

- Arrow transfer both ways (session enables spark.sql.execution.arrow);
- exact integer arithmetic inside the UDF (pandas' float sum is pairwise
  and order-dependent — sum cents as int64, divide once at the end);
- output schemas declared, never inferred.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.registry import register


@pandas_udf(LongType())
def _vec_charlen(s: pd.Series) -> pd.Series:
    # SCALAR pandas UDF: vectorized over an Arrow batch (no per-row Python).
    return s.str.len().astype("int64")


@register(
    "udf_scalar_vectorized",
    oracle="""
    SELECT doc_id, length(text) AS n_chars_udf, n_chars
    FROM documents
    """,
    tags=("udf", "pandas-udf"),
)
def udf_scalar_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR ``@pandas_udf``: one Arrow batch in, one Series out, running
    inside the scan stage (ArrowEvalPython). The built-in length() would
    be the production choice; the query proves the UDF lane agrees with
    it bit-for-bit."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", _vec_charlen("text").alias("n_chars_udf"), "n_chars")


@pandas_udf(LongType())
def _sum_cents(bal: pd.Series) -> int:
    # GROUPED_AGG pandas UDF. pandas .sum() on float64 is pairwise and
    # order-dependent; rounding each 2-dp value to integer cents first
    # makes the sum exact and partition-order-independent.
    return int(bal.mul(100).round().astype("int64").sum())


@pandas_udf(LongType())
def _count_rows(bal: pd.Series) -> int:
    return len(bal)


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS balance_cents,
           COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("udf", "pandas-udf", "agg"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG ``@pandas_udf``: custom aggregates over Arrow batches.
    (Spark disallows mixing pandas and built-in aggregates in one agg() —
    INVALID_PANDAS_UDF_PLACEMENT — so the row count is a pandas UDF too.)"""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        _sum_cents("c_acctbal").alias("balance_cents"),
        _count_rows("c_acctbal").alias("n"),
    )


@register(
    "udf_grouped_map_center",
    oracle="""
    WITH means AS (
        SELECT c_nationkey,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 / COUNT(*) AS mean_bal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_custkey, c.c_nationkey,
           CAST(c_acctbal AS DOUBLE) - mean_bal AS bal_centered
    FROM customer c JOIN means USING (c_nationkey)
    """,
    tags=("udf", "pandas-udf"),
)
def udf_grouped_map_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_MAP ``applyInPandas``: per-nation balance centering — the
    whole group lands in one pandas frame (the operator's contract and its
    scale hazard: group size must fit an executor; for unbounded groups
    use window functions instead). The mean is derived from an exact
    integer-cent sum so both engines compute the identical double."""
    c = t(spark, sf_dir, "customer")

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf["c_acctbal"].mul(100).round().astype("int64")
        mean_bal = float(cents.sum()) / 100.0 / len(pdf)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_centered": pdf["c_acctbal"].astype("float64") - mean_bal,
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        center, schema="c_custkey long, c_nationkey int, bal_centered double"
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_arrow
    FROM documents
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the lowest-overhead vectorized lane — RecordBatches
    reach Python with no pandas conversion at all; compute runs in Arrow
    kernels (C++). The right lane when the Python side is itself
    Arrow-native (tokenizers, Arrow-backed feature stores)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def arrow_len(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.utf8_length(batch.column("text"))],
                names=["doc_id", "n_chars_arrow"],
            )

    return d.mapInArrow(arrow_len, schema="doc_id long, n_chars_arrow int")


def _ngram_spans_udtf():
    """Build the UDTF lazily (class decoration touches the JVM-facing
    registry machinery; keep module import side-effect free)."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class NgramSpans:
        """Positional word n-grams — a ROW-EXPANDING table function, the
        one UDF shape (§2.10) the scalar/agg/map lanes can't express.
        Tokenization mirrors the engine-wide idiom exactly:
        split(trim(text), r'\\s+')."""

        def eval(self, text, n: int):
            if text is None:
                return
            toks = re.split(r"\s+", text.strip())
            for i in range(len(toks) - n + 1):
                yield i + 1, " ".join(toks[i : i + n])

    return NgramSpans


@register(
    "udtf_ngram_spans",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
    ),
    g AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               array_to_string(list_slice(w, i, i + 2), ' ') AS ngram
        FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS u(i)
    )
    SELECT ngram,
           COUNT(*) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g
    GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram
    LIMIT 20
    """,
    tags=("udf", "text"),
)
def udtf_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lane (Spark 3.5+ user-defined TABLE function, §2.10):
    ``LATERAL ngram_spans(text, 3)`` expands every document into its
    positional word trigrams, then plain aggregation takes the global
    top 20 (count-desc, ngram tie-break — a deterministic set, so the
    order-insensitive oracle hash matches). Arrow-optimized UDTF
    evaluation is enabled session-wide; the same trigram extraction used
    by the HOT dedup paths stays in codegen HOFs (plans/llm_ops.py
    shingles3) — this lane exists because row-expansion with imperative
    logic is the one UDF shape scalar/agg/map lanes cannot express, and
    a complete engine ships the escape hatch with its discipline
    documented: static declared schema, pure per-row logic, exact
    integer/string outputs only."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("ngram_spans", _ngram_spans_udtf())
    t(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT s.ngram,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT d.doc_id) AS n_docs
        FROM _udtf_docs d, LATERAL ngram_spans(d.text, 3) s
        GROUP BY s.ngram
        ORDER BY n_occurrences DESC, s.ngram
        LIMIT 20
        """
    )
