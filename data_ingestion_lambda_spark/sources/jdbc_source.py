"""JDBC source: predicate/column pushdown + partitioned parallel reads
(the read half of the reference's DB surface — src/db_operations.py:29
reads the stored table back with pandas/psycopg2 in one driver-side
query; at scale the read must (a) ship the WHERE clause to the
database instead of scanning the table into executors, and (b) split
into N concurrent range queries so one connection isn't the pipe).

``spark.read.jdbc`` already does both; this module is the thin,
documented entry point the engine's tests pin, plus the dialect facts
measured against embedded Derby 10.16 (the same database the write
half's MERGE tests run on — tests/test_jdbc_read_derby.py):

- **Predicate pushdown**: Catalyst compiles supported filters through
  ``JdbcDialect.compileExpression`` into the remote WHERE clause; the
  executed plan's scan row lists them under ``PushedFilters`` with a
  ``*`` marking filters the source fully handles (no post-scan
  re-filter). Identifiers inside compiled filters are QUOTED by the
  dialect, so case-exact (Spark-written) column names resolve on
  uppercase-folding dialects — measured, not guessed.
- **Column pruning**: the generated remote query SELECTs only the
  referenced columns (``ReadSchema``/scan output), so a 2-column
  projection never drags the full row width over the wire.
- **Partitioned reads**: ``partitionColumn/lowerBound/upperBound/
  numPartitions`` turn the scan into N range-predicate queries issued
  in parallel (one per Spark partition). Measured on Spark 4.1 +
  Derby: the partition column is resolved against the table schema
  (case-insensitively) and dialect-quoted into the generated WHERE
  clauses, so both ``total_consumed_tokens`` and the pre-quoted
  ``"total_consumed_tokens"`` work against a case-exact
  (Spark-written, quoted-lowercase) Derby schema. Bounds only steer
  the split points; rows outside [lower, upper) are still read (Spark
  leaves the first/last range queries open-ended), so the partitioned
  read is value-complete regardless of bound choice.

At 100 TB the database side is the bottleneck, not Spark: size
``num_partitions`` to what the database's connection pool and the
key's index can serve (tens, not thousands), and make the partition
column an indexed, roughly-uniform key — a skewed column turns one
range query into the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCHSIZE = 10_000  # rows per JDBC cursor round-trip


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """The stored table as a DataFrame with pushdown intact. Apply
    ``.filter``/``.select`` on the RESULT — Catalyst pushes supported
    predicates and the column list into the remote query (pinned in
    tests/test_jdbc_read_derby.py). Pass the partition_* trio for a
    parallel read; the column goes into generated SQL verbatim, so
    pre-quote it for case-exact schemas (see module docstring)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "read_jdbc_table: partition_column requires lower_bound, "
                "upper_bound and num_partitions (Spark's range-split trio)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
