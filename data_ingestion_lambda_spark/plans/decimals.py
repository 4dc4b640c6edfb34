"""Exact-arithmetic helpers for oracle-deterministic money aggregates.

Summing IEEE doubles is order-dependent, and Spark and DuckDB will not sum
partitions in the same order — so ``SUM(double)`` can differ in the last
ulps between engines and break a value-hash comparison. The fix is to do
the arithmetic in fixed-point decimal (exact, associative in both engines)
and cast the final aggregate back to double (a deterministic conversion).

Precisions are chosen so every intermediate fits in 38 digits in BOTH
engines (DuckDB widens multiplication to p1+p2; Spark to p1+p2+1):
  (12,2) * (12,2)          -> =< (25,4)   ok
  (25,4) * (12,2)          -> =< (38,6)   ok
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(col: str | Column) -> Column:
    """Column cast to exact 2-dp decimal (money / quantity / rates)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum divided by count, in double.

    (Plain ``avg(double)`` is order-dependent; this is not.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


# SQL-side twins (DuckDB syntax == ANSI), kept adjacent so the two engines'
# expressions are reviewed together.
SQL_DEC = "DECIMAL(12,2)"


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS {SQL_DEC})"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) / COUNT({expr}) AS {alias}"
