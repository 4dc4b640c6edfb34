"""Multi-format date parsing — the reference's fallback chain, columnar.

Reference behavior (src/s3_processor.py:94-104): try ``%d-%b-%y`` first,
then pandas' generic parser, else leave the value alone with a warning.
Here: a COALESCE over ``try_to_date`` formats — pure codegen, no Python,
NULL when nothing matches (callers quarantine those rows instead of the
reference's warn-and-continue).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: the reference's first-choice format wins ties
# (e.g. '01-May-25' must parse as d-MMM-yy, not fail over).
DATE_FORMATS = (
    "d-MMM-yy",  # reference %d-%b-%y (src/s3_processor.py:98)
    "yyyy-MM-dd",  # ISO (pandas generic fallback's common case)
    "yyyy_MM_dd",  # reference partition-path format (src/s3_processor.py:21)
    "M/d/yyyy",  # US-style, pandas generic accepts it
)


def parse_date_multi(col: str | Column, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """NULL-on-failure multi-format date parse (reference F1/F2)."""
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_date(c, fmt) for fmt in formats]
    return F.coalesce(*attempts)
