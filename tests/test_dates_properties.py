"""Property pin for the multi-format date-parse chain (reference F1/F2).

One Spark job per example set is too slow for per-example hypothesis, so
the strategy generates a BATCH of (date, format) samples and a single
DataFrame round-trips all of them: every date rendered in any supported
format must parse back to exactly itself, and garbage must parse to NULL
(the quarantine contract) — across the reference's two-digit-year
pivot, month-name boundaries, and leap days.
"""

from __future__ import annotations

from datetime import date

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.functions.dates import parse_date_multi

# d-MMM-yy carries a two-digit year: stay inside the unambiguous
# 2000-2068 pivot window so the expected value is well-defined.
dates = st.dates(min_value=date(2000, 1, 1), max_value=date(2068, 12, 31))

_MMM = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _render(d: date, fmt: str) -> str:
    if fmt == "d-MMM-yy":
        return f"{d.day}-{_MMM[d.month - 1]}-{d.year % 100:02d}"
    if fmt == "yyyy-MM-dd":
        return d.isoformat()
    if fmt == "yyyy_MM_dd":
        return d.isoformat().replace("-", "_")
    return f"{d.month}/{d.day}/{d.year}"  # M/d/yyyy


samples = st.lists(
    st.tuples(dates, st.sampled_from(["d-MMM-yy", "yyyy-MM-dd", "yyyy_MM_dd", "M/d/yyyy"])),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=samples)
def test_every_supported_format_round_trips(spark, batch):
    rows = [(_render(d, fmt), d.isoformat()) for d, fmt in batch]
    rows += [("not-a-date", None), ("32-Jan-25", None), ("", None)]
    df = spark.createDataFrame(rows, "raw string, expected string")
    out = df.select(
        "raw", "expected", parse_date_multi("raw").cast("string").alias("parsed")
    ).collect()
    for r in out:
        assert r.parsed == r.expected, f"{r.raw!r}: {r.parsed} != {r.expected}"
