"""Explicit schemas — no inference anywhere (inference at 100 TB means a
full extra pass over the data and nondeterministic types per file).

The consumption schema mirrors the reference's CSV contract
(sample_data/consumption_2025_05_01.csv:1; enforced column list
src/db_operations.py:65-72) but reads everything as *strings* first:
parsing/coercion happens in one explicit, testable normalize step
(functions/normalize.py) instead of pandas dtype inference
(src/s3_processor.py:91).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CORRUPT_COL = "_corrupt_record"

# Raw CSV contract: the 5 reference columns + corrupt-record capture.
CONSUMPTION_RAW_SCHEMA = StructType(
    [
        StructField("date", StringType()),
        StructField("client_id", StringType()),
        StructField("client_name", StringType()),
        StructField("service_name", StringType()),
        StructField("total_consumed_tokens", StringType()),
        StructField(CORRUPT_COL, StringType()),
    ]
)

EXPECTED_COLUMNS = [
    "date",
    "client_id",
    "client_name",
    "service_name",
    "total_consumed_tokens",
]

# Target table: reference's `consumptions` (src/db_operations.py:77-84),
# primary key (date, client_id).
CONSUMPTION_TARGET_SCHEMA = StructType(
    [
        StructField("date", DateType(), nullable=False),
        StructField("client_id", StringType(), nullable=False),
        StructField("client_name", StringType()),
        StructField("service_name", StringType()),
        StructField("total_consumed_tokens", LongType(), nullable=False),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
        StructField("is_active", BooleanType()),
    ]
)

UPSERT_KEYS = ["date", "client_id"]
