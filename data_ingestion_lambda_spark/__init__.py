"""data_ingestion_lambda_spark — a PySpark-native analytics/ingestion engine.

A ground-up rebuild of the capabilities of the reference pipeline
(Murtuzasaifee/Data-Ingestion-Lambda — a serverless incremental CSV→Postgres
upsert ETL, see SURVEY.md) as an idiomatic Spark engine:

- incremental discovery of date-partitioned files  → Structured Streaming file
  source + checkpointLocation (`streaming/`)
- schema-enforced CSV parse + multi-format dates   → explicit StructType +
  PERMISSIVE corrupt-record routing (`sources/`, `functions/dates.py`)
- keyed idempotent upsert                          → last-writer-wins MERGE
  (`operators/upsert.py`)
- full relational query surface + LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal)    → `plans/`, `operators/`

Everything is DataFrame/Catalyst-first; Python UDFs only where built-ins
cannot express the semantics (and then Arrow-vectorized).
"""

from data_ingestion_lambda_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
