from data_ingestion_lambda_spark.plans.registry import REGISTRY, QuerySpec, all_specs, register

# Importing these modules populates REGISTRY via @register decorators.
from data_ingestion_lambda_spark.plans import relational  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import windows  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import setops  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import scalars  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import llm_ops  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import similarity  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import multimodal  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import ingest_queries  # noqa: E402,F401
from data_ingestion_lambda_spark.plans import events_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "all_specs", "register"]
