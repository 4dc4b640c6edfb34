"""CSV source with explicit schema + corrupt-record routing (S2).

Reference: downloads each S3 object and lets pandas infer everything
(src/s3_processor.py:82-110). Here: one declarative reader over a glob —
Spark's file index does the listing (no MaxKeys=10 truncation bug,
SURVEY §1.4.5), PERMISSIVE mode captures malformed lines into
``_corrupt_record`` instead of failing the file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.schemas import CONSUMPTION_RAW_SCHEMA, CORRUPT_COL


def read_consumption_csv(
    spark: SparkSession,
    paths: str | list[str],
    path_glob: str | None = "*consumption_*.csv",
) -> DataFrame:
    """Batch read of date-partitioned consumption CSVs.

    ``paths`` may be a root directory (recursive discovery — the Spark
    replacement for the reference's per-prefix list_objects loop,
    src/s3_processor.py:46-59) or explicit file list.
    """
    reader = (
        spark.read.schema(CONSUMPTION_RAW_SCHEMA)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("recursiveFileLookup", True)
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob.split("/")[-1])
    df = reader.csv(paths)
    # Provenance column — the manifest entry's `key` (src/s3_processor.py:61-66).
    return df.withColumn("_source_file", F.input_file_name())
