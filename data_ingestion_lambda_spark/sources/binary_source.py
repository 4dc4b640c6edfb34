"""Binary-file source: raw media/blob ingestion (SURVEY §2.11).

``spark.read.format('binaryFile')`` is the lake entry point for opaque
payloads (images, audio, video, model shards): each file becomes one row
``(path, modificationTime, length, content)`` with the bytes read lazily
by the executor that owns the split — no driver-side file handling.

Scale notes:
- ``pathGlobFilter`` prunes at LISTING time (files never open);
- the 4-column schema is fixed by the data source, so column pruning works:
  a metadata-only query (count, size histogram) never reads ``content``;
- one row per file ⇒ task granularity is the file. Binary sources do not
  split single files, so shard huge media into object-store-sized chunks
  upstream (the same rule any 100 TB media lake follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """All files under ``path`` (optionally matching ``glob``) as
    ``(path, modificationTime, length, content)`` rows."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def media_table_from_binary(files: DataFrame, kind: str) -> DataFrame:
    """Adapt binaryFile rows to the (doc_id, payload, meta) multimodal
    layout of operators/media.py — doc_id from a stable hash of the path,
    metadata minimal until a decode stage fills it in."""
    return files.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.expr(
            f"named_struct('kind', '{kind}', 'width', CAST(NULL AS INT), "
            "'height', CAST(NULL AS INT), 'channels', CAST(NULL AS INT), "
            "'sample_rate', CAST(NULL AS INT), 'duration_ms', CAST(NULL AS BIGINT), "
            "'fps', CAST(NULL AS INT), 'n_frames', CAST(NULL AS BIGINT))"
        ).alias("meta"),
    )
