"""binaryFile source: listing-time glob pruning, lazy content, media adapt."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.media import byte_features
from data_ingestion_lambda_spark.sources.binary_source import (
    media_table_from_binary,
    read_binary_files,
)


def _write_blobs(tmp_path):
    blobs = {
        "a.jpg": b"\xff\xd8\xffJPEGDATA" * 10,
        "b.jpg": b"\xff\xd8\xffOTHERJPEG",
        "notes.txt": b"not media",
    }
    sub = tmp_path / "drop" / "nested"
    sub.mkdir(parents=True)
    for name, data in blobs.items():
        (sub / name).write_bytes(data)
    return tmp_path / "drop", blobs


def test_binary_file_rows(spark, tmp_path):
    root, blobs = _write_blobs(tmp_path)
    df = read_binary_files(spark, str(root), glob="*.jpg")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.jpg"}  # txt pruned at listing time
    assert bytes(rows["a.jpg"]["content"]) == blobs["a.jpg"]
    assert rows["a.jpg"]["length"] == len(blobs["a.jpg"])


def test_binary_metadata_only_projection(spark, tmp_path):
    root, blobs = _write_blobs(tmp_path)
    df = read_binary_files(spark, str(root), glob="*.jpg").select("length")
    # content never projected — plan should not mention the content column
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
    assert sorted(r["length"] for r in df.collect()) == sorted(
        len(blobs[n]) for n in ("a.jpg", "b.jpg")
    )


def test_media_adapter_feeds_byte_features(spark, tmp_path):
    root, blobs = _write_blobs(tmp_path)
    media = media_table_from_binary(
        read_binary_files(spark, str(root), glob="*.jpg"), kind="image"
    )
    assert media.schema["payload"].dataType.simpleString() == "binary"
    assert media.schema["meta"].dataType["kind"].dataType.simpleString() == "string"
    feats = {r["n_bytes"]: r for r in byte_features(media).collect()}
    assert set(feats) == {len(blobs["a.jpg"]), len(blobs["b.jpg"])}
    assert feats[len(blobs["a.jpg"])]["first_byte"] == 0xFF
