"""XML row source (sources/xml_source.py): rowTag extraction,
child-element + attribute field resolution, permissive vs failfast
casting, one InputPartition per file, and the loud no-schema /
no-files refusals."""

from __future__ import annotations

import os

import pytest

from data_ingestion_lambda_spark.sources.xml_source import register_xml_source

SCHEMA = "id long, name string, score double, active boolean"


def _write(path: str, body: str) -> str:
    with open(path, "w") as fh:
        fh.write(body)
    return path


def _read(spark, path, **options):
    register_xml_source(spark)
    r = spark.read.format("xmlrows").schema(SCHEMA).option("path", str(path))
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_roundtrip_attributes_nulls_and_partitions(spark, tmp_path):
    _write(
        str(tmp_path / "a.xml"),
        "<rows>"
        "<row><id>1</id><name>ann</name><score>1.5</score><active>true</active></row>"
        '<row active="false" score="2.5"><id>2</id><name>bob</name></row>'
        "<row><id>3</id><name>cyn</name></row>"
        "</rows>",
    )
    _write(
        str(tmp_path / "b.xml"),
        "<doc><nested><row><id>4</id><name>dee</name><score>nope</score>"
        "<active>1</active></row></nested></doc>",
    )
    df = _read(spark, tmp_path)
    assert df.rdd.getNumPartitions() == 2  # one per file
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score == 1.5 and rows[1].active is True
    # attribute fallback when the child element is absent
    assert rows[2].score == 2.5 and rows[2].active is False
    # missing field -> NULL
    assert rows[3].score is None and rows[3].active is None
    # unparseable value -> NULL under permissive; boolean '1' parses
    assert rows[4].score is None and rows[4].active is True


def test_failfast_raises_on_bad_value(spark, tmp_path):
    _write(
        str(tmp_path / "bad.xml"),
        "<rows><row><id>x</id><name>z</name></row></rows>",
    )
    with pytest.raises(Exception, match="cannot cast"):
        _read(spark, tmp_path, mode="failfast").collect()


def test_refusals(spark, tmp_path):
    register_xml_source(spark)
    # no schema -> loud error (no dtype guessing)
    with pytest.raises(Exception, match="supply the schema"):
        spark.read.format("xmlrows").option("path", str(tmp_path)).load()
    # no matching files -> loud error
    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(Exception, match="no files match"):
        _read(spark, tmp_path / "empty").collect()
