"""Oracle-checkable twins of the ingestion engine's merge semantics
(SURVEY §2.1 S7) on the driver testdata.

The real upsert path (operators/upsert.py, streaming/ingest.py) is covered
by pytest; these queries prove the *semantics* — last-writer-wins keyed
dedup — against the DuckDB oracle. lineitem conveniently contains genuine
duplicate (l_orderkey, l_linenumber) keys.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from data_ingestion_lambda_spark.plans.decimals import dsum
from data_ingestion_lambda_spark.plans.registry import register
from data_ingestion_lambda_spark.plans._util import t

# Deterministic "recency" for the demo: higher quantity wins, then price,
# then the remaining columns as tie-breakers (a real ingest uses _ingest_seq).
_ORDER_SQL = "l_quantity DESC, l_extendedprice DESC, l_partkey, l_suppkey, l_discount, l_tax"

# (sf_dir, format) -> temp path already derived in this process.
_ROUNDTRIP_CACHE: dict[tuple[str, str], str] = {}


def _roundtrip_path(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write nation once per process per (sf_dir, format) into a temp dir
    and return the path — repeated builder calls (bench min-of-2 passes,
    oracle pre-flight + driver) must not each run a write job or leak a
    fresh temp dir."""
    key = (sf_dir, fmt)
    path = _ROUNDTRIP_CACHE.get(key)
    if path is None:
        n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
        if fmt == "text":
            # text sink takes exactly one string column
            n = n.select(
                F.concat_ws("\t", "n_nationkey", "n_name", "n_regionkey").alias("value")
            )
        path = tempfile.mkdtemp(prefix=f"dils_{fmt}_src_") + f"/nation_{fmt}"
        writer = n.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", True)
        writer.format(fmt).save(path)
        _ROUNDTRIP_CACHE[key] = path
    return path


@register(
    "upsert_last_writer_wins",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey, l_linenumber
                   ORDER BY {_ORDER_SQL}) AS rn
        FROM lineitem
    ) WHERE rn = 1
    GROUP BY l_returnflag
    """,
    tags=("ingest", "upsert"),
)
def upsert_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed last-writer-wins MERGE (the upsert sink's core window) applied
    to lineitem's duplicate (orderkey, linenumber) keys.

    Scale: identical shape to operators/upsert.py — one shuffle on the key,
    row_number, filter. No driver-side state."""
    l = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_quantity"),
        F.desc("l_extendedprice"),
        "l_partkey",
        "l_suppkey",
        "l_discount",
        "l_tax",
    )
    return (
        l.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "dedup_exact_keys",
    oracle="""
    SELECT n_dups AS dup_count, COUNT(*) AS n_keys
    FROM (
        SELECT l_orderkey, l_linenumber, COUNT(*) AS n_dups
        FROM lineitem GROUP BY l_orderkey, l_linenumber
    )
    GROUP BY n_dups
    """,
    tags=("ingest", "dedup"),
)
def dedup_exact_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-key profile: how many keys occur once/twice/… — the
    pre-flight diagnostic for any keyed upsert."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("n_dups"))
        .groupBy(F.col("n_dups").alias("dup_count"))
        .agg(F.count("*").alias("n_keys"))
    )


@register(
    "source_json_lines",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "json"),
)
def source_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON *file* source (SURVEY §2.1 S9 — the reference reads/writes JSON
    checkpoint state, src/lambda_handler.py:33,98): round-trips the nation
    table through newline-delimited JSON and reads it back with
    ``spark.read.json`` under an explicit schema. No schema inference — at
    100 TB inference is a full extra pass over the data; production JSON
    reads always carry a declared schema."""
    path = _roundtrip_path(spark, sf_dir, "json")
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    return spark.read.schema(schema).json(path).select("n_nationkey", "n_name", "n_regionkey")


@register(
    "source_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "csv"),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source under a declared schema (SURVEY §2.1 S2 — the
    reference's whole input surface is headered CSV,
    src/s3_processor.py:87-94): round-trips nation through headered CSV
    files and reads it back with the same explicit-schema, no-inference
    discipline as the ingestion source (sources/csv_source.py)."""
    path = _roundtrip_path(spark, sf_dir, "csv")
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .csv(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "source_orc_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "orc"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink (SURVEY §2.1 S9 family — the other columnar format
    Spark ships natively): nation through ORC and back. Like parquet, ORC
    carries its schema in the footer and supports predicate pushdown, so
    the read plans identically to the parquet catalog path."""
    path = _roundtrip_path(spark, sf_dir, "orc")
    return spark.read.orc(path).select("n_nationkey", "n_name", "n_regionkey")


@register(
    "audit_projection",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           COALESCE(CAST(NULL AS BIGINT), 0) AS tokens_coerced,
           TRUE AS is_active,
           CAST(o_orderdate AS DATE) AS partition_date
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    tags=("ingest",),
)
def audit_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's insert projection (P2, src/db_operations.py:78,85-91):
    select + derived audit columns (timestamps excluded — not comparable
    across engines; covered by pytest instead)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce(F.lit(None).cast("bigint"), F.lit(0)).alias("tokens_coerced"),
        F.lit(True).alias("is_active"),
        F.to_date("o_orderdate").alias("partition_date"),
    )


@register(
    "source_text_lines",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "text"),
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-line source (``spark.read.text`` — the last built-in file
    format not otherwise exercised): round-trips nation through
    tab-delimited lines and re-parses the columns with one codegen
    ``split``. The raw-lines → parse-in-engine split is the production
    shape for log-style inputs: the scan stays a dumb splittable read and
    all structure recovery is Catalyst expressions."""
    path = _roundtrip_path(spark, sf_dir, "text")
    parts = F.split(F.col("value"), "\t")
    return spark.read.text(path).select(
        F.element_at(parts, 1).cast("int").alias("n_nationkey"),
        F.element_at(parts, 2).alias("n_name"),
        F.element_at(parts, 3).cast("int").alias("n_regionkey"),
    )


@register(
    "source_python_datasource",
    oracle="""
    SELECT day,
           COUNT(*) AS n_events,
           CAST(SUM(value_cents) AS BIGINT) AS total_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM (
        SELECT CAST(d AS INTEGER) AS day,
               d * 500 + i AS event_id,
               ((d * 500 + i) * 7919) % 97 AS user_id,
               ((d * 500 + i) * 31) % 10000 AS value_cents
        FROM (SELECT UNNEST(generate_series(0, 3)) AS d),
             (SELECT UNNEST(generate_series(0, 499)) AS i)
    )
    GROUP BY day
    """,
    tags=("sources",),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 Python DataSource API lane (SPARK-44076), oracle-checked:
    read the deterministic ``synthetic_events`` custom source (one
    InputPartition per day, filter pushdown pruning partitions —
    ``sources/python_datasource.py``) and aggregate it per day. The DuckDB
    twin replays the source's exact integer row formula with
    generate_series, proving the custom reader's content — not just its
    shape — matches an independent engine. Ignores sf_dir by design: the
    source generates its data, which is the point of the lane."""
    from data_ingestion_lambda_spark.sources.python_datasource import (
        register_python_sources,
    )

    register_python_sources(spark)
    d = spark.read.format("synthetic_events").load()
    return d.groupBy("day").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").cast("long").alias("total_cents"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )


_XML_FILES = 4
_XML_ROWS = 50  # rows per file
_XML_CATS = ("alpha", "beta", "gamma")


def _write_xml_fixture() -> str:
    """Deterministic row-oriented XML drop: {_XML_FILES} files x
    {_XML_ROWS} rows, every value a pure integer function of the row id
    (the python_datasource lane's reproducible-content discipline) —
    one field deliberately arrives as an ATTRIBUTE and one row in ten
    omits the amount element (exercising the NULL path)."""
    import os
    import shutil
    import tempfile

    out = os.path.join(tempfile.gettempdir(), "dils_xml_fixture")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in range(_XML_FILES):
        rows = []
        for i in range(_XML_ROWS):
            rid = f * _XML_ROWS + i
            cat = _XML_CATS[rid % 3]
            amount = "" if rid % 10 == 9 else f"<amount_cents>{(rid * 31) % 10000}</amount_cents>"
            rows.append(
                f'<row region="{rid % 5}"><id>{rid}</id>'
                f"<category>{cat}</category>{amount}</row>"
            )
        with open(os.path.join(out, f"part_{f}.xml"), "w") as fh:
            fh.write("<rows>" + "".join(rows) + "</rows>")
    return out


@register(
    "source_xml_rows",
    oracle=f"""
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(amount_cents) AS BIGINT) AS n_with_amount,
           CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
           CAST(SUM(region) AS BIGINT) AS region_sum
    FROM (
        SELECT (f.f * {_XML_ROWS} + i.i) AS rid,
               ['alpha', 'beta', 'gamma'][(f.f * {_XML_ROWS} + i.i) % 3 + 1]
                   AS category,
               CASE WHEN (f.f * {_XML_ROWS} + i.i) % 10 = 9 THEN NULL
                    ELSE ((f.f * {_XML_ROWS} + i.i) * 31) % 10000 END
                   AS amount_cents,
               (f.f * {_XML_ROWS} + i.i) % 5 AS region
        FROM (SELECT UNNEST(generate_series(0, {_XML_FILES - 1})) AS f) f,
             (SELECT UNNEST(generate_series(0, {_XML_ROWS - 1})) AS i) i
    )
    GROUP BY category
    """,
    tags=("sources",),
)
def source_xml_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion end-to-end, oracle-checked — the documented
    "spark-xml jar not bundled" environment gap CLOSED with the Python
    DataSource API and stdlib ElementTree (sources/xml_source.py): a
    deterministic row-oriented XML drop (one InputPartition per file;
    child-element values, one attribute-carried field, and a 1-in-10
    missing element exercising the PERMISSIVE null path) is read through
    ``format("xmlrows")`` and aggregated per category. The DuckDB twin
    replays the fixture's integer row formula with generate_series,
    proving the parser's CONTENT — including the null and attribute
    semantics — matches an independent engine. Ignores sf_dir by design:
    the fixture is the point of the lane."""
    from data_ingestion_lambda_spark.sources.xml_source import register_xml_source

    register_xml_source(spark)
    path = _write_xml_fixture()
    d = (
        spark.read.format("xmlrows")
        .schema("id long, category string, amount_cents long, region long")
        .option("path", path)
        .load()
    )
    return d.groupBy("category").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("amount_cents").cast("long").alias("n_with_amount"),
        F.sum("amount_cents").cast("long").alias("total_cents"),
        F.sum("region").cast("long").alias("region_sum"),
    )


_AVRO_FILES = 4
_AVRO_ROWS = 60  # rows per file
_AVRO_CATS = ("alpha", "beta", "gamma")


def _write_avro_fixture() -> str:
    """Deterministic Avro OCF drop: {_AVRO_FILES} files x {_AVRO_ROWS}
    rows, every value a pure integer function of the row id (the XML
    lane's reproducible-content discipline). Exercises the decoder's
    whole supported surface: long, enum (category), ['null','long']
    union (1-in-10 null amount), double (dyadic — exactly
    representable, so the cross-engine hash can't drift), and
    array<long> ([rid, 2*rid]); EVEN files use the null codec, ODD
    files deflate, so both codec paths feed the same oracle."""
    import os
    import shutil
    import tempfile

    from data_ingestion_lambda_spark.sources.avro_source import write_ocf

    out = os.path.join(tempfile.gettempdir(), "dils_avro_fixture")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    schema = {
        "type": "record",
        "name": "fixture_row",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "category",
                "type": {"type": "enum", "name": "cat", "symbols": list(_AVRO_CATS)},
            },
            {"name": "amount_cents", "type": ["null", "long"]},
            {"name": "weight", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "long"}},
        ],
    }
    for f in range(_AVRO_FILES):
        rows = []
        for i in range(_AVRO_ROWS):
            rid = f * _AVRO_ROWS + i
            rows.append(
                (
                    rid,
                    _AVRO_CATS[rid % 3],
                    None if rid % 10 == 9 else (rid * 37) % 10000,
                    (rid % 16) / 16.0,  # dyadic: exact in binary64
                    [rid, 2 * rid],
                )
            )
        write_ocf(
            os.path.join(out, f"part_{f}.avro"),
            schema,
            rows,
            codec="deflate" if f % 2 else "null",
            rows_per_block=17,  # non-divisor → a short tail block per file
        )
    return out


@register(
    "source_avro_rows",
    oracle=f"""
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(amount_cents) AS BIGINT) AS n_with_amount,
           CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
           SUM(weight) AS weight_sum,
           CAST(SUM(3 * rid) AS BIGINT) AS tag_sum
    FROM (
        SELECT (f.f * {_AVRO_ROWS} + i.i) AS rid,
               ['alpha', 'beta', 'gamma'][(f.f * {_AVRO_ROWS} + i.i) % 3 + 1]
                   AS category,
               CASE WHEN (f.f * {_AVRO_ROWS} + i.i) % 10 = 9 THEN NULL
                    ELSE ((f.f * {_AVRO_ROWS} + i.i) * 37) % 10000 END
                   AS amount_cents,
               CAST((f.f * {_AVRO_ROWS} + i.i) % 16 AS DOUBLE) / 16e0
                   AS weight
        FROM (SELECT UNNEST(generate_series(0, {_AVRO_FILES - 1})) AS f) f,
             (SELECT UNNEST(generate_series(0, {_AVRO_ROWS - 1})) AS i) i
    )
    GROUP BY category
    """,
    tags=("sources",),
)
def source_avro_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro ingestion end-to-end, oracle-checked — the LAST documented
    data-format gap ("spark-avro jar not bundled", SURVEY §2.11) CLOSED
    with a pure-stdlib OCF decoder on the Python DataSource API
    (sources/avro_source.py): a deterministic OCF drop (one
    InputPartition per file; zigzag varints, enum, ['null','long']
    union, double, array blocks, null AND deflate codecs, short tail
    blocks) is read through ``format("avroocf")`` with the schema taken
    from the files' own embedded headers, then aggregated per category
    (array content folded via the JVM-side higher-order
    ``aggregate``). The DuckDB twin replays the fixture's integer row
    formula with generate_series, proving the binary decoder's CONTENT
    — null-union, enum mapping, both codecs — matches an independent
    engine. The double column is dyadic (k/16) so SUM is exact in both
    engines. Ignores sf_dir by design: the fixture is the point of the
    lane."""
    from data_ingestion_lambda_spark.sources.avro_source import register_avro_source

    register_avro_source(spark)
    path = _write_avro_fixture()
    d = spark.read.format("avroocf").option("path", path).load()
    return d.groupBy("category").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("amount_cents").cast("long").alias("n_with_amount"),
        F.sum("amount_cents").cast("long").alias("total_cents"),
        F.sum("weight").alias("weight_sum"),
        F.sum(
            F.aggregate("tags", F.lit(0).cast("long"), lambda acc, x: acc + x)
        ).alias("tag_sum"),
    )
