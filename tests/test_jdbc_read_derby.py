"""In-env JDBC READ path over embedded Derby (VERDICT r11 #4): the read
half of the reference's DB surface (src/db_operations.py:29 reads the
stored table back in one driver-side query). r11 proved the write/MERGE
half executes here; these tests prove the read half with its scale
mechanics intact:

- a pushed predicate reaches the JDBC source (plan pin: the scan row's
  ``PushedFilters`` carries the filter with the ``*`` fully-handled
  marker, and the plan has NO post-scan Filter node);
- column pruning reaches the remote query (plan pin: ``ReadSchema``
  lists only the projected columns);
- the read is row-equal to the parquet twin of the same merged state;
- the partitioned range read (partitionColumn/lowerBound/upperBound/
  numPartitions) yields N partitions and the same rows.

Read-side dialect facts measured here (beside the write-side ones in
test_jdbc_merge_derby.py): Spark resolves the partition column against
the table schema case-insensitively and dialect-quotes it into the
generated range WHERE clauses, so case-exact (quoted-lowercase) Derby
schemas work with the bare column name; pushed filters are likewise
dialect-quoted.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.jdbc_upsert import upsert_via_jdbc
from data_ingestion_lambda_spark.schemas import CONSUMPTION_TARGET_SCHEMA, UPSERT_KEYS
from data_ingestion_lambda_spark.sources.jdbc_source import read_jdbc_table

_QCOLS = ", ".join(f'"{c}"' for c in UPSERT_KEYS)

_TARGET_DDL = f"""
CREATE TABLE consumptions (
    "date" DATE NOT NULL,
    "client_id" VARCHAR(32) NOT NULL,
    "client_name" VARCHAR(64),
    "service_name" VARCHAR(64),
    "total_consumed_tokens" BIGINT NOT NULL,
    "created_at" TIMESTAMP,
    "updated_at" TIMESTAMP,
    "is_active" BOOLEAN,
    PRIMARY KEY ({_QCOLS})
)
"""

_STAGING_TYPES = (
    "date DATE, client_id VARCHAR(32), client_name VARCHAR(64), "
    "service_name VARCHAR(64), total_consumed_tokens BIGINT"
)

_T0 = dt.datetime(2025, 6, 1, 0, 0, 0)
_T1 = dt.datetime(2025, 6, 2, 12, 30, 0)
_D = dt.date(2025, 6, 1)

# The merged state the write-side tests pin — the READ tests start from
# the same upsert so they read a MERGE-produced table, not a seed.
_MERGED_ROWS = [
    (_D, "c1", "acme corp", "chat-v2", 175, _T0, _T1, True),
    (_D, "c2", "globex", "embed", 50, _T0, _T0, True),
    (_D, "c3", "initech", "chat", 20, _T1, _T1, True),
]


@pytest.fixture()
def derby_merged(spark, tmp_path):
    """Embedded Derby with the consumptions table in its post-MERGE
    state (seed two rows, upsert a matched update + a new key)."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(_TARGET_DDL)
    st.execute(
        "INSERT INTO consumptions VALUES "
        "(DATE('2025-06-01'), 'c1', 'acme', 'chat', 100, "
        " TIMESTAMP('2025-06-01 00:00:00'), TIMESTAMP('2025-06-01 00:00:00'), true), "
        "(DATE('2025-06-01'), 'c2', 'globex', 'embed', 50, "
        " TIMESTAMP('2025-06-01 00:00:00'), TIMESTAMP('2025-06-01 00:00:00'), true)"
    )
    st.close()
    batch = spark.createDataFrame(
        [
            (_D, "c1", "acme corp", "chat-v2", 175, _T0, _T1, True),
            (_D, "c3", "initech", "chat", 20, _T1, _T1, True),
        ],
        CONSUMPTION_TARGET_SCHEMA,
    )
    upsert_via_jdbc(
        batch,
        url,
        "consumptions",
        keys=UPSERT_KEYS,
        ident_quote='"',
        staging_column_types=_STAGING_TYPES,
    )
    yield url
    conn.close()


def _parquet_twin(spark, tmp_path):
    path = str(tmp_path / "twin.parquet")
    spark.createDataFrame(_MERGED_ROWS, CONSUMPTION_TARGET_SCHEMA).write.parquet(path)
    return spark.read.parquet(path)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()))


def test_jdbc_read_pushes_predicate_and_prunes_columns(spark, derby_merged, tmp_path):
    pred = F.col("total_consumed_tokens") >= 100
    got = (
        read_jdbc_table(spark, derby_merged, "consumptions")
        .filter(pred)
        .select("client_id", "total_consumed_tokens")
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the predicate reaches the SOURCE, fully handled (*) — no residual
    # post-scan Filter node re-applies it
    assert "*GreaterThanOrEqual(total_consumed_tokens,100)" in plan, plan
    assert "JDBCRelation(consumptions)" in plan, plan
    assert "Filter" not in plan.replace("PushedFilters", ""), plan
    # column pruning reaches the remote query
    assert (
        "ReadSchema: struct<client_id:string,total_consumed_tokens:bigint>" in plan
    ), plan
    twin = _parquet_twin(spark, tmp_path).filter(pred).select(
        "client_id", "total_consumed_tokens"
    )
    assert _rows(got) == _rows(twin)


def test_jdbc_full_read_row_equals_parquet_twin(spark, derby_merged, tmp_path):
    got = read_jdbc_table(spark, derby_merged, "consumptions")
    assert _rows(got) == _rows(_parquet_twin(spark, tmp_path))
    assert _rows(got) == sorted(_MERGED_ROWS)


def test_jdbc_partitioned_read_is_parallel_and_complete(spark, derby_merged, tmp_path):
    """The range-split read: N concurrent queries, value-complete even
    with bounds tighter than the data (Spark leaves the first/last
    ranges open-ended) — and row-equal to the serial read."""
    part = read_jdbc_table(
        spark,
        derby_merged,
        "consumptions",
        partition_column="total_consumed_tokens",
        lower_bound=0,
        upper_bound=100,  # deliberately BELOW max(175): completeness pin
        num_partitions=2,
    )
    assert part.rdd.getNumPartitions() == 2
    assert "[numPartitions=2]" in part._jdf.queryExecution().executedPlan().toString()
    assert _rows(part) == sorted(_MERGED_ROWS)
    # pushdown composes with the partitioned read
    assert _rows(part.filter(F.col("client_id") != "c2")) == sorted(
        r for r in _MERGED_ROWS if r[1] != "c2"
    )


def test_jdbc_partitioned_read_requires_full_trio(spark):
    with pytest.raises(ValueError, match="range-split trio"):
        read_jdbc_table(
            spark,
            "jdbc:derby:unused",
            "t",
            partition_column="c",
            lower_bound=0,
        )
