"""Property-based pins for the last-writer-wins MERGE (hypothesis).

The targeted tests pin specific replay scenarios; these properties pin
the general contract over randomized batches:

1. **Replay idempotence** — re-merging the batch just merged never
   changes table state (the exactly-once-from-at-least-once claim).
2. **LWW semantics** — after merging b1 then b2, each key holds the last
   row of the latest batch that wrote it (batch beats stored,
   later-in-batch beats earlier via `_ingest_seq`).

Examples are deliberately few and tiny: each runs two real staged-swap
MERGEs through Spark; the value is randomized key overlap and in-batch
duplication patterns, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.upsert import upsert_into_parquet

KEYS = ["k0", "k1", "k2"]

row = st.tuples(st.sampled_from(KEYS), st.integers(min_value=0, max_value=999))
batch_rows = st.lists(row, min_size=1, max_size=5)


def _mk(spark, rows):
    return spark.createDataFrame(
        [("2025-06-01", k, v, "2025-06-01 00:00:00") for k, v in rows],
        "date string, client_code string, total_consumed_tokens long, updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))


def _state(spark, target):
    return {
        r.client_code: r.total_consumed_tokens
        for r in spark.read.parquet(target).collect()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(b1=batch_rows, b2=batch_rows)
def test_lww_merge_properties(spark, tmp_path_factory, b1, b2):
    target = str(tmp_path_factory.mktemp("upsert_prop") / "t")
    upsert_into_parquet(
        spark, target, _mk(spark, b1), keys=["date", "client_code"]
    )
    upsert_into_parquet(
        spark, target, _mk(spark, b2), keys=["date", "client_code"]
    )
    merged = _state(spark, target)

    # LWW: per key, the last row of the latest batch that wrote it
    expected = {}
    for k, v in b1:
        expected[k] = v
    for k, v in b2:
        expected[k] = v
    assert merged == expected

    # replay idempotence: merging b2 again changes nothing
    upsert_into_parquet(
        spark, target, _mk(spark, b2), keys=["date", "client_code"]
    )
    assert _state(spark, target) == merged
