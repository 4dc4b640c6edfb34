"""Property-based pins for the SCD2 incremental sink (operators/scd2.py).

test_scd2.py pins N-batch == batch for FIXED fixtures; these properties
pin the same equivalence over RANDOMIZED event streams and RANDOMIZED
chronological batch splits (the same discipline as the LWW property
tests in test_upsert_properties.py): however a chronological feed is cut
into batches, the stored version table must equal the single-batch
derivation. Also pins the crash-recovery guard: a stranded ``.old`` or
``.staging`` sibling from an interrupted swap makes the next apply
refuse loudly instead of silently rebuilding history from one batch.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_lambda_spark.operators.scd2 import apply_scd2, read_scd2

_USERS = ("u1", "u2", "u3")
_SEGMENTS = ("bronze", "silver", "gold")
_T0 = datetime(2025, 6, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (u, _T0 + timedelta(seconds=i), i, seg)
            for (u, i, seg) in rows
        ],
        "user_id string, ts timestamp, event_id bigint, event_type string",
    )


def _rows(df):
    return sorted(
        (r.user_id, r.segment, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_batch_splits_converge_to_single_batch(
    spark, tmp_path_factory, data
):
    n = data.draw(st.integers(min_value=4, max_value=12), label="n_events")
    events = [
        (
            data.draw(st.sampled_from(_USERS), label=f"user_{i}"),
            i,
            data.draw(st.sampled_from(_SEGMENTS), label=f"seg_{i}"),
        )
        for i in range(n)
    ]
    n_cuts = data.draw(st.integers(min_value=0, max_value=3), label="n_cuts")
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            ),
            label="cuts",
        )
    )
    bounds = [0, *cuts, n]
    batches = [events[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]

    root = tmp_path_factory.mktemp("scd2_prop")
    incremental, oneshot = str(root / "inc"), str(root / "one")
    for b in batches:
        apply_scd2(spark, incremental, _mk(spark, b))
    apply_scd2(spark, oneshot, _mk(spark, events))

    assert _rows(read_scd2(spark, incremental)) == _rows(read_scd2(spark, oneshot))

    # replaying the LAST batch is a no-op (exact-duplicate dedup)
    want = _rows(read_scd2(spark, incremental))
    apply_scd2(spark, incremental, _mk(spark, batches[-1]))
    assert _rows(read_scd2(spark, incremental)) == want


@pytest.mark.parametrize("suffix", [".old", ".staging"])
def test_stranded_swap_directory_refuses_loudly(spark, tmp_path, suffix):
    target = str(tmp_path / "scd2")
    apply_scd2(spark, target, _mk(spark, [("u1", 0, "bronze")]))
    os.makedirs(target + suffix)
    with pytest.raises(RuntimeError, match="stranded"):
        apply_scd2(spark, target, _mk(spark, [("u1", 1, "gold")]))
    # history untouched by the refused run
    assert _rows(read_scd2(spark, target)) == [
        ("u1", "bronze", _T0, None, True)
    ]
