"""Round-10 statistics lanes: driver-side Bradley-Terry fit edge pins.

The distributed sides (events aggregation, the oracle's generated CTE
rounds) are covered by the oracle harness; what needs unit pins is the
collected-grid arithmetic — items that never win, absent pairs, ties —
none of which the sf corpus exercises.
"""

from __future__ import annotations

from data_ingestion_lambda_spark.plans.profiling import _BT_K, bt_fit


def test_bt_dominant_item_outranks():
    rows = {r[0]: r for r in map(tuple, bt_fit({("a", "b"): 9, ("b", "a"): 1}))}
    assert rows["a"][4] == 1 and rows["b"][4] == 2
    assert rows["a"][3] > rows["b"][3]
    assert rows["a"][1] == 9 and rows["a"][2] == 10  # wins, comparisons


def test_bt_zero_win_item_gets_zero_strength():
    rows = {r[0]: r for r in map(tuple, bt_fit({("a", "b"): 5}))}
    assert rows["b"][3] == 0 and rows["b"][4] == 2
    # all mass on the undefeated item after normalization
    assert rows["a"][3] == 10**9


def test_bt_missing_pairs_do_not_divide_by_zero():
    # c never meets a; both have wins, so no (a, c) term ever forms
    rows = {r[0]: r for r in map(tuple, bt_fit({("a", "b"): 3, ("c", "b"): 3}))}
    assert rows["a"][3] == rows["c"][3] > 0  # symmetric -> equal strength
    assert rows["a"][4] == 1 and rows["c"][4] == 2  # tie broken by item asc


def test_bt_symmetric_record_is_uniform():
    cnt = {("a", "b"): 4, ("b", "a"): 4, ("b", "c"): 4, ("c", "b"): 4,
           ("a", "c"): 4, ("c", "a"): 4}
    rows = [tuple(r) for r in bt_fit(cnt)]
    strengths = {r[3] for r in rows}
    assert len(strengths) == 1  # perfectly balanced -> identical ppb


def test_bt_empty_grid():
    assert bt_fit({}) == []
    assert _BT_K >= 1


def test_bt_explicit_universe_includes_comparisonless_item():
    # 'd' never meets anyone: strength 0, still counted in k (the
    # oracle's items CTE shape — review r10)
    rows = {r[0]: r for r in map(tuple,
            bt_fit({("a", "b"): 9, ("b", "a"): 1}, items=["a", "b", "d"]))}
    assert set(rows) == {"a", "b", "d"}
    assert rows["d"][1] == rows["d"][2] == rows["d"][3] == 0
    assert rows["d"][4] == 3
    assert rows["a"][4] == 1


def test_bt_all_ties_universe_yields_zero_strengths():
    rows = [tuple(r) for r in bt_fit({}, items=["a", "b"])]
    assert [(r[3], r[4]) for r in rows] == [(0, 1), (0, 2)]


# --- property pins (hypothesis) --------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_items = st.sampled_from(["a", "b", "c", "d"])
_grids = st.dictionaries(
    st.tuples(_items, _items).filter(lambda p: p[0] != p[1]),
    st.integers(min_value=1, max_value=500),
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(_grids)
def test_bt_strengths_normalize_and_conserve(cnt):
    rows = [tuple(r) for r in bt_fit(cnt)]
    if not rows:
        assert cnt == {}
        return
    k = len(rows)
    total_strength = sum(r[3] for r in rows)
    # normalized to 1e9 up to one floor-loss unit per item
    assert 10**9 - k <= total_strength <= 10**9
    assert sum(r[1] for r in rows) == sum(cnt.values())  # wins conserve
    for item, wins, comps, _s, _rk in rows:
        assert 0 <= wins <= comps
    assert sorted(r[4] for r in rows) == list(range(1, k + 1))  # dense ranks


@settings(max_examples=200, deadline=None)
@given(_grids)
def test_bt_label_permutation_equivariance(cnt):
    ren = {"a": "w", "b": "x", "c": "y", "d": "z"}
    mapped = {(ren[i], ren[j]): c for (i, j), c in cnt.items()}
    base = {r[0]: tuple(r)[1:4] for r in bt_fit(cnt)}
    perm = {r[0]: tuple(r)[1:4] for r in bt_fit(mapped)}
    # a→w … is order-preserving, so ranks AND strengths carry over exactly
    assert {ren[i]: v for i, v in base.items()} == perm


def test_privacy_audit_rollup_planted(spark):
    """The shared k-anonymity/l-diversity rollup on a planted group
    table: 3 groups sized (2, 5, 10) at k=5 -> one violating group,
    2 rows at risk, risk 2/17 in floor ppb."""
    from pyspark.sql import functions as F

    from data_ingestion_lambda_spark.plans.profiling import (
        _privacy_audit_rollup,
    )

    g = spark.createDataFrame(
        [(1, 2), (2, 5), (3, 10)], "grp long, sz long"
    ).select("grp", "sz", F.col("sz").alias("m"))
    row = _privacy_audit_rollup(
        g, 5, "k", "m", "n_violating_groups", "min_group_size"
    ).collect()[0]
    assert (row.k, row.n_rows, row.n_groups) == (5, 17, 3)
    assert row.n_violating_groups == 1 and row.rows_at_risk == 2
    assert row.min_group_size == 2
    assert row.risk_ppb == 2 * 10**9 // 17


def test_t_closeness_audit_planted():
    """Planted grid: global sens split 6A/2B over two groups — an
    all-A group of 4 and a 2A/2B group both sit at exactly 0.25
    variational distance (hand-computed), so t=0.2 flags both and
    t=0.3 flags none."""
    from data_ingestion_lambda_spark.plans.profiling import t_closeness_audit

    cells = [(("g1",), "A", 4), (("g2",), "A", 2), (("g2",), "B", 2)]
    t, n, ngroups, maxd, nover, risk_rows, risk_ppb = t_closeness_audit(
        cells, 200_000_000
    )
    assert (n, ngroups) == (8, 2)
    assert maxd == 250_000_000  # 0.25 exactly, both groups
    assert nover == 2 and risk_rows == 8 and risk_ppb == 10**9
    assert t_closeness_audit(cells, 300_000_000)[4] == 0  # t=0.3: none over
    # SUM-over-empty SQL semantics: every SUM/MAX NULL, COUNT(*) 0
    assert t_closeness_audit([], 200_000_000) == (
        200_000_000, None, 0, None, None, None, None,
    )
