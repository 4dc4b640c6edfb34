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
