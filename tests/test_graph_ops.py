"""Connected-components star contraction: convergence proofs the corpus
can't give (its duplicate clusters are mostly pairs, one triple).

A 33-node path is the adversarial case for naive min-label propagation
(needs 32 rounds = graph diameter); large-star/small-star must collapse it
in O(log^2 n) rounds — the _MAX_ROUNDS cap would trip if it didn't.
"""

from __future__ import annotations

import pytest

from data_ingestion_lambda_spark.plans.graph_ops import connected_components


def _assignments(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "u long, v long")
    rows = connected_components(edges).collect()
    return {r.id: r.cluster_id for r in rows}


def test_long_path_collapses_to_min(spark):
    # 0-1-2-...-32: one component, diameter 32.
    got = _assignments(spark, [(i, i + 1) for i in range(32)])
    assert got == {i: 0 for i in range(33)}


def test_multiple_components_and_orderings(spark):
    # Two components given in arbitrary edge orientation, plus a self-loop
    # (must be ignored) and a duplicate edge.
    edges = [(5, 3), (3, 9), (20, 21), (21, 20), (7, 7), (9, 5)]
    got = _assignments(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_star_input_is_already_converged(spark):
    got = _assignments(spark, [(10, 1), (11, 1), (12, 1)])
    assert got == {1: 1, 10: 1, 11: 1, 12: 1}


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "u long, v long")
    assert connected_components(edges).collect() == []
