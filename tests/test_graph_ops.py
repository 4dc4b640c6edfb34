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


# --- bounded-hop BFS (graph_blast_radius's engine) -------------------------
# The sf0.01 LSH graph has no chains, so hops >= 2 and the min-over-paths
# tie-break only get exercised here.

from data_ingestion_lambda_spark.plans.graph_ops import bfs_hops  # noqa: E402


def _hops(spark, seed_ids, edge_list, max_hops):
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "doc_id long")
    edges = spark.createDataFrame(edge_list, "u long, v long")
    rows = bfs_hops(seeds, edges, max_hops).collect()
    got = {}
    for r in rows:
        assert r.doc_id not in got, f"duplicate doc_id {r.doc_id}"
        got[r.doc_id] = r.hops
    return got


def test_bfs_chain_truncates_at_max_hops(spark):
    # 0-1-2-3-4-5: seed at 0, cap 3 -> 4 and 5 unreached/beyond-cap.
    got = _hops(spark, [0], [(i, i + 1) for i in range(5)], max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_min_hop_wins_over_longer_path(spark):
    # Two paths from seed 0 to node 3: 0-1-2-3 (3 hops) and 0-3 (1 hop).
    got = _hops(spark, [0], [(0, 1), (1, 2), (2, 3), (0, 3)], max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}


def test_bfs_multi_seed_nearest_seed_and_seed_overrides(spark):
    # Seeds 0 and 10; node 5 is 2 hops from 0 but 1 from 10. A seed that
    # is also another seed's neighbor stays at hop 0.
    edges = [(0, 1), (1, 5), (10, 5), (0, 10)]
    got = _hops(spark, [0, 10], edges, max_hops=3)
    assert got == {0: 0, 10: 0, 1: 1, 5: 1}


def test_bfs_undirected_and_isolated_seed(spark):
    # Edge given as (2, 7) must also carry 7 -> 2; seed 99 has no edges.
    got = _hops(spark, [7, 99], [(2, 7)], max_hops=2)
    assert got == {7: 0, 99: 0, 2: 1}
