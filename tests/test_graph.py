"""Unit tests for the distributed connected-components operator on
hand-built graphs where the expected clustering is obvious: the oracle
differential only exercises the near-dup graph the corpus happens to
produce, which is mostly tiny components."""

from __future__ import annotations

import pytest

from hadoop_lab_spark.operators.graph import connected_components


def _cc(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id bigint")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs], "id_a bigint, id_b bigint"
    )
    out = connected_components(nodes, edges, "id")
    return dict(out.collect())


def test_path_graph_converges_to_min(spark):
    # 0-1-2-3-4-5: worst case for pure propagation, pointer jumping
    # collapses it logarithmically
    got = _cc(spark, range(6), [(i, i + 1) for i in range(5)])
    assert got == {i: 0 for i in range(6)}


def test_cycle_and_singletons(spark):
    got = _cc(spark, range(8), [(3, 4), (4, 5), (5, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3, 5: 3, 6: 6, 7: 7}


def test_two_components_direction_ignored(spark):
    got = _cc(spark, range(6), [(5, 4), (1, 0), (2, 1)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_empty_edges_all_singletons(spark):
    got = _cc(spark, range(4), [])
    assert got == {i: i for i in range(4)}
