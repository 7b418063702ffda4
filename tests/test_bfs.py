"""Property tests for the multi-source BFS kernel (graph_bfs, r9c)."""

from __future__ import annotations

from zylyty_data_engineer_challenge_spark.operators.graph import bfs_hops


def _run(spark, seeds, edges, max_hops=4):
    s = spark.createDataFrame([(n,) for n in seeds], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["hops"] for r in bfs_hops(s, e, max_hops=max_hops).collect()
    }


def test_chain_distances_and_horizon(spark):
    """0-1-2-3-4-5 chain seeded at 0: hops = index, truncated at the
    horizon (node 5 unreached at max_hops=4)."""
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, [0], edges, max_hops=4)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_multi_source_takes_nearest_seed(spark):
    """Seeds at both ends of a 5-chain: middle node is 2 from either."""
    edges = [(i, i + 1) for i in range(4)]
    got = _run(spark, [0, 4], edges)
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_cycle_does_not_relabel(spark):
    """A 4-cycle seeded at one node: BFS must assign each node its
    MINIMUM distance even though the cycle revisits nodes from both
    directions in the same round."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = _run(spark, [0], edges)
    assert got == {0: 0, 1: 1, 3: 1, 2: 2}


def test_direction_independence(spark):
    """Edges are undirected: reversing every tuple changes nothing."""
    edges = [(0, 1), (2, 1), (2, 3)]
    fwd = _run(spark, [0], edges)
    rev = _run(spark, [0], [(b, a) for a, b in edges])
    assert fwd == rev == {0: 0, 1: 1, 2: 2, 3: 3}


def test_disconnected_component_absent(spark):
    """Nodes in another component never appear in the output."""
    got = _run(spark, [0], [(0, 1), (5, 6)])
    assert got == {0: 0, 1: 1}


def test_seed_in_cluster_is_distance_zero_not_relabeled(spark):
    """A seed adjacent to another seed stays at 0 (anti join protects
    already-labeled nodes from later rounds)."""
    got = _run(spark, [0, 1], [(0, 1), (1, 2)])
    assert got == {0: 0, 1: 0, 2: 1}
