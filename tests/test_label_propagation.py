"""label_propagation (graph_communities' kernel) vs a pure-Python model.

The oracle differential pins graph_communities on the fixture graph;
these hypothesis tests pin the KERNEL against an independent synchronous
LPA model on adversarial small graphs the fixture never produces — dense
multi-clique overlaps, stars, bridges between cliques (the case where LPA
must differ from connected components).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.operators.graph import (
    LPA_ROUNDS,
    label_propagation,
)

_SETTINGS = settings(
    max_examples=10,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_edges = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
    ).map(lambda e: (min(e), max(e))).filter(lambda e: e[0] < e[1]),
    min_size=1,
    max_size=20,
)


def _model_lpa(n_nodes: int, edges: set, rounds: int) -> dict:
    nbrs = {v: [] for v in range(n_nodes)}
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lbl = {v: v for v in range(n_nodes)}
    for _ in range(rounds):
        nxt = {}
        for v in range(n_nodes):
            if not nbrs[v]:
                nxt[v] = lbl[v]
                continue
            counts = Counter(lbl[u] for u in nbrs[v])
            best = max(counts.values())
            nxt[v] = min(label for label, c in counts.items() if c == best)
        lbl = nxt
    return lbl


@given(edges=_edges)
@_SETTINGS
def test_label_propagation_matches_model(spark, edges):
    n = 8
    nodes = spark.createDataFrame([(v,) for v in range(n)], "node long")
    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        int(r["node"]): int(r["lbl"])
        for r in label_propagation(nodes, edf, rounds=LPA_ROUNDS).collect()
    }
    assert got == _model_lpa(n, edges, LPA_ROUNDS)


def test_lpa_separates_bridged_cliques():
    """Two 4-cliques joined by a single bridge edge: CC merges them into
    one component, LPA must keep two communities (the bridge label is
    always outvoted by the clique majority)."""
    import itertools

    from zylyty_data_engineer_challenge_spark.session import get_spark

    spark = get_spark("lpa-test")
    c1, c2 = [0, 1, 2, 3], [4, 5, 6, 7]
    edges = (
        list(itertools.combinations(c1, 2))
        + list(itertools.combinations(c2, 2))
        + [(3, 4)]
    )
    nodes = spark.createDataFrame([(v,) for v in range(8)], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        int(r["node"]): int(r["lbl"])
        for r in label_propagation(nodes, edf).collect()
    }
    assert len({got[v] for v in range(8)}) >= 2, (
        f"bridge must not merge the cliques: {got}"
    )
    assert got == _model_lpa(8, set(edges), LPA_ROUNDS)
