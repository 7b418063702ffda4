"""Property-based tests for the round-9c kernels.

The oracle differential pins these operators against DuckDB on the
fixture; these hypothesis tests pin the KERNELS against independent
pure-Python models on adversarial inputs the fixture never produces —
constant count series, single-user baskets, disconnected graphs, set
families with total or zero overlap.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.operators.graph import (
    neighbor_jaccard_pairs,
)
from zylyty_data_engineer_challenge_spark.operators.sketches import (
    kmv_pair_estimates,
)
from zylyty_data_engineer_challenge_spark.queries.timeseries import (
    CUSUM_FRAC_PCT,
    basket_pairs,
    cusum_scan,
)

_SETTINGS = settings(
    max_examples=10,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- CUSUM ----------------------------------------------------------------

_counts = st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12)


@given(_counts)
@_SETTINGS
def test_cusum_scan_matches_model(spark, counts):
    n, total = len(counts), sum(counts)
    cusums, run = [], 0
    for c in counts:
        run += c * n - total
        cusums.append(run)
    peak = max(abs(x) for x in cusums)
    want = [
        (d, c, cu, 1 if abs(cu) * 100 >= peak * CUSUM_FRAC_PCT else 0)
        for d, (c, cu) in enumerate(zip(counts, cusums))
    ]
    daily = spark.createDataFrame(
        [(d, c) for d, c in enumerate(counts)], "d int, c long"
    )
    got = [
        (r["d"], r["c"], r["cusum"], r["is_changepoint"])
        for r in cusum_scan(daily).orderBy("d").collect()
    ]
    assert got == want
    assert got[-1][2] == 0  # telescoping identity


# --- market basket --------------------------------------------------------

_baskets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user
        st.sampled_from(["p", "q", "r", "s"]),  # item
    ),
    min_size=1,
    max_size=20,
)


@given(_baskets)
@_SETTINGS
def test_basket_pairs_match_model(spark, baskets):
    ut = sorted(set(baskets))
    users = {u for u, _ in ut}
    items = sorted({i for _, i in ut})
    holders = {i: {u for u, j in ut if j == i} for i in items}
    want = {}
    for a, b in combinations(items, 2):
        support = len(holders[a] & holders[b])
        if support:
            want[(a, b)] = (
                support,
                len(holders[a]),
                len(holders[b]),
                len(users),
                1 if support * len(users) > len(holders[a]) * len(holders[b]) else 0,
            )
    df = spark.createDataFrame(ut, "user_id long, event_type string")
    got = {
        (r["type_a"], r["type_b"]): (
            r["support"],
            r["n_a"],
            r["n_b"],
            r["n_users"],
            r["positive_assoc"],
        )
        for r in basket_pairs(df).collect()
    }
    assert got == want


# --- neighborhood Jaccard -------------------------------------------------

_edges = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
    ).map(lambda e: (min(e), max(e))).filter(lambda e: e[0] < e[1]),
    min_size=1,
    max_size=15,
)


@given(_edges)
@_SETTINGS
def test_neighbor_jaccard_matches_bruteforce(spark, edges):
    nodes = sorted({v for e in edges for v in e})
    nbr = {v: set() for v in nodes}
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    want = {}
    for a, b in combinations(nodes, 2):
        if (a, b) in edges:
            continue
        common = len(nbr[a] & nbr[b])
        if common >= 1:
            want[(a, b)] = (common, len(nbr[a] | nbr[b]))
    df = spark.createDataFrame(sorted(edges), ["d1", "d2"])
    got = {
        (r["a"], r["b"]): (r["n_common"], r["n_union"])
        for r in neighbor_jaccard_pairs(df, min_common=1).collect()
    }
    assert got == want


# --- KMV pair estimates ---------------------------------------------------


def _h60(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


_families = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),  # source
        st.sampled_from([f"t{i}" for i in range(12)]),  # token
    ),
    min_size=2,
    max_size=30,
)


@given(_families, st.integers(min_value=1, max_value=5))
@_SETTINGS
def test_kmv_pair_estimates_match_model(spark, family, k):
    stset = sorted(set(family))
    sources = sorted({s for s, _ in stset})
    vocab = {s: {t for x, t in stset if x == s} for s in sources}
    want = {}
    for a, b in combinations(sources, 2):
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        # union bottom-k on (hash, token) order; membership via true sets
        topk = sorted(vocab[a] | vocab[b], key=lambda t: (_h60(t), t))[:k]
        y = sum(1 for t in topk if t in vocab[a] and t in vocab[b])
        want[(a, b)] = (inter, union, len(topk), y)
    df = spark.createDataFrame(stset, "source string, token string")
    got = {
        (r["sa"], r["sb"]): (
            r["exact_inter"],
            r["exact_union"],
            r["k_eff"],
            r["kmv_inter"],
        )
        for r in kmv_pair_estimates(df, k=k).collect()
    }
    assert got == want
