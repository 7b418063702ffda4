"""Property-based tests for the round-8 kernels.

The oracle differential pins these operators against DuckDB on the
fixture; these hypothesis tests pin the KERNELS against independent
pure-Python models on adversarial inputs the fixture never produces —
degenerate graphs (stars, multi-clique overlaps), corpora built from a
3-word vocabulary so segment collisions are dense, repeated and
boundary-straddling segments — so the semantics hold for any upstream.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.operators.curate import (
    BOILER_SEG,
    boilerplate_strip,
)
from zylyty_data_engineer_challenge_spark.operators.graph import triangle_counts

_SETTINGS = settings(
    max_examples=10,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# undirected edges over a tiny node space: dense triangle collisions
_edges = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
    ).map(lambda e: (min(e), max(e))).filter(lambda e: e[0] < e[1]),
    min_size=1,
    max_size=15,
)


@given(_edges)
@_SETTINGS
def test_triangle_orientations_match_bruteforce(spark, edges):
    nodes = sorted({v for e in edges for v in e})
    want: dict[int, int] = {}
    eset = set(edges)
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= eset:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    df = spark.createDataFrame(sorted(edges), ["d1", "d2"])
    for orient in ("degree", "id"):
        got = {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(df, orient=orient).collect()
        }
        assert got == want, (orient, sorted(edges))


# documents over a 3-word vocabulary: dense cross-doc segment collisions,
# lengths chosen to straddle the BOILER_SEG boundary both ways
_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=2 * BOILER_SEG + 3
    ),
    min_size=1,
    max_size=6,
)


def _boiler_model(texts: list[str]) -> dict[int, tuple[int, int, int, str]]:
    """Pure-Python mirror of boilerplate_strip: disjoint BOILER_SEG-token
    segments, corpus-wide keep-first in (doc_id, seg_idx) order, in-order
    reassembly."""
    seen: set[str] = set()
    out = {}
    segged = []
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        segs = [
            " ".join(toks[i : i + BOILER_SEG])
            for i in range(0, len(toks), BOILER_SEG)
        ]
        segged.append((doc_id, segs))
    for doc_id, segs in segged:
        kept = []
        for seg in segs:
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        clean = " ".join(kept)
        out[doc_id] = (
            len(segs),
            len(kept),
            len(clean),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


@given(_docs)
@_SETTINGS
def test_boilerplate_strip_matches_python_model(spark, docs):
    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_segments"],
            r["n_kept"],
            r["clean_n_chars"],
            r["clean_hash"],
        )
        for r in boilerplate_strip(df).collect()
    }
    assert got == _boiler_model(texts), texts


def test_quantile_sample_rank_invariants(spark):
    """Non-hypothesis invariants on the fixture: the estimate is a real
    data value (its inclusive rank strictly exceeds its strict rank), the
    target rank is within bounds, and the whole output is deterministic
    across runs (md5 replaces the RNG)."""
    from zylyty_data_engineer_challenge_spark.operators.sketches import (
        sketch_quantile_sample,
    )

    sf = "/root/testdata/sf0.001"
    rows = sketch_quantile_sample(spark, sf).collect()
    assert [r["q_pct"] for r in rows] == [25, 50, 75]
    for r in rows:
        assert r["n_lt_est"] < r["n_le_est"], r  # est occurs in the data
        assert 1 <= r["target_rank"] <= r["n_total"], r
        assert r["n_sample"] <= r["n_total"]
    assert rows == sketch_quantile_sample(spark, sf).collect()
