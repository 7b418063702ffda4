"""Property-based tests for session-7b primitives.

The oracle differential pins the operators on the fixtures; these
hypothesis tests pin the underlying PRIMITIVES on adversarial inputs the
fixtures never produce — arbitrary PNG dimensions/payload bytes, random
small graphs, SQL strings with nested ORDER BY in every position — so the
codec, the triangle kernel, and the oracle-composition helper hold for
any input shape, not just the synthetic corpus's.

Pure-Python primitives are tested without Spark (hypothesis generates
hundreds of cases; a Spark job per case would be minutes per test). The
one Spark-backed property (triangle counts vs a brute-force reference)
uses a small fixed number of generated cases batched into one job each.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.operators.multimodal import (
    _build_png,
    _decode_png_pixels,
)
from zylyty_data_engineer_challenge_spark.oracle_utils import strip_order_by

# ---------------------------------------------------------------------------
# PNG codec round-trip
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.binary(min_size=0, max_size=200),
)
@settings(max_examples=120, deadline=None)
def test_png_roundtrip_any_dims_any_seed(w, h, seed):
    payload = _build_png(w, h, seed)
    w2, h2, pix = _decode_png_pixels(payload)
    assert (w2, h2) == (w, h)
    assert len(pix) == w * h * 3
    n = max(1, len(seed))
    expect = bytes(
        (seed[(y * w * 3 + i) % n] if seed else 0)
        for y in range(h)
        for i in range(w * 3)
    )
    assert pix == expect


@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    seed=st.binary(min_size=1, max_size=40),
    flip=st.integers(min_value=8, max_value=10_000),
)
@settings(max_examples=80, deadline=None)
def test_png_corruption_never_silently_decodes(w, h, seed, flip):
    """Flipping any single byte after the signature must either raise or
    (only for bytes zlib ignores, e.g. inside the IEND tail padding —
    there is none here, so effectively always) change nothing silently.
    Specifically: a decode that SUCCEEDS after corruption must return the
    original pixels (i.e. the flip hit a byte that cannot alter content,
    which for this chunk layout does not exist — so success means the
    flip was out of range)."""
    payload = bytearray(_build_png(w, h, seed))
    if flip >= len(payload):
        return  # out of range — nothing to test
    payload[flip] ^= 0xFF
    try:
        w2, h2, pix = _decode_png_pixels(bytes(payload))
    except Exception:
        return  # refused — the desired behavior for corruption
    # IHDR/IDAT/IEND all carry CRCs over tag+data, and lengths gate the
    # walk; the only way decode can succeed is if the flip restored an
    # identical byte (impossible with XOR 0xFF)
    raise AssertionError(
        f"corrupted byte {flip} decoded silently: dims=({w2},{h2})"
    )


# ---------------------------------------------------------------------------
# strip_order_by
# ---------------------------------------------------------------------------

_INNER = st.sampled_from(
    [
        "SELECT a, row_number() OVER (ORDER BY b DESC) AS rn FROM t",
        "SELECT a FROM (SELECT a FROM t ORDER BY a)",
        "WITH c AS (SELECT a FROM t ORDER BY a) SELECT * FROM c",
        "SELECT max(a) OVER (PARTITION BY b ORDER BY c ROWS UNBOUNDED PRECEDING) FROM t",
    ]
)


@given(inner=_INNER, tail=st.sampled_from(["", " ORDER BY a", " order by a desc, b"]))
@settings(max_examples=60, deadline=None)
def test_strip_order_by_only_cuts_the_top_level_tail(inner, tail):
    sql = inner + tail
    out = strip_order_by(sql)
    # inner ORDER BYs (window frames, subqueries, CTEs) must survive
    assert out.count("ORDER BY") + out.count("order by") >= inner.count(
        "ORDER BY"
    ) + inner.count("order by") - (1 if tail else 0) + (0 if tail else 0)
    assert out.startswith(inner[: len(inner) // 2])  # prefix intact
    if tail:
        assert out.rstrip() == inner.rstrip()
    else:
        assert out == sql  # nothing top-level to strip


def test_strip_order_by_refuses_limit_tail():
    import pytest

    with pytest.raises(ValueError):
        strip_order_by("SELECT a FROM t ORDER BY a LIMIT 5")


# ---------------------------------------------------------------------------
# triangle counts vs brute force (Spark, batched cases)
# ---------------------------------------------------------------------------


def _brute_triangles(edges):
    nodes = sorted({n for e in edges for n in e})
    eset = set(edges)
    counts = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
        ).map(lambda p: (min(p), max(p))).filter(lambda p: p[0] < p[1]),
        min_size=0,
        max_size=16,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangle_counts_match_bruteforce(spark, edges):
    from zylyty_data_engineer_challenge_spark.operators.graph import triangle_counts

    expect = _brute_triangles(edges)
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), ["d1", "d2"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == expect
