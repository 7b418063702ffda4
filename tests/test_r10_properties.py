"""Property-based tests for the round-10 kernels.

The oracle differential pins the operators against DuckDB on the
fixture; these hypothesis tests pin the KERNELS against independent
pure-Python models on adversarial inputs the fixture never produces —
all-hot-key frames, single-bigram corpora, repeated-document corpora.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.operators.text import LM_Q, text_lm_score
from zylyty_data_engineer_challenge_spark.queries.warehouse import (
    decide_salt_shards,
)

_SETTINGS = settings(
    max_examples=10,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_PURE_SETTINGS = settings(max_examples=300, deadline=None)


# --- decide_salt_shards (pure, exhaustive hypothesis budget) ---------------


@given(
    n_rows=st.integers(min_value=0, max_value=10**12),
    max_count=st.integers(min_value=0, max_value=10**12),
    parallelism=st.integers(min_value=1, max_value=4096),
    cap=st.integers(min_value=1, max_value=4096),
)
@_PURE_SETTINGS
def test_decide_salt_shards_invariants(n_rows, max_count, parallelism, cap):
    got = decide_salt_shards(n_rows, max_count, parallelism, cap)
    # always a usable shard count
    assert 1 <= got <= cap
    if n_rows > 0 and max_count <= n_rows:
        # skew-free key decides "no salting"
        if max_count * parallelism <= n_rows:
            assert got == 1
        # exact ceil(max_count * parallelism / n_rows), clamped
        want = -(-max_count * parallelism // n_rows)
        assert got == max(1, min(cap, want))


@given(
    n_rows=st.integers(min_value=1, max_value=10**9),
    lo=st.integers(min_value=0, max_value=10**9),
    hi=st.integers(min_value=0, max_value=10**9),
)
@_PURE_SETTINGS
def test_decide_salt_shards_monotone_in_hotness(n_rows, lo, hi):
    lo, hi = min(lo, hi), max(lo, hi)
    assert decide_salt_shards(n_rows, lo) <= decide_salt_shards(n_rows, hi)


# --- text_lm_score vs a pure-Python bigram model ---------------------------

_word = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_word, min_size=1, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _pure_lm(corpus: list[str]) -> dict[int, tuple[int, int, int, int]]:
    bgs: list[tuple[int, str, str]] = []
    for i, doc in enumerate(corpus):
        toks = doc.split(" ")
        bgs += [(i, toks[j], toks[j + 1]) for j in range(len(toks) - 1)]
    c12 = Counter((w1, w2) for _, w1, w2 in bgs)
    c1 = Counter(w1 for _, w1, _ in bgs)
    v = len(c1)
    out: dict[int, tuple[int, int, int, int]] = {}
    for i in sorted({d for d, _, _ in bgs}):
        pqs = [
            c12[(w1, w2)] * LM_Q // (c1[w1] + v)
            for d, w1, w2 in bgs
            if d == i
        ]
        out[i] = (len(pqs), sum(pqs), sum(pqs) // len(pqs), min(pqs))
    return out


@given(_corpus)
@_SETTINGS
def test_lm_score_matches_pure_model(spark, tmp_path_factory, corpus):
    sf = tmp_path_factory.mktemp("lm")
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in enumerate(corpus)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))

    want = _pure_lm(corpus)
    got = {
        r["doc_id"]: (r["n_transitions"], r["sum_pq"], r["mean_pq"], r["min_pq"])
        for r in text_lm_score(spark, str(sf)).collect()
    }
    assert got == want
    # smoothed probabilities are strictly below 1: sum_pq < n * LM_Q
    for n, s, _, _ in got.values():
        assert s < n * LM_Q


# --- r11: the Morton-bound law behind q_zorder_probe ------------------------


@given(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)
@settings(max_examples=300, deadline=None)
def test_morton_corner_interval_bounds_every_box_point(x0, x1, y0, y1):
    """q_zorder_probe's file-skipping predicate is only correct if the
    box's corner z-values bound EVERY point in the box (Morton interleave
    is monotone per coordinate). Pure-python property over random boxes —
    a violated bound would make the probe silently drop rows."""
    from zylyty_data_engineer_challenge_spark.queries.warehouse import _morton_py

    x0, x1 = sorted((x0, x1))
    y0, y1 = sorted((y0, y1))
    z_lo, z_hi = _morton_py(x0, y0), _morton_py(x1, y1)
    # sample the box deterministically (corners + edge midpoints + center)
    xs = {x0, x1, (x0 + x1) // 2}
    ys = {y0, y1, (y0 + y1) // 2}
    for x in xs:
        for y in ys:
            z = _morton_py(x, y)
            assert z_lo <= z <= z_hi, (x, y, z, z_lo, z_hi)
