"""Property-based tests for the round-14 kernels.

The oracle differential pins the operators against DuckDB on the
fixture; these hypothesis tests pin the KERNELS against independent
pure-Python models on adversarial inputs the fixture never produces —
corpora where a window hash is co-owned by several eval docs (the case
the forget algebra exists for), packing scopes with giant/zero-length
documents, and unsegmented text right at the degeneracy threshold.
"""

from __future__ import annotations

import hashlib
import re
import sys
from collections import Counter
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from zylyty_data_engineer_challenge_spark.operators import curate, text  # noqa: E402
from zylyty_data_engineer_challenge_spark.operators.dedup import K_SPAN  # noqa: E402

_SETTINGS = settings(
    max_examples=10,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- contamination window-count algebra ------------------------------------

# three fixed K_SPAN-token passages; docs mix them so window hashes are
# CO-OWNED across documents — the case plain hash deletion over-forgets
_PASSAGES = [
    " ".join(f"p{j}w{i}" for i in range(K_SPAN)) for j in range(3)
]

_doc_strategy = st.lists(
    st.tuples(
        st.lists(st.integers(min_value=0, max_value=2), min_size=0, max_size=2),
        st.integers(min_value=0, max_value=5),  # filler words
    ),
    min_size=1,
    max_size=8,
)


def _doc_text(passage_ids, n_filler, doc_id):
    parts = [_PASSAGES[p] for p in passage_ids]
    parts += [f"d{doc_id}f{i}" for i in range(n_filler)]
    return " ".join(parts)


def _model_window_counts(texts: dict[int, str]) -> Counter:
    """Pure-Python mirror of _eval_window_counts: every K_SPAN-token
    window of every doc, md5-hashed, with multiplicity."""
    c: Counter = Counter()
    for _doc_id, t in texts.items():
        toks = re.split(r"\s+", t)
        for i in range(len(toks) - K_SPAN + 1):
            h = hashlib.md5(
                " ".join(toks[i : i + K_SPAN]).encode()
            ).hexdigest()
            c[h] += 1
    return c


@given(spec=_doc_strategy)
@_SETTINGS
def test_window_counts_match_pure_model(spark, spec):
    texts = {
        i: _doc_text(p, f, i) for i, (p, f) in enumerate(spec)
    }
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    got = {
        (r["h"], r["c"])
        for r in text._eval_window_counts(docs, F.lit(True)).collect()
    }
    want = set(_model_window_counts(texts).items())
    assert got == want


@given(
    spec=_doc_strategy,
    retract_mod=st.integers(min_value=2, max_value=4),
)
@_SETTINGS
def test_forget_algebra_equals_rebuild_on_survivors(spark, spec, retract_mod):
    """base counts + negated retracted counts, net > 0  ==  the window
    hash set of the surviving docs alone — for EVERY corpus, including
    ones where retracted and surviving docs co-own hashes."""
    texts = {i: _doc_text(p, f, i) for i, (p, f) in enumerate(spec)}
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    base = text._eval_window_counts(docs, F.lit(True))
    negated = text._eval_window_counts(
        docs, F.col("doc_id") % retract_mod == 0
    ).select("h", (-F.col("c")).alias("c"))
    got = {
        r["h"]
        for r in base.unionByName(negated)
        .groupBy("h")
        .agg(F.sum("c").alias("c"))
        .filter(F.col("c") > 0)
        .collect()
    }
    survivors = {i: t for i, t in texts.items() if i % retract_mod != 0}
    want = set(_model_window_counts(survivors))
    assert got == want


# --- FFD packing fold vs a pure-Python mirror -------------------------------


def _model_ffd(lens_sorted, budget):
    """Exact mirror of the fold: first bin with room, else a new bin
    (an oversized doc opens its own over-budget bin)."""
    bins = []  # [load, n_docs]
    for d in lens_sorted:
        for b in bins:
            if b[0] + d <= budget:
                b[0] += d
                b[1] += 1
                break
        else:
            bins.append([d, 1])
    return [(i, b[0], b[1]) for i, b in enumerate(bins)]


_lens_strategy = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=40),  # zero-length docs included
        st.integers(min_value=200, max_value=400),  # over-budget docs
    ),
    min_size=1,
    max_size=30,
)


@given(lens=_lens_strategy, budget=st.integers(min_value=1, max_value=256))
@_SETTINGS
def test_ffd_pack_matches_pure_model(spark, lens, budget):
    sized = spark.createDataFrame(
        [
            Row(lang="en", bucket=0, n_tokens=n, doc_id=i)
            for i, n in enumerate(lens)
        ]
    )
    rows = curate._ffd_pack(sized, budget=budget).collect()
    got = [
        (r["seq_id"], r["fill_tokens"], r["n_docs"])
        for r in rows
        if r["bucket"] == 0
    ]
    # the kernel sorts by length desc, doc_id asc
    order = [n for n, _ in sorted(zip(lens, range(len(lens))), key=lambda t: (-t[0], t[1]))]
    want = _model_ffd(order, budget)
    assert got == want
    # certificate conservation: packed mass == input mass, docs == docs
    cert = [r for r in rows if r["bucket"] == -1][0]
    assert cert["fill_tokens"] == sum(lens)
    assert cert["n_docs"] == len(lens)
    assert cert["seq_id"] == len(want)
    # no multi-doc bin over budget (only a single oversized doc may be)
    for _, fill, n in got:
        assert fill <= budget or n == 1


# --- CJK degeneracy threshold ------------------------------------------------


@given(
    n_chars=st.integers(min_value=1, max_value=60),
    n_tokens=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_cjk_threshold_is_exact(spark, n_chars, n_tokens):
    """used_fallback fires iff total chars > CJK_MAX_TOK_CHARS * tokens,
    exactly at the integer boundary, for evenly-split synthetic docs."""
    per = n_chars // n_tokens
    if per == 0:
        return
    words = ["数" * per for _ in range(n_tokens)]
    total = per * n_tokens
    docs = spark.createDataFrame([Row(doc_id=0, text=" ".join(words))])
    r = text._token_stats_cjk_kernel(docs).collect()[0]
    expect_fb = int(total > text.CJK_MAX_TOK_CHARS * n_tokens)
    assert r["used_fallback"] == expect_fb
    assert r["n_ws_tokens"] == n_tokens
    assert r["sum_tok_chars"] == total
    assert r["n_tokens_effective"] == (
        total - 1 if expect_fb else n_tokens
    )
