"""Property-based pins for the r10-late kernels.

The oracle differential pins Spark-vs-DuckDB on the fixture; these pin
the KERNELS against independent pure-Python models on adversarial
inputs the fixture never produces — degenerate alphabets where merge
candidates overlap themselves ('aaaa'), tie-heavy pair counts, and
documents whose top bigram sits exactly on the funnel threshold.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.operators import curate, text

_SETTINGS = settings(
    max_examples=8,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _bpe_merge_py(tokens: list[str], p1: str, p2: str) -> list[str]:
    """Reference greedy left-to-right BPE merge."""
    out: list[str] = []
    for tok in tokens:
        if out and out[-1] == p1 and tok == p2:
            out[-1] = p1 + p2
        else:
            out.append(tok)
    return out


def _bpe_train_py(word_freq: dict[str, int], rounds: int):
    """Reference trainer: weighted pair argmax + merge, `rounds` times."""
    syms = {w: [c for c in w] for w in word_freq}
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for w, toks in syms.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += word_freq[w]
        if not counts:
            break
        (p1, p2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((p1, p2, cnt))
        syms = {w: _bpe_merge_py(t, p1, p2) for w, t in syms.items()}
    return merges, syms


# words drawn from a 2-3 letter alphabet: maximally tie- and
# overlap-prone (runs like 'aaaa' where the merge overlaps itself)
_WORDS = st.lists(
    st.text(alphabet="aab", min_size=1, max_size=6).map(lambda s: s or "a"),
    min_size=1,
    max_size=12,
)


@given(words=_WORDS)
@_SETTINGS
def test_bpe_trainer_matches_pure_python_model(spark, tmp_path_factory, words):
    tmp = tmp_path_factory.mktemp("bpe")
    textline = " ".join(words)
    sf = tmp / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(1, textline, "en", "synthetic", len(textline))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))

    got = [
        (r["p1"], r["p2"], r["cnt"])
        for r in text.text_bpe_train(spark, str(sf)).collect()
    ]
    want_merges, want_syms = _bpe_train_py(
        dict(Counter(words)), text.BPE_TRAIN_ROUNDS
    )
    assert got == want_merges

    # and the APPLIED vocabulary agrees symbol-for-symbol (apply side)
    apply_rows = {
        r["doc_id"]: (r["n_words"], r["n_symbols_initial"], r["n_symbols"])
        for r in text.text_bpe_apply(spark, str(sf)).collect()
    }
    freq = Counter(words)
    want_apply = (
        sum(freq.values()),
        sum(len(w) * n for w, n in freq.items()),
        sum(len(want_syms[w]) * n for w, n in freq.items()),
    )
    assert apply_rows == {1: want_apply}


def _funnel_flags_py(doc: str, n_chars: int) -> tuple[bool, bool, bool, bool]:
    import re

    toks = re.split(r"\s+", doc)
    stop = set(text.STOPWORDS)
    n_stop = sum(1 for w in toks if w in stop)
    grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    hist = Counter(grams)
    top2 = max(hist.values()) if hist else 0
    n2 = len(grams)
    g1 = n_chars >= curate.FUNNEL_MIN_CHARS
    g2 = len(toks) >= curate.MIN_TOKENS
    g3 = n_stop * 20 >= len(toks)
    g4 = top2 * 5 < n2
    return g1, g1 and g2, g1 and g2 and g3, g1 and g2 and g3 and g4


_DOC = st.lists(
    st.sampled_from(["the", "a", "cat", "dog", "ran", "far", "x1", "y2"]),
    min_size=1,
    max_size=40,
).map(" ".join)


@given(docs=st.lists(_DOC, min_size=1, max_size=6))
@_SETTINGS
def test_funnel_row_local_flags_match_pure_python(
    spark, tmp_path_factory, docs
):
    tmp = tmp_path_factory.mktemp("funnel")
    sf = tmp / "sf"
    sf.mkdir()
    rows = [(i, d, "en", "synthetic", len(d)) for i, d in enumerate(docs)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))

    # the row-local kernel (streaming path) must agree with the pure
    # model in aggregate — and therefore with the batch histogram path,
    # which the oracle pins to the same aggregate
    flags = curate.funnel_flags_row_local(
        spark.read.parquet(str(sf / "documents.parquet"))
    ).collect()
    got = (
        len(flags),
        sum(r["g1"] for r in flags),
        sum(r["c2"] for r in flags),
        sum(r["c3"] for r in flags),
        sum(r["c4"] for r in flags),
    )
    want_flags = [_funnel_flags_py(d, len(d)) for d in docs]
    want = (
        len(docs),
        sum(f[0] for f in want_flags),
        sum(f[1] for f in want_flags),
        sum(f[2] for f in want_flags),
        sum(f[3] for f in want_flags),
    )
    assert got == want
