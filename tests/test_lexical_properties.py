"""Property-based pins for the BM25 lexical kernel (r11).

The oracle differential pins Spark-vs-DuckDB on the fixture; these pin
the kernel against an independent pure-Python BM25 model on adversarial
generated corpora the fixture never produces — single-term documents,
every-doc-matches corpora, query terms absent entirely, length-1 and
maximally-repetitive documents. Because every arithmetic step in
``_bm25_rank`` is either exact integer algebra or an IEEE double
operation with pinned association, the python model (same association,
python floats ARE IEEE doubles) must match BIT-FOR-BIT, not
approximately.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zylyty_data_engineer_challenge_spark.operators import lexical
from zylyty_data_engineer_challenge_spark.operators.text import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOP,
)

_SETTINGS = settings(
    max_examples=8,  # each example runs Spark jobs; keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# small alphabet containing the query terms plus fillers, so generated
# corpora exercise hit/miss/df-degenerate cases with high probability
_WORDS = list(BM25_TERMS) + ["the", "a", "zz"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=10)


def _bm25_py(docs: list[list[str]]):
    """Reference BM25 with the exact association of _bm25_rank."""
    k1n, k1d = BM25_K1
    bn, bd = BM25_B
    dls = {i: len(d) for i, d in enumerate(docs)}
    n_docs = len(docs)
    total_tokens = sum(dls.values())
    tf = {}
    for i, d in enumerate(docs):
        for t in BM25_TERMS:
            c = d.count(t)
            if c:
                tf[(i, t)] = c
    df = {t: sum(1 for (_, tt) in tf if tt == t) for t in BM25_TERMS}
    per_term = {}
    for (i, t), f in tf.items():
        # identical association to the score_expr SQL, float64 throughout
        idf_r = float(n_docs - df[t] + 1) / float(df[t] + 1)
        denom = float(f * k1d) + float(k1n) * (
            float(bd - bn) / bd + (float(bn) / bd) * (float(dls[i] * n_docs) / float(total_tokens))
        )
        per_term[(i, t)] = idf_r * (float(f * (k1n + k1d)) / denom)
    scores = {}
    for i in range(n_docs):
        if not any((i, t) in per_term for t in BM25_TERMS):
            continue
        s = per_term.get((i, BM25_TERMS[0]), 0.0)
        for t in BM25_TERMS[1:]:
            s = s + per_term.get((i, t), 0.0)  # left-associated
        scores[i] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOP]
    return [
        (rank + 1, doc_id, score) for rank, (doc_id, score) in enumerate(ranked)
    ]


@given(_corpus)
@_SETTINGS
def test_bm25_rank_matches_python_model_bitwise(spark, docs):
    rows = [
        (i, " ".join(d), "en", "src", len(" ".join(d))) for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    postings, dls, stats = lexical._index_tables(df)
    from pyspark.sql import functions as F

    tf = postings.filter(F.col("term").isin(*BM25_TERMS)).select(
        "doc_id", "term", "tf"
    )
    from zylyty_data_engineer_challenge_spark.operators.text import _bm25_rank

    got = [
        (r["rank"], r["doc_id"], r["score"])
        for r in _bm25_rank(tf, dls, stats).collect()
    ]
    want = _bm25_py(docs)
    assert got == want  # bit-for-bit, including rank ties broken by doc_id
