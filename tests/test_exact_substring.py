"""dedup_exact_substring edge semantics on a handcrafted corpus.

The oracle differential pins the operator on the fixture; these tests pin
the contract points the fixture can't isolate: sub-K documents (zero
windows, NULL dup_frac — never 0/0), within-document repeats NOT counting
as duplication (the flag requires a DISTINCT other document), and exact
window accounting when a shared K-token run straddles several windows.
"""

from __future__ import annotations

import pytest

from zylyty_data_engineer_challenge_spark.operators.dedup import (
    K_SPAN,
    dedup_exact_substring,
)


@pytest.fixture()
def tiny_corpus(spark, tmp_path):
    words = [f"w{i}" for i in range(K_SPAN + 2)]  # K+2 tokens: 3 windows
    shared = " ".join(words)
    rows = [
        (0, shared),                    # dup of doc 1 (all 3 windows shared)
        (1, shared),
        (2, "unique " + " ".join(f"x{i}" for i in range(K_SPAN))),  # K+1 toks, 2 windows, no dups
        (3, "too short"),               # < K tokens: 0 windows
        (4, " ".join(words[:K_SPAN]) + " " + " ".join(words[:K_SPAN])),  # self-repeat only? no: window also in docs 0/1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("n_chars", df.text.substr(1, 1).isNotNull().cast("int"))
    path = str(tmp_path / "documents.parquet")
    df.write.parquet(path)
    return str(tmp_path)


def test_exact_substring_edge_semantics(spark, tiny_corpus):
    out = {
        int(r["doc_id"]): (int(r["n_windows"]), int(r["dup_windows"]), r["dup_frac"])
        for r in dedup_exact_substring(spark, tiny_corpus).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}

    # identical docs: every window flagged, coverage 1.0
    assert out[0] == (3, 3, 1.0)
    assert out[1] == (3, 3, 1.0)

    # unique doc: windows counted, none flagged, coverage 0.0
    assert out[2][0] == 2 and out[2][1] == 0 and out[2][2] == 0.0

    # sub-K doc: zero windows and NULL (not 0/0) coverage
    assert out[3] == (0, 0, None)


def test_within_doc_repeat_alone_is_not_duplication(spark, tmp_path):
    """A span repeated twice INSIDE one document, appearing in no other
    document, must not flag (COUNT(DISTINCT doc_id) >= 2, not COUNT)."""
    run = " ".join(f"y{i}" for i in range(K_SPAN))
    rows = [(0, run + " zz " + run), (1, "completely different tokens here novel")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "documents.parquet")
    df.write.parquet(path)

    out = {
        int(r["doc_id"]): int(r["dup_windows"])
        for r in dedup_exact_substring(spark, str(tmp_path)).collect()
    }
    assert out[0] == 0, "self-repeat must not count as cross-doc duplication"
