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


# ---------------------------------------------------------------------------
# dedup_dup_spans (r12): maximal-span merging over consecutive flagged windows
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _spans(spark, sf_dir):
    from zylyty_data_engineer_challenge_spark.operators.dedup import dedup_dup_spans

    return sorted(
        (
            int(r["doc_id"]),
            int(r["span_start"]),
            int(r["span_end"]),
            int(r["span_tokens"]),
            int(r["n_dup_windows"]),
        )
        for r in dedup_dup_spans(spark, sf_dir).collect()
    )


def test_dup_spans_merges_consecutive_windows_to_one_maximal_span(
    spark, tmp_path
):
    """A shared run of L >= K tokens produces L-K+1 consecutive flagged
    windows which MUST merge back into exactly one span of L tokens —
    at the right positions even when the run sits mid-document."""
    run = " ".join(f"s{i}" for i in range(K_SPAN + 4))  # L = K+4 = 12
    rows = [
        (0, run),                                  # run at positions 1..12
        (1, "p0 p1 p2 " + run),                    # run at positions 4..15
    ]
    sf = _write_docs(spark, tmp_path, rows)
    L = K_SPAN + 4
    nw = L - K_SPAN + 1
    assert _spans(spark, sf) == [
        (0, 1, L, L, nw),
        (1, 4, 3 + L, L, nw),
    ]


def test_dup_spans_separated_regions_stay_separate_spans(spark, tmp_path):
    """Two duplicated regions separated by unique tokens must emit TWO
    spans (the islands grouping may not bridge the gap)."""
    s = " ".join(f"s{i}" for i in range(K_SPAN + 4))   # shared with doc 1
    t = " ".join(f"t{i}" for i in range(K_SPAN + 4))   # shared with doc 2
    gap = " ".join(f"u{i}" for i in range(K_SPAN))     # unique to doc 0
    rows = [(0, f"{s} {gap} {t}"), (1, s), (2, t)]
    sf = _write_docs(spark, tmp_path, rows)
    L = K_SPAN + 4
    nw = L - K_SPAN + 1
    got = [sp for sp in _spans(spark, sf) if sp[0] == 0]
    t_start = L + K_SPAN + 1  # s-run, gap, then t-run
    assert got == [
        (0, 1, L, L, nw),
        (0, t_start, t_start + L - 1, L, nw),
    ]


def test_dup_spans_matches_pure_python_model(spark, tmp_path):
    """Differential against an independent pure-Python implementation on
    a seeded random corpus over a tiny vocabulary (dense collisions:
    overlapping runs, isolated repeats, sub-K docs)."""
    import random

    rng = random.Random(12012)
    vocab = [f"v{i}" for i in range(6)]
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randint(K_SPAN - 2, 24))]
        for d in range(12)
    }

    windows: dict[tuple, set] = {}
    per_doc: dict[int, list] = {}
    for d, toks in docs.items():
        ws = (
            [tuple(toks[i : i + K_SPAN]) for i in range(len(toks) - K_SPAN + 1)]
            if len(toks) >= K_SPAN
            else []
        )
        per_doc[d] = ws
        for w in ws:
            windows.setdefault(w, set()).add(d)
    want = []
    for d, ws in per_doc.items():
        flagged = [i + 1 for i, w in enumerate(ws) if len(windows[w]) >= 2]
        spans: list[list[int]] = []
        for pos in flagged:
            if spans and pos == spans[-1][1] + 1:
                spans[-1][1] = pos
                spans[-1][2] += 1
            else:
                spans.append([pos, pos, 1])
        for s0, s1, n in spans:
            want.append((d, s0, s1 + K_SPAN - 1, s1 - s0 + K_SPAN, n))

    sf = _write_docs(
        spark, tmp_path, [(d, " ".join(t)) for d, t in docs.items()]
    )
    assert _spans(spark, sf) == sorted(want)


def test_dup_excise_removes_long_spans_and_keeps_short_ones(spark, tmp_path):
    """The removal policy: a duplicated run >= EXCISE_MIN_TOKENS is cut
    out (reassembly in order), a duplicated run below the threshold is
    flagged by dup_spans but KEPT by excision."""
    import hashlib

    from zylyty_data_engineer_challenge_spark.operators.dedup import (
        EXCISE_MIN_TOKENS,
        dedup_dup_excise,
    )

    long_run = [f"s{i}" for i in range(EXCISE_MIN_TOKENS)]       # excised
    short_run = [f"t{i}" for i in range(K_SPAN)]                 # kept (= K < MIN)
    head = [f"h{i}" for i in range(3)]
    tail = [f"z{i}" for i in range(3)]
    doc0 = head + long_run + short_run + tail
    rows = [
        (0, " ".join(doc0)),
        (1, " ".join(long_run)),   # fully excised (whole doc is the run)
        (2, " ".join(short_run)),  # fully flagged but BELOW the threshold
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        int(r["doc_id"]): (
            int(r["n_tokens"]),
            int(r["n_removed"]),
            r["kept_hash"],
            int(r["kept_chars"]),
        )
        for r in dedup_dup_excise(spark, sf).collect()
    }
    kept0 = " ".join(head + short_run + tail)
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[0] == (len(doc0), EXCISE_MIN_TOKENS, h(kept0), len(kept0))
    assert out[1] == (EXCISE_MIN_TOKENS, EXCISE_MIN_TOKENS, h(""), 0)
    kept2 = " ".join(short_run)
    assert out[2] == (K_SPAN, 0, h(kept2), len(kept2))
