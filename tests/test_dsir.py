"""curate_dsir_sample (r12): differential vs a pure-Python model on an
adversarial two-distribution corpus (VERDICT r11 item 7).

The oracle differential pins Spark == DuckDB on the fixture, where the
languages share one vocabulary and the weights are near-uniform. These
tests drive the kernel with a corpus where target and raw genuinely
differ — target-language documents drawn from vocabulary A, raw pool
mixing A-documents and B-documents — and assert (1) exact equality with
an independent pure-Python implementation of the weight algebra and the
md5 Bernoulli draw, and (2) the selection actually discriminates:
A-like raw documents are kept at a strictly higher rate than B-like.
"""

from __future__ import annotations

import hashlib
import random

from zylyty_data_engineer_challenge_spark.operators.curate import (
    CURATE_LANG,
    DSIR_BUCKETS,
    DSIR_SCALE,
    DSIR_U_MOD,
    _dsir_weights,
)


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS


def _u(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def _model(docs: list[tuple[int, str, str]]):
    """Pure-Python twin: (doc_id, lang, n_grams, w) weights + kept set."""
    grams = {}
    for doc_id, lang, text in docs:
        toks = [t for t in text.split() if t]
        grams[doc_id] = (lang, [f"{a} {b}" for a, b in zip(toks, toks[1:])])
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for doc_id, (lang, gs) in grams.items():
        for g in gs:
            b = _bucket(g)
            raw[b] = raw.get(b, 0) + 1
            if lang == CURATE_LANG:
                tgt[b] = tgt.get(b, 0) + 1
    weights = {}
    for doc_id, (lang, gs) in grams.items():
        if not gs:
            continue
        total = sum(
            ((tgt.get(_bucket(g), 0) + 1) * DSIR_SCALE) // (raw[_bucket(g)] + 1)
            for g in gs
        )
        weights[doc_id] = (lang, len(gs), total // len(gs))
    wmax = max(w for _, _, w in weights.values())
    kept = {
        doc_id: (lang, n, w, _u(doc_id))
        for doc_id, (lang, n, w) in weights.items()
        if _u(doc_id) * wmax < w * DSIR_U_MOD
    }
    return weights, kept


def _cycle_walk(rng: random.Random, vocab: list[str], k: int) -> str:
    """A k-token walk around the vocabulary CYCLE from a random offset:
    the document's bigram set is a subset of the |vocab| cycle edges, so
    each distribution has only ~|vocab| distinct bigrams — few enough
    that hashing into DSIR_BUCKETS keeps A-grams and B-grams in mostly
    disjoint buckets (i.i.d. token draws would mint ~|vocab|^2 distinct
    bigrams, flood every bucket with both distributions, and wash the
    frequency-ratio signal out — a hashed-feature artifact, not a model
    property)."""
    start = rng.randrange(len(vocab))
    return " ".join(vocab[(start + j) % len(vocab)] for j in range(k))


def _two_dist_corpus():
    rng = random.Random(2302_03169)
    vocab_a = [f"a{i}" for i in range(10)]
    vocab_b = [f"b{i}" for i in range(10)]
    rows = []
    doc_id = 0
    # target corpus: CURATE_LANG documents, pure vocabulary-A cycle walks
    for _ in range(40):
        rows.append((doc_id, CURATE_LANG, _cycle_walk(rng, vocab_a, 30)))
        doc_id += 1
    # raw pool: unlabeled docs, half A-like, half B-like
    for _ in range(40):
        rows.append((doc_id, "xx", _cycle_walk(rng, vocab_a, 30)))
        doc_id += 1
    for _ in range(40):
        rows.append((doc_id, "xx", _cycle_walk(rng, vocab_b, 30)))
        doc_id += 1
    # degenerate docs: no bigrams -> excluded from weighting entirely
    rows.append((doc_id, "xx", "solo"))
    rows.append((doc_id + 1, "xx", ""))
    return rows


def test_dsir_matches_pure_python_model_exactly(spark, tmp_path):
    rows = _two_dist_corpus()
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    weights, kept = _model(rows)

    got_w = {
        int(r["doc_id"]): (r["lang"], int(r["n_grams"]), int(r["w"]))
        for r in _dsir_weights(
            spark.read.parquet(str(tmp_path / "documents.parquet"))
        ).collect()
    }
    assert got_w == weights  # sub-2-token docs excluded on both sides

    from zylyty_data_engineer_challenge_spark.operators.curate import (
        curate_dsir_sample,
    )

    got_kept = {
        int(r["doc_id"]): (r["lang"], int(r["n_grams"]), int(r["w"]), int(r["u"]))
        for r in curate_dsir_sample(spark, str(tmp_path)).collect()
    }
    assert got_kept == kept


def test_dsir_discriminates_target_like_from_off_target(spark, tmp_path):
    """The point of the operator: A-like raw docs (target vocabulary)
    must carry near-max weights and survive at a strictly higher rate
    than B-like raw docs (weights collapse to ~SCALE/(r+1))."""
    rows = _two_dist_corpus()
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from zylyty_data_engineer_challenge_spark.operators.curate import (
        curate_dsir_sample,
    )

    kept = {int(r["doc_id"]) for r in curate_dsir_sample(spark, str(tmp_path)).collect()}
    a_like = [d for d, lang, _ in rows if lang == "xx" and 40 <= d < 80]
    b_like = [d for d, lang, _ in rows if lang == "xx" and 80 <= d < 120]
    a_rate = sum(d in kept for d in a_like) / len(a_like)
    b_rate = sum(d in kept for d in b_like) / len(b_like)
    assert a_rate > 0.5, f"target-like keep rate collapsed: {a_rate}"
    assert b_rate < 0.2, f"off-target keep rate too high: {b_rate}"
    assert a_rate > b_rate


def test_dsir_shift_gate_resampled_is_closer_to_target(spark, tmp_path):
    """The acceptance gate's substance: on the adversarial corpus the
    resampled pool's bucket distribution must sit strictly closer to the
    target's than the raw pool's (exact cross-multiplied comparison of
    the integer numerator/denominator pairs)."""
    from zylyty_data_engineer_challenge_spark.operators.curate import (
        curate_dsir_shift,
    )

    rows = _two_dist_corpus()
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["cmp"]: (int(r["dist_num"]), int(r["denom"]))
        for r in curate_dsir_shift(spark, str(tmp_path)).collect()
    }
    raw_n, raw_d = got["raw_vs_target"]
    res_n, res_d = got["resampled_vs_target"]
    assert res_n * raw_d < raw_n * res_d, got
    # and the gap is substantial on this corpus (half the raw pool is
    # off-distribution; the resample drops almost all of it)
    assert res_n * raw_d * 2 < raw_n * res_d, got


def test_stream_dsir_counts_equals_batch_across_micro_batches(spark, tmp_path):
    """The additive law: the bucket counters maintained over a genuine
    3-micro-batch replay must equal the one-pass batch counts exactly,
    regardless of the split (integer SUMs of row-local events)."""
    import shutil

    from zylyty_data_engineer_challenge_spark.operators.curate import (
        _dsir_gb,
        dsir_bucket_counts,
    )
    from zylyty_data_engineer_challenge_spark.schemas import DOCUMENTS
    from zylyty_data_engineer_challenge_spark.streaming.curate_stream import (
        dsir_counts_stream,
    )

    rows = _two_dist_corpus()
    df = spark.createDataFrame(
        [(d, t, lang, "synthetic", len(t)) for d, lang, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    feed = tmp_path / "feed"
    for i in range(3):
        staging = tmp_path / "staging" / f"chunk_{i}"
        df.filter(df.doc_id % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        [part] = staging.glob("part-*.parquet")
        feed.mkdir(parents=True, exist_ok=True)
        shutil.copy(part, feed / f"chunk_{i}.parquet")

    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed))
    )
    streamed = sorted(
        (int(r["b"]), int(r["r"]), int(r["tc"]))
        for r in dsir_counts_stream(spark, stream).collect()
    )
    batch = sorted(
        (int(r["b"]), int(r["r"]), int(r["tc"]))
        for r in dsir_bucket_counts(_dsir_gb(df)).collect()
    )
    assert streamed == batch
    assert sum(tc for _, _, tc in streamed) > 0  # target mass present
