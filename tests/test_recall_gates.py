"""Recall-gate robustness: the division guard on a duplicate-free corpus
(r6 ADVICE item 2) and the anchor-sampled gate's agreement with the
exhaustive gate on the sampled stratum, plus the shared strip_order_by
helper's refusal semantics (r6 ADVICE item 3).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from zylyty_data_engineer_challenge_spark.operators.dedup import (
    ORACLE_SQL,
    _is_anchor,
    _ngram_jaccard_pairs,
    dedup_lsh_recall,
    dedup_lsh_recall_sampled,
)
from zylyty_data_engineer_challenge_spark.oracle_utils import strip_order_by
from zylyty_data_engineer_challenge_spark.schemas import DOCUMENTS

SF_DIR = "/root/testdata/sf0.001"

# 12 pairwise-dissimilar texts: no shared 3-grams beyond noise, so the
# exact Jaccard>=0.5 pair set is empty by construction.
_UNIQUE_TEXTS = [
    "alpha bravo charlie delta echo foxtrot",
    "golf hotel india juliet kilo lima",
    "mike november oscar papa quebec romeo",
    "sierra tango uniform victor whiskey xray",
    "yankee zulu zero one two three",
    "four five six seven eight nine",
    "red orange yellow green blue indigo",
    "violet magenta cyan teal maroon olive",
    "north south east west up down",
    "spring summer autumn winter solstice equinox",
    "granite basalt marble quartz slate shale",
    "oak maple birch cedar willow aspen",
]


@pytest.fixture(scope="module")
def nodup_dir(spark, tmp_path_factory):
    """A documents fixture with zero near-duplicate pairs."""
    d = tmp_path_factory.mktemp("nodup")
    rows = [
        (i, t, "en", "synthetic", len(t)) for i, t in enumerate(_UNIQUE_TEXTS)
    ]
    spark.createDataFrame(rows, DOCUMENTS).coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_recall_gates_null_on_duplicate_free_corpus(spark, nodup_dir):
    for fn in (dedup_lsh_recall, dedup_lsh_recall_sampled):
        row = fn(spark, nodup_dir).collect()[0]
        assert row["n_exact"] == 0
        assert row["hits"] == 0
        assert row["recall"] is None, f"{fn.__name__} must NULL-guard 0/0"


def test_recall_oracle_null_on_duplicate_free_corpus(nodup_dir):
    """The DuckDB side of the differential must also yield NULL (it used
    to raise division-by-zero, breaking the gate on exactly this input)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nodup_dir}/documents.parquet/*.parquet')"
    )
    for name in ("dedup_lsh_recall", "dedup_lsh_recall_sampled"):
        df = con.execute(ORACLE_SQL[name]).fetchdf()
        assert df["n_exact"][0] == 0
        assert df["recall"].isna()[0], f"{name} oracle must CASE-guard 0/0"


def test_sampled_gate_is_the_anchor_stratum_of_the_full_gate(spark):
    """n_exact of the sampled gate == full exact pairs whose d1 is an
    anchor: the pre-join anchor filter changes cost, never semantics."""
    from zylyty_data_engineer_challenge_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    full = _ngram_jaccard_pairs(docs).select("d1", "d2")
    expected = full.filter(_is_anchor(F.col("d1"))).count()
    row = dedup_lsh_recall_sampled(spark, SF_DIR).collect()[0]
    assert row["n_exact"] == expected
    assert row["n_exact"] <= full.count()


def test_strip_order_by_top_level():
    assert strip_order_by("SELECT a FROM t ORDER BY a").rstrip() == "SELECT a FROM t"
    # untouched when there is no top-level sort
    sql = "SELECT rank() OVER (ORDER BY a) AS r FROM t"
    assert strip_order_by(sql) == sql


def test_strip_order_by_ignores_window_sort_before_outer_sort():
    sql = "SELECT rank() OVER (ORDER BY b) AS r FROM t ORDER BY r"
    assert strip_order_by(sql).rstrip().endswith("FROM t")


def test_strip_order_by_refuses_mid_query_cut():
    with pytest.raises(ValueError):
        strip_order_by("SELECT a FROM t ORDER BY a LIMIT 5")


@pytest.fixture(scope="module")
def nodup_emb_dir(spark, tmp_path_factory):
    """An embeddings fixture with zero cosine-near-dup pairs: pairwise
    one-hot vectors on distinct dimensions, all cross dots exactly 0."""
    from zylyty_data_engineer_challenge_spark.schemas import EMBEDDINGS

    d = tmp_path_factory.mktemp("nodup_emb")
    rows = [
        (i, [1.0 if j == i else 0.0 for j in range(64)], 0) for i in range(12)
    ]
    spark.createDataFrame(rows, EMBEDDINGS).coalesce(1).write.parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def test_embedding_recall_gate_null_on_duplicate_free_corpus(spark, nodup_emb_dir):
    from zylyty_data_engineer_challenge_spark.operators.dedup import (
        dedup_embedding_recall,
    )

    row = dedup_embedding_recall(spark, nodup_emb_dir).collect()[0]
    assert row["n_exact"] == 0
    assert row["hits"] == 0
    assert row["recall"] is None


def test_numpy_signatures_match_declarative(spark):
    """The numpy signature path used by dedup_embedding_lsh must be
    bit-identical to the declarative posexplode/plane-join path used by
    the ANN queries — same md5-derived hyperplanes, same band packing."""
    from zylyty_data_engineer_challenge_spark.operators.similarity import (
        _planes,
        _quantized,
        _signatures,
        _signatures_np,
    )

    emb = _quantized(spark, SF_DIR)
    a = {r["vec_id"]: (r["band0"], r["band1"]) for r in _signatures(emb, _planes(spark)).collect()}
    b = {r["vec_id"]: (r["band0"], r["band1"]) for r in _signatures_np(emb).collect()}
    assert a == b


def test_funnel_requires_strict_event_order(spark, tmp_path):
    """q_funnel is a STRICT sequential funnel: a purchase BEFORE the
    user's click must not count, and each step gates on the previous
    step's earliest qualifying time (not any event of that type)."""
    from datetime import datetime

    from zylyty_data_engineer_challenge_spark.queries.analytics import q_funnel
    from zylyty_data_engineer_challenge_spark.schemas import EVENTS

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: full ordered funnel
        (1, t(0), 1, "signup", 1.0, "{}"),
        (2, t(1), 1, "view", 1.0, "{}"),
        (3, t(2), 1, "click", 1.0, "{}"),
        (4, t(3), 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE click -> stops at click
        (5, t(0), 2, "signup", 1.0, "{}"),
        (6, t(1), 2, "view", 1.0, "{}"),
        (7, t(2), 2, "purchase", 1.0, "{}"),
        (8, t(3), 2, "click", 1.0, "{}"),
        # user 3: no signup -> not in the funnel at all
        (9, t(0), 3, "view", 1.0, "{}"),
        (10, t(1), 3, "click", 1.0, "{}"),
    ]
    d = tmp_path / "funnel"
    spark.createDataFrame(rows, EVENTS).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    got = {r["step"]: r["n_users"] for r in q_funnel(spark, str(d)).collect()}
    assert got == {"1_signup": 2, "2_view": 2, "3_click": 2, "4_purchase": 1}


def test_simhash_cap_drops_degenerate_bucket_and_gate_quantifies_it(
    spark, tmp_path
):
    """The hot-bucket cap's contract on a HOMOGENEOUS corpus (r8 VERDICT
    item 3): 120 near-identical docs all collapse into the same band
    buckets (df=120 > cap=50), the capped detector drops them — bounded
    candidates, zero pairs — and the sampled gate reports the loss as
    recall ~ 0 with a non-zero exact side, instead of hiding it."""
    from zylyty_data_engineer_challenge_spark.operators.dedup import (
        dedup_simhash,
        dedup_simhash_recall_sampled,
    )

    base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = [(i, base, "en", "synthetic", 80) for i in range(120)]
    d = tmp_path / "homog"
    spark.createDataFrame(rows, DOCUMENTS).coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    assert dedup_simhash(spark, str(d)).count() == 0, (
        "cap must drop the degenerate bucket entirely"
    )
    row = dedup_simhash_recall_sampled(spark, str(d)).collect()[0]
    assert row["n_exact"] > 0, "uncapped ground truth must see the dups"
    assert row["hits"] == 0 and row["recall"] == 0.0


def test_simhash_cap_lossless_on_heterogeneous_corpus(spark, nodup_dir):
    """On a corpus with no bucket above the cap the capped detector is
    IDENTICAL to the uncapped banded join (the cap only ever bites hot
    buckets)."""
    from zylyty_data_engineer_challenge_spark.catalog import load_table
    from zylyty_data_engineer_challenge_spark.operators.dedup import (
        _simhash_banded_pairs,
        _simhash_bands,
        dedup_simhash,
    )

    bands = _simhash_bands(load_table(spark, nodup_dir, "documents"))
    uncapped = sorted(
        tuple(r) for r in _simhash_banded_pairs(bands, bands).collect()
    )
    capped = sorted(tuple(r) for r in dedup_simhash(spark, nodup_dir).collect())
    assert capped == uncapped


def test_rp_distortion_gate_holds_jl_bound(spark, sf_dir):
    """sim_rp_distortion (r9c): the JL contract must actually hold on the
    driver corpus — every sampled pair inside the 4x band, and the
    AGGREGATE distortion (sum d_proj over its expectation) within 30% —
    far tighter than the per-pair band, loose enough for the anchor
    sample's correlation (shared anchors make the ~90 pairs far fewer
    than independent; observed 0.81 at sf0.001, 1.02 at sf0.01). A seed
    or scaling drift in the projection matrix breaks this loudly."""
    from pyspark.sql import functions as F

    from zylyty_data_engineer_challenge_spark.operators.similarity import (
        RP_EW2,
        RP_K,
        sim_rp_distortion,
    )

    agg = (
        sim_rp_distortion(spark, sf_dir)
        .agg(
            F.sum("d_proj").alias("sp"),
            F.sum("d_orig").alias("so"),
            F.min("in_band").alias("all_in"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    assert agg["n"] > 50
    assert agg["all_in"] == 1, "a sampled pair escaped the 4x JL band"
    ratio = agg["sp"] / (RP_K * RP_EW2 * agg["so"])
    assert 0.7 < ratio < 1.3, ratio
