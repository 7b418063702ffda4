"""Unit tests for the shared scalar expression library
(zylyty_data_engineer_challenge_spark.functions) — pins the exact
semantics the DuckDB-oracle parity relies on."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from zylyty_data_engineer_challenge_spark.functions import (
    md5_int64,
    money_cents,
    stable_bucket,
    ws_tokens,
)


def test_md5_int64_matches_hashlib(spark):
    df = spark.createDataFrame([("alpha",), ("beta",), ("",)], ["s"])
    got = {r.s: r.h for r in df.select("s", md5_int64("s").alias("h")).collect()}
    for s, h in got.items():
        expected = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        assert h == expected
        assert 0 <= h < 2**60  # 15 hex chars -> non-negative, signed-safe


def test_stable_bucket_range_and_determinism(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], ["s"])
    buckets = [r.b for r in df.select(stable_bucket("s", 8).alias("b")).collect()]
    assert all(0 <= b < 8 for b in buckets)
    again = [r.b for r in df.select(stable_bucket("s", 8).alias("b")).collect()]
    assert buckets == again


def test_money_cents_floors_not_rounds(spark):
    # floor semantics (the cross-engine-safe choice), including the
    # negative case where floor and truncate diverge
    df = spark.createDataFrame(
        [(1.005,), (2.999,), (-1.005,), (0.0,)], ["x"]
    )
    got = [r.c for r in df.select(money_cents("x").alias("c")).collect()]
    assert got == [100, 299, -101, 0]


def test_ws_tokens_keeps_leading_empty(spark):
    # parity quirk with DuckDB regexp_split_to_array: leading whitespace
    # yields a leading "" token
    df = spark.createDataFrame([(" a  b",), ("a b",)], ["t"])
    got = [r.toks for r in df.select(ws_tokens("t").alias("toks")).collect()]
    assert got == [["", "a", "b"], ["a", "b"]]


def test_builders_accept_columns_and_strings(spark):
    df = spark.createDataFrame([("x", 1.5)], ["s", "v"])
    row = df.select(
        md5_int64(F.col("s")).alias("h1"),
        md5_int64("s").alias("h2"),
        money_cents(F.col("v")).alias("c1"),
        money_cents("v").alias("c2"),
    ).collect()[0]
    assert row.h1 == row.h2
    assert row.c1 == row.c2 == 150


def test_quantile_err_gate_within_dkw_bound(spark, sf_dir):
    """sketch_quantile_err's in-band acceptance: every percentile's
    observed rank error sits inside the DKW bound (the quantile twin of
    the HLL/recall gates)."""
    from zylyty_data_engineer_challenge_spark.operators.sketches import (
        sketch_quantile_err,
    )

    rows = sketch_quantile_err(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["within"] == 1, (
            f"q{r['q_pct']}: rank error {r['err_rank']} exceeds "
            f"{r['eps_ppm']}ppm of {r['n_total']}"
        )
