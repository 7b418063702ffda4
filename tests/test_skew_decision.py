"""Skew-profile-driven salting (r9 VERDICT item 7): the statistics pass
must demonstrably DECIDE the mitigation — a synthetic hot key changes
the shard count, a uniform key decides "no salting", and the consumer's
rows never change (its oracle is the plain unsalted join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zylyty_data_engineer_challenge_spark.queries import advanced, warehouse


def test_decide_salt_shards_pure_cases():
    d = warehouse.decide_salt_shards
    # skew-free: hottest key <= an average reducer's load -> no salting
    assert d(n_rows=32_000, max_count=1_000, parallelism=32) == 1
    # 10% hot key at 32-way parallelism -> ceil(0.1 * 32) = 4 shards
    assert d(n_rows=10_000, max_count=1_000, parallelism=32) == 4
    # total skew (one key holds everything) -> full parallelism, capped
    assert d(n_rows=1_000, max_count=1_000, parallelism=32) == 32
    assert d(n_rows=1_000, max_count=1_000, parallelism=128, cap=64) == 64
    # degenerate inputs never divide by zero or return < 1
    assert d(n_rows=0, max_count=0) == 1
    # tiny frame: ceil(1 * 32 / 5) = 7 — harmless over-salting of a
    # 5-row input, never a crash or a zero
    assert d(n_rows=5, max_count=1, parallelism=32) == 7


def test_decision_changes_with_synthetic_hot_key(spark):
    """The same stats kernel over a uniform vs a hot-keyed frame must
    reach different decisions — the pass decides something."""
    uniform = spark.range(3200).select((F.col("id") % 100).alias("k"))
    n, mx = warehouse.key_skew_stats(uniform, "k")
    assert (n, mx) == (3200, 32)
    assert warehouse.decide_salt_shards(n, mx, parallelism=32) == 1

    hot = spark.range(3200).select(
        F.when(F.col("id") < 1600, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    n, mx = warehouse.key_skew_stats(hot, "k")
    assert (n, mx) == (3200, 1600)
    assert warehouse.decide_salt_shards(n, mx, parallelism=32) == 16


def test_salted_join_rows_invariant_under_decision(spark, sf_dir):
    """q_salted_join with the stats-decided shard count must equal the
    plain unsalted join row-for-row (salting is semantically invisible —
    the oracle contract, pinned engine-side too)."""
    from zylyty_data_engineer_challenge_spark.catalog import load_table

    salted = {
        tuple(r) for r in advanced.q_salted_join(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(advanced._SKEW_KEY).alias("skew_key"), "l_extendedprice"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(
            F.expr(
                "CASE WHEN s_suppkey % 10 = 0 THEN 0 ELSE s_suppkey END"
            ).alias("skew_key"),
            "s_nationkey",
        )
        .distinct()
    )
    plain = {
        tuple(r)
        for r in li.join(supp, "skew_key")
        .groupBy("skew_key", "s_nationkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert salted == plain
