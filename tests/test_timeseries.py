"""Invariant tests for the event-analytics trio (queries/timeseries.py).

The cross-engine value check lives in the full-registry oracle gate;
these pin the *mathematical* invariants the oracle equality alone would
not catch if both engines drifted together.
"""

from __future__ import annotations

from zylyty_data_engineer_challenge_spark.queries import timeseries

SF_DIR = "/root/testdata/sf0.001"


def test_cusum_telescopes_to_zero(spark):
    # sum of (D*c_d - T) over all D days is D*T - D*T = 0, so the final
    # cusum must be exactly 0 — any off-by-one in the window frame or a
    # wrong total breaks this identity
    rows = timeseries.q_cusum_changepoint(spark, SF_DIR).collect()
    assert rows[-1]["cusum"] == 0
    # the peak day(s) are flagged; at least one flag must fire
    assert any(r["is_changepoint"] == 1 for r in rows)
    # every flagged day's |cusum| reaches the threshold share of the peak
    peak = max(abs(r["cusum"]) for r in rows)
    for r in rows:
        flagged = abs(r["cusum"]) * 100 >= peak * timeseries.CUSUM_FRAC_PCT
        assert bool(r["is_changepoint"]) == flagged


def test_outlier_mad_bounds(spark):
    for r in timeseries.q_outlier_mad(spark, SF_DIR).collect():
        assert 0 <= r["n_outliers"] <= r["n_events"]
        assert r["mad_cents_x4"] >= 0
        if r["mad_cents_x4"] > 0:
            # strictly more than half the points sit within one MAD of the
            # median (MAD is the median deviation), so > MAD_K MADs away
            # can never be the majority
            assert r["n_outliers"] * 2 < r["n_events"]


def test_market_basket_support_bounds(spark):
    rows = timeseries.q_market_basket(spark, SF_DIR).collect()
    assert rows, "no co-occurring event-type pairs found"
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 1 <= r["support"] <= min(r["n_a"], r["n_b"])
        assert max(r["n_a"], r["n_b"]) <= r["n_users"]
        assert bool(r["positive_assoc"]) == (
            r["support"] * r["n_users"] > r["n_a"] * r["n_b"]
        )


def test_time_travel_final_version_equals_cdc_apply(spark):
    # v3's cut (2024-01-31) is past the last event, so the v3 snapshot
    # must be EXACTLY the batch CDC merge: same alive-key count and the
    # same key checksum — time travel at HEAD is just the merged table
    from zylyty_data_engineer_challenge_spark.queries import warehouse

    tt = {r["version"]: r for r in warehouse.q_time_travel(spark, SF_DIR).collect()}
    cdc = warehouse.q_cdc_apply(spark, SF_DIR).collect()
    assert tt["v3"]["n_alive"] == len(cdc)
    assert tt["v3"]["key_checksum"] == sum(r["key"] for r in cdc)
    # NOTE deliberately NO monotonicity assert on n_inserted/n_deleted:
    # latest-change-wins state is not cumulative — a key deleted at v1
    # and re-upserted before v2 counts deleted at v1 but alive at v2


def test_stream_cms_one_sided_error(spark):
    # count-min estimates are never below the exact count (collisions
    # only inflate), and the top-1 user's estimate is present
    from zylyty_data_engineer_challenge_spark.streaming import sketch_stream

    rows = sketch_stream.stream_cms_topk(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["cms_n"] >= r["exact_n"]


def test_vocab_jaccard_kmv_membership_exactness(spark):
    # the KMV agreement count can never exceed what the exact
    # intersection allows within k_eff rows, and k_eff is capped at VJ_K;
    # identical-vocabulary pairs (if any) must estimate exactly
    from zylyty_data_engineer_challenge_spark.operators import sketches

    rows = sketches.sketch_vocab_jaccard(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["k_eff"] <= sketches.VJ_K
        assert 0 <= r["kmv_inter"] <= r["k_eff"]
        assert r["kmv_inter"] <= r["exact_inter"] or r["exact_inter"] == 0
        assert r["exact_inter"] <= r["exact_union"]
        if r["exact_inter"] == r["exact_union"]:
            # identical sets: every sampled hash is in both
            assert r["kmv_inter"] == r["k_eff"]
