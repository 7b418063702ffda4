"""Unit tests for the cleaning stage (reference semantics, main.py:121-126).

Dirty-data paths are the load-bearing ones: keep-first dedup ties,
non-numeric amounts -> exactly 0 (not NULL), empty inputs.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from zylyty_data_engineer_challenge_spark.etl.clean import (
    clean_transactions,
    coerce_amount,
    dedup_keep_first,
)
from zylyty_data_engineer_challenge_spark.schemas import TRANSACTIONS_RAW

TS = dt.datetime(2024, 3, 15, 10, 0, 0)
TS2 = dt.datetime(2024, 3, 16, 11, 0, 0)


def _raw(spark, rows):
    return spark.createDataFrame(rows, TRANSACTIONS_RAW)


def test_dedup_keeps_first_arrival(spark):
    # Three rows share (timestamp, account_id); the lowest _arrival wins,
    # regardless of the order rows happen to land in partitions.
    rows = [
        (1, TS, 100, "10.00", "dep", "card", 5),
        (2, TS, 100, "20.00", "wd", "cash", 2),  # first-arriving duplicate
        (3, TS, 100, "30.00", "dep", "card", 9),
        (4, TS2, 100, "40.00", "dep", "card", 1),  # different key: survives
    ]
    out = dedup_keep_first(
        _raw(spark, rows).repartition(4), ["timestamp", "account_id"]
    ).collect()
    ids = sorted(r.transaction_id for r in out)
    assert ids == [2, 4]


def test_dedup_is_deterministic_across_partitionings(spark):
    rows = [(i, TS, i % 3, str(i), "t", "m", 1000 - i) for i in range(60)]
    a = dedup_keep_first(_raw(spark, rows).repartition(7), ["timestamp", "account_id"])
    b = dedup_keep_first(_raw(spark, rows).coalesce(1), ["timestamp", "account_id"])
    assert sorted(r.transaction_id for r in a.collect()) == sorted(
        r.transaction_id for r in b.collect()
    )


def test_coerce_amount_garbage_to_zero(spark):
    # main.py:124-125: to_numeric(errors='coerce').fillna(0) — 'x'/''/None -> 0
    rows = [
        (1, TS, 1, "12.34", "t", "m", 0),
        (2, TS, 2, "not-a-number", "t", "m", 1),
        (3, TS, 3, None, "t", "m", 2),
        (4, TS, 4, "", "t", "m", 3),
        (5, TS, 5, "-7.5", "t", "m", 4),
        (6, TS, 6, "1e2", "t", "m", 5),
    ]
    out = {r.transaction_id: r.amount for r in coerce_amount(_raw(spark, rows)).collect()}
    assert out[1] == Decimal("12.34")
    assert out[2] == Decimal("0.00")
    assert out[3] == Decimal("0.00")
    assert out[4] == Decimal("0.00")
    assert out[5] == Decimal("-7.50")
    assert out[6] == Decimal("100.00")  # scientific notation parses, like pandas


def test_clean_transactions_end_to_end(spark):
    rows = [
        (1, TS, 100, "5.00", "t", "m", 1),
        (2, TS, 100, "bad", "t", "m", 0),  # first-arriving dup, garbage amount
        (3, TS2, 200, None, "t", "m", 2),
    ]
    out = clean_transactions(_raw(spark, rows))
    assert "_arrival" not in out.columns
    got = {r.transaction_id: r.amount for r in out.collect()}
    assert got == {2: Decimal("0.00"), 3: Decimal("0.00")}


def test_clean_transactions_empty_input(spark):
    out = clean_transactions(_raw(spark, []))
    assert out.count() == 0
    assert "_arrival" not in out.columns


def test_coerce_preserves_other_columns(spark):
    rows = [(1, TS, 1, "3.33", "dep", "card", 0)]
    r = coerce_amount(_raw(spark, rows)).collect()[0]
    assert (r.type, r.medium) == ("dep", "card")
    assert r.amount == Decimal("3.33")
