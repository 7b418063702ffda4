"""Golden tests for the three reference views on hand-written frames.

Asserts exact values including the quirks: month strings always first-of-
month (even in view 3's `date` column — SURVEY.md §8.2), coerced 0.00
amounts participating in SUM, COUNT(col) skipping NULL ids.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from zylyty_data_engineer_challenge_spark.etl.clean import clean_transactions
from zylyty_data_engineer_challenge_spark.queries.views import (
    client_transaction_counts_ref,
    high_transaction_accounts_ref,
    monthly_transaction_summary_ref,
)
from zylyty_data_engineer_challenge_spark.schemas import (
    ACCOUNTS,
    CLIENTS,
    TRANSACTIONS_RAW,
)


def ts(day, hour=12):
    return dt.datetime(2024, 3, day, hour, 0, 0)


@pytest.fixture(scope="module")
def frames(spark):
    clients = spark.createDataFrame(
        [
            ("c1", "Alice", "alice@x.com", dt.date(1990, 1, 1)),
            ("c2", "Bob", "bob@x.com", dt.date(1985, 5, 5)),
            ("c3", "NoAccounts", "no@x.com", None),
        ],
        CLIENTS,
    )
    accounts = spark.createDataFrame(
        [(10, "c1"), (11, "c1"), (20, "c2"), (99, "orphan-client")], ACCOUNTS
    )
    raw = spark.createDataFrame(
        [
            # acct 10: three March + one April transaction; one dup key pair
            (1, ts(1), 10, "10.00", "t", "m", 0),
            (2, ts(1), 10, "999.00", "t", "m", 1),  # dup of (ts(1),10) — dropped
            (3, ts(2), 10, "garbage", "t", "m", 2),  # amount -> 0.00
            (4, ts(3), 10, "2.50", "t", "m", 3),
            (5, dt.datetime(2024, 4, 1, 9), 10, "7.25", "t", "m", 4),
            # acct 11: one row
            (6, ts(4), 11, "1.00", "t", "m", 5),
            # acct 20 (Bob): exactly 3 in March -> qualifies in view 3
            (7, ts(5), 20, "5.00", "t", "m", 6),
            (8, ts(6), 20, "5.00", "t", "m", 7),
            (9, ts(7), 20, "5.00", "t", "m", 8),
            # orphan account 99 and unknown account 777: join drops both
            (10, ts(8), 99, "100.00", "t", "m", 9),
            (11, ts(9), 777, "50.00", "t", "m", 10),
        ],
        TRANSACTIONS_RAW,
    )
    return clients, accounts, clean_transactions(raw)


def test_view1_counts(spark, frames):
    clients, accounts, tx = frames
    got = {
        r.client_id: r.transaction_count
        for r in client_transaction_counts_ref(clients, accounts, tx).collect()
    }
    # c1: accts 10 (4 rows post-dedup) + 11 (1 row); c2: 3; c3 has no
    # accounts and the inner join drops it entirely.
    assert got == {"c1": 5, "c2": 3}


def test_view2_monthly_summary(spark, frames):
    clients, accounts, tx = frames
    rows = monthly_transaction_summary_ref(clients, accounts, tx).collect()
    got = {(r.month, r.client_email): (r.transaction_count, r.total_amount) for r in rows}
    assert got == {
        # alice March: ids 1 (10.00), 3 (0.00 coerced), 4 (2.50), 6 (1.00)
        ("2024-03-01", "alice@x.com"): (4, Decimal("13.50")),
        ("2024-04-01", "alice@x.com"): (1, Decimal("7.25")),
        ("2024-03-01", "bob@x.com"): (3, Decimal("15.00")),
    }
    # output must be sorted by (month, email) for display parity
    assert [(r.month, r.client_email) for r in rows] == sorted(
        (r.month, r.client_email) for r in rows
    )


def test_view3_high_transaction_accounts(spark, frames):
    _, _, tx = frames
    rows = high_transaction_accounts_ref(tx).collect()
    got = {(r.date, r.account_id): r.transaction_count for r in rows}
    # >2 per month: acct 10 has 3 in March (post-dedup), acct 20 has 3.
    assert got == {("2024-03-01", 10): 3, ("2024-03-01", 20): 3}
    # the `date` column is always first-of-month despite its name (§8.2)
    assert all(r.date.endswith("-01") for r in rows)


def test_view1_counts_null_transaction_ids(spark):
    """COUNT(transaction_id) must skip NULL ids (SQL COUNT(col) semantics)."""
    clients = spark.createDataFrame([("c1", "A", "a@x", None)], CLIENTS)
    accounts = spark.createDataFrame([(1, "c1")], ACCOUNTS)
    from pyspark.sql import types as T

    tx_schema = T.StructType(
        [
            T.StructField("transaction_id", T.LongType(), True),
            T.StructField("timestamp", T.TimestampType(), True),
            T.StructField("account_id", T.LongType(), True),
            T.StructField("amount", T.DecimalType(10, 2), True),
        ]
    )
    tx = spark.createDataFrame(
        [(None, ts(1), 1, Decimal("1.00")), (2, ts(2), 1, Decimal("2.00"))],
        tx_schema,
    )
    got = client_transaction_counts_ref(clients, accounts, tx).collect()
    assert [(r.client_id, r.transaction_count) for r in got] == [("c1", 1)]
