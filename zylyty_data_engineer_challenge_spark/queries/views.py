"""The reference's three analytical views, rebuilt as Spark queries.

Two forms of each view:

* ``*_ref(clients, accounts, transactions)`` — the reference's own data model
  (Family A), taking DataFrames so the same code serves the JDBC pipeline and
  unit tests. Semantics follow `/root/reference/main.py:182-223` exactly,
  including the quirks (view 3 is *monthly* despite its ``date`` column name —
  SURVEY.md §8.2).
* ``*_tpch(spark, sf_dir)`` — the same query shape retargeted onto the driver
  corpus (`clients→customer`, `accounts→orders`, `transactions→lineitem`,
  FIXTURES.md Family B) for the DuckDB-oracle correctness gate.

Scale notes: each view is a dim⋈dim⋈fact join + hash aggregate. ``customer``
(and Family A ``clients``/``accounts``) are dimension-sized → broadcast, so
the only shuffle is the aggregation on the grouped keys, which Catalyst
executes as partial (map-side) + final hash agg. The ORDER BY is kept for
display parity with the reference but consumers must not rely on it
(SURVEY.md §8.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# ---------------------------------------------------------------------------
# Family A — reference-shaped (clients / accounts / transactions)
# ---------------------------------------------------------------------------


def client_transaction_counts_ref(
    clients: DataFrame, accounts: DataFrame, transactions: DataFrame
) -> DataFrame:
    """View 1 (`main.py:183-191`): per-client transaction counts.

    ``COUNT(tr.transaction_id)`` counts non-null ids only, matching SQL
    COUNT(col) semantics.
    """
    return (
        F.broadcast(clients)
        .join(F.broadcast(accounts), "client_id", "inner")
        .join(transactions, "account_id", "inner")
        .groupBy("client_id")
        .agg(F.count("transaction_id").alias("transaction_count"))
        .orderBy("client_id")
    )


def monthly_transaction_summary_ref(
    clients: DataFrame, accounts: DataFrame, transactions: DataFrame
) -> DataFrame:
    """View 2 (`main.py:197-207`): monthly count+sum per client email.

    ``TO_CHAR(DATE_TRUNC('month', ts), 'YYYY-MM-01')`` → month-truncate then
    format; after truncation ``dd`` is always 01, so ``yyyy-MM-dd`` yields the
    identical string without literal quoting.
    """
    month = F.date_format(F.date_trunc("month", F.col("timestamp")), "yyyy-MM-dd")
    return (
        transactions.join(F.broadcast(accounts), "account_id", "inner")
        .join(F.broadcast(clients), "client_id", "inner")
        .withColumn("month", month)
        .groupBy("month", "client_email")
        .agg(
            F.count("transaction_id").alias("transaction_count"),
            F.sum("amount").alias("total_amount"),
        )
        .orderBy("month", "client_email")
    )


def high_transaction_accounts_ref(transactions: DataFrame) -> DataFrame:
    """View 3 (`main.py:213-221`): accounts with >2 transactions per month.

    Faithful quirk: the column is named ``date`` and formatted YYYY-MM-DD but
    is always the first of the month (the timestamp is month-truncated first)
    — the view is monthly, not daily. Replicated, not fixed (SURVEY.md §8.2).
    The HAVING clause becomes a post-aggregation filter.
    """
    date = F.date_format(F.date_trunc("month", F.col("timestamp")), "yyyy-MM-dd")
    return (
        transactions.withColumn("date", date)
        .groupBy("date", "account_id")
        .agg(F.count("transaction_id").alias("transaction_count"))
        .filter(F.col("transaction_count") > 2)
        .orderBy("date", "account_id")
    )


# ---------------------------------------------------------------------------
# Family B — retargeted onto the driver corpus for the oracle gate
# (clients→customer, accounts→orders, transactions→lineitem; key chain
#  c_custkey=o_custkey, o_orderkey=l_orderkey — FIXTURES.md Family B)
# ---------------------------------------------------------------------------


def client_transaction_counts_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View 1 retargeted: per-customer lineitem counts through orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
        .join(F.broadcast(customer.select("c_custkey")), "c_custkey", "inner")
        .join(
            lineitem.select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber"),
            "o_orderkey",
            "inner",
        )
        .groupBy("c_custkey")
        .agg(F.count("l_linenumber").alias("transaction_count"))
        .orderBy("c_custkey")
    )


def monthly_transaction_summary_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View 2 retargeted (the flagship): month of l_shipdate × customer name,
    count + decimal sum of l_extendedprice.

    Doubles are cast to DECIMAL(18,2) *before* the sum on both the Spark and
    oracle sides, so the aggregate is exact and order-insensitive
    (SURVEY.md §7 risk 2). The FINAL column is cast to DOUBLE on both
    engines: the driver canonicalizes through pandas, where DuckDB DECIMAL
    becomes float64 while a Spark Decimal stays an object — emitting DOUBLE
    on both sides makes the rendering identical (VERDICT.md r1 item 1; the
    exact decimal → double conversion is correctly rounded in both engines,
    so the bits agree).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        # orders is fact-sized (1:4 with lineitem) — NOT broadcast; the
        # equi-join shuffles on the order key and AQE picks SMJ/SHJ. Only the
        # customer dimension is broadcast — AFTER the aggregate: the group
        # key is (month timestamp, custkey long), 16 bytes, instead of two
        # strings, so the agg shuffle is smaller and hash probes cheaper;
        # c_custkey -> c_name is functional, so attaching the name and
        # formatting the month post-agg touches only the reduced rows and
        # leaves the result identical.
        lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("m"), "o_custkey")
        .agg(
            F.count("l_linenumber").alias("tc"),
            # stays decimal through the second-level agg so re-grouping by
            # name is exact; cast to double only on output
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("ta"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
            "inner",
        )
        # second-level agg: the view is defined per (month, NAME); regroup
        # the already-reduced rows so two customers sharing a c_name merge
        # into one row exactly as the name-keyed grouping would. With
        # unique names (TPC-H) every group has one row and this is a
        # near-free pass over the reduced output.
        .groupBy(
            F.date_format("m", "yyyy-MM-dd").alias("month"), F.col("c_name")
        )
        .agg(
            F.sum("tc").alias("transaction_count"),
            F.sum("ta").cast("double").alias("total_amount"),
        )
        .orderBy("month", "c_name")
    )


def high_transaction_accounts_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View 3 retargeted: orders with >2 lineitems in a month (single-table
    agg + HAVING)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    date = F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM-dd")
    return (
        lineitem.select("l_orderkey", "l_linenumber", "l_shipdate")
        .withColumn("date", date)
        .groupBy("date", F.col("l_orderkey").alias("account_id"))
        .agg(F.count("l_linenumber").alias("transaction_count"))
        .filter(F.col("transaction_count") > 2)
        .orderBy("date", "account_id")
    )


# DuckDB oracle SQL for the retargeted views (ANSI; strftime for TO_CHAR).
ORACLE_SQL = {
    "view1_client_transaction_counts": """
        SELECT c.c_custkey,
               COUNT(l.l_linenumber) AS transaction_count
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY c.c_custkey
        ORDER BY c.c_custkey
    """,
    "view2_monthly_transaction_summary": """
        SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m-%d') AS month,
               c.c_name,
               COUNT(l.l_linenumber) AS transaction_count,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_amount
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY month, c.c_name
        ORDER BY month, c.c_name
    """,
    "view3_high_transaction_accounts": """
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS date,
               l_orderkey AS account_id,
               COUNT(l_linenumber) AS transaction_count
        FROM lineitem
        GROUP BY date, account_id
        HAVING COUNT(l_linenumber) > 2
        ORDER BY date, account_id
    """,
}
