"""Warehouse-modeling surface: SCD2 dimension builds and the remaining
window-function breadth (percent_rank / cume_dist / nth_value).

[EXTENDED] — beyond the reference's three views; the operators a consumer
of a relational engine expects for dimensional modeling. Same
cross-engine-determinism discipline as :mod:`.relational`: identical
aliases on both engines, dates leave as formatted strings, windows carry a
total order (date + key tie-break), doubles only where both engines
compute the identical single IEEE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def q_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) build from a change log:
    orders are treated as per-customer attribute observations
    (``o_orderpriority`` at ``o_orderdate``); consecutive repeats collapse,
    each change opens a versioned row with [valid_from, valid_to) bounds
    and the open row is flagged current.

    Shape: two stacked windows on the same (custkey, date, key) order —
    one shuffle serves the change-detection lag, the closing lead, and the
    version numbering. This is the batch form of a streaming upsert
    dimension; at 100 TB the shuffle is the per-customer history, bounded
    by change count, not fact volume.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.col("o_orderpriority").alias("attr"),
        )
        .withColumn("prev_attr", F.lag("attr").over(w))
        .filter(F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr")))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        changes.select(
            "o_custkey",
            "attr",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
            F.date_format(F.lead("o_orderdate").over(w2), "yyyy-MM-dd").alias("valid_to"),
            F.row_number().over(w2).alias("version"),
            F.lead("o_orderdate").over(w2).isNull().cast("int").alias("is_current"),
        )
        .orderBy("o_custkey", "version")
    )


def q_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value breadth over the per-customer
    order timeline (one shuffle serves all three). The two rank ratios are
    each a single IEEE double division of exact integers — identical in
    both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
    ).orderBy("o_custkey", "o_orderkey")


ORACLE_SQL = {
    "q_scd2_dim": """
        WITH changes AS (
            SELECT o_custkey, o_orderdate, o_orderkey,
                   o_orderpriority AS attr,
                   lag(o_orderpriority) OVER w AS prev_attr
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        )
        SELECT o_custkey, attr,
               strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
               strftime(lead(o_orderdate) OVER w2, '%Y-%m-%d') AS valid_to,
               row_number() OVER w2 AS version,
               CAST(lead(o_orderdate) OVER w2 IS NULL AS INT) AS is_current
        FROM changes
        WHERE prev_attr IS NULL OR attr <> prev_attr
        WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, version
    """,
    "q_window_extras": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cdist,
               nth_value(o_orderkey, 2) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
}
