"""Relational operator coverage, retargeted onto the driver corpus.

Each function here is one oracle-checked query; together they cover the
reference's non-view operators (T1 union, T3 keep-first dedup, T4 numeric
coercion, D2 completion counts — SURVEY.md §2.2-§2.5, §2.11) plus the
standard relational surface a consumer of the engine expects (filters with
pushdown, top-k, window functions, semi/anti joins, set ops, rollup, pivot,
scalar functions — SURVEY.md §2.12).

Correctness-gate discipline (applies to every query in this package):

* computed columns are aliased identically in Spark and oracle SQL;
* monetary aggregates cast double→DECIMAL(18,2) *before* summing so results
  are exact and order-insensitive (no float summation-order drift);
* timestamps leave queries as formatted strings;
* ties are broken by a unique key so top-k / window outputs are
  deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

DEC = "decimal(18,2)"

# ---------------------------------------------------------------------------
# Reference operators T1 / T3 / T4 / D2
# ---------------------------------------------------------------------------


def t1_union_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (`main.py:109`): page-append as a union.

    Simulates two ingest "pages" (even/odd order keys) re-combined with
    ``unionByName`` — at scale each page is its own partition set and the
    union is a zero-shuffle metadata concat.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(DEC).cast("double").alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    )
    page0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    page1 = orders.filter(F.col("o_orderkey") % 2 == 1)
    return page0.unionByName(page1)


def t3_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (`main.py:123`): keep-first dedup on ``(l_shipdate, l_orderkey)``.

    "First" on a distributed engine must be an explicit total order, not
    physical row order (SURVEY.md §7 risk 1) — here the arrival ordinal is
    ``(l_linenumber, l_partkey)``, unique within every key group, mirroring
    the page-ordinal the ingest layer attaches in production
    (:mod:`..etl.clean`).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # min_by aggregate, not a row_number window: the hash agg gets map-side
    # partial combine (each mapper keeps one candidate row per key before
    # the shuffle) and needs no per-partition sort — same wall time at
    # sf0.1, strictly less shuffled data and no sort at cluster scale.
    # Struct comparison is lexicographic by field order = the arrival
    # ordinal (l_linenumber, l_partkey).
    first = F.min_by(
        F.struct("l_linenumber", "l_partkey", "l_extendedprice"),
        F.struct("l_linenumber", "l_partkey"),
    )
    return (
        li.groupBy("l_shipdate", "l_orderkey")
        .agg(first.alias("f"))
        .select(
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            "l_orderkey",
            F.col("f.l_linenumber").alias("l_linenumber"),
            F.col("f.l_partkey").alias("l_partkey"),
            F.col("f.l_extendedprice").cast(DEC).cast("double").alias("amount"),
        )
        .orderBy("ship_date", "l_orderkey")
    )


def t4_numeric_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (`main.py:124-125`): to-numeric coercion, invalid/missing → 0.

    ``props`` is a JSON string; its ``k`` field is extracted as text and
    coerced to DECIMAL(10,2). ``event_type`` (never numeric) exercises the
    garbage→0 path: ``coalesce(try_cast(x), 0)``.
    """
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(10,2)"
    zero = F.lit(0).cast(dec)
    return ev.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.k").try_cast(dec), zero
        ).cast("double").alias("k_amount"),
        F.coalesce(F.col("event_type").try_cast(dec), zero).cast("double").alias("coerced_garbage"),
    ).orderBy("event_id")


def d2_completion_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (`main.py:58-59`): the completion counts, in the reference's
    clients/accounts/transactions order (role-mapped to
    customer/orders/lineitem)."""
    counts = []
    for role, table in [
        ("clients", "customer"),
        ("accounts", "orders"),
        ("transactions", "lineitem"),
    ]:
        counts.append(
            load_table(spark, sf_dir, table).agg(
                F.lit(role).alias("dataset"), F.count("*").alias("n")
            )
        )
    out = counts[0]
    for df in counts[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# Broader relational surface
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate: group on two low-cardinality keys, many
    aggregates. Decimal arithmetic end-to-end: products of decimals are
    exact, so partial/final agg order can't change the result.

    The distinct order count is computed as its own two-level aggregate
    and joined back (4 rows), NOT as a countDistinct inside the main agg:
    Spark's mixed distinct/non-distinct rewrite Expands every input row
    into two and drags all the decimal columns through a high-cardinality
    partial aggregate — measured 2x the whole query at the 10x scale
    smoke. The split keeps the main agg's partial combine perfect (4
    groups) and the distinct pass narrow (3 int/flag columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    tax = (F.lit(1) + F.col("l_tax")).cast("decimal(8,2)")
    main = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        # products of decimals are exact at scale 4/6 — keep that scale in
        # the output; casting down to scale 2 would round half-way cases
        # differently across engines.
        F.sum(price * disc).cast("decimal(24,4)").cast("double").alias("sum_disc_price"),
        F.sum(price * disc * tax).cast("decimal(28,6)").cast("double").alias("sum_charge"),
        F.min(F.col("l_quantity").cast(DEC)).cast("double").alias("min_qty"),
        F.max(F.col("l_quantity").cast(DEC)).cast("double").alias("max_qty"),
        F.count("*").alias("count_order"),
    )
    n_orders = (
        # NOT NULL filter keeps the split exactly equivalent to
        # COUNT(DISTINCT l_orderkey), which ignores NULLs — without it a
        # null key would count as its own group.
        li.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_returnflag", "l_linestatus", "l_orderkey")
        .agg(F.lit(1).alias("_one"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_orders"))
    )
    # LEFT join + coalesce: a group whose every l_orderkey is NULL has
    # COUNT(DISTINCT) = 0, not a dropped row. eqNullSafe keys: a NULL
    # group key must match ITS OWN distinct-count row (SQL GROUP BY
    # treats NULL as one group), not fall through to coalesce's 0 —
    # theoretical for TPC-H's non-null flags, exact for arbitrary input.
    n_orders_r = n_orders.withColumnsRenamed(
        {"l_returnflag": "_rf", "l_linestatus": "_ls"}
    )
    return (
        main.join(
            F.broadcast(n_orders_r),
            F.col("l_returnflag").eqNullSafe(F.col("_rf"))
            & F.col("l_linestatus").eqNullSafe(F.col("_ls")),
            "left",
        )
        .drop("_rf", "_ls")
        .withColumn("n_orders", F.coalesce(F.col("n_orders"), F.lit(0)))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: tight scan-side predicate + single aggregate. The
    date/discount/quantity filters push down to the parquet scan
    (PushedFilters in the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * F.col("l_discount").cast("decimal(8,2)")
            )
            .cast("decimal(24,4)")
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with deterministic tie-break: 10 biggest customers by exact
    decimal spend, ties broken by key."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spend"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"), "inner")
        .select("c_custkey", "c_name", "total_spend")
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: per-customer running order total, frame = rows
    unbounded-preceding..current, total order (o_orderdate, o_orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("order_seq"),
    ).orderBy("o_custkey", "order_seq")


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) in one result: per
    customer, whether they have any order ≥ 100k and whether they have none
    at all."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") >= 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    has_big = customer.join(big, "c_custkey", "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("flag")
    )
    no_orders = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", F.lit("no_orders").alias("flag"))
    return has_big.unionByName(no_orders).orderBy("flag", "c_custkey")


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT coverage: customers in BUILDING segment vs
    customers with at least one F-status order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    f_status = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = building.intersect(f_status).select(
        "c_custkey", F.lit("both").alias("which")
    )
    only_building = building.exceptAll(f_status.distinct()).select(
        "c_custkey", F.lit("building_only").alias("which")
    )
    return both.unionByName(only_building).orderBy("which", "c_custkey")


def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotal + grand-total rows with
    NULL group keys, matching ANSI GROUP BY ROLLUP."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_price"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type. The pivot
    value list is explicit, so the schema is static and no extra distinct
    pass runs at plan time."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    for c in EVENT_TYPES:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out.orderBy("user_id")


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface: string, math, conditional, date-part — all
    JVM-side built-ins inside one whole-stage-codegen span."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_retailprice").cast(DEC) * 2).cast("double").alias("double_price"),
        F.when(F.col("p_size") > 25, "large").otherwise("small").alias("size_class"),
    ).orderBy("p_partkey")


ORACLE_SQL = {
    "t1_union_pages": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM orders WHERE o_orderkey % 2 = 1
    """,
    "t3_dedup_keep_first": """
        SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
               l_orderkey, l_linenumber, l_partkey,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY l_shipdate, l_orderkey
                ORDER BY l_linenumber, l_partkey) AS rn
            FROM lineitem
        ) WHERE rn = 1
        ORDER BY ship_date, l_orderkey
    """,
    "t4_numeric_coercion": """
        SELECT event_id,
               CAST(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DECIMAL(10,2)),
                        CAST(0 AS DECIMAL(10,2))) AS DOUBLE) AS k_amount,
               CAST(COALESCE(TRY_CAST(event_type AS DECIMAL(10,2)),
                        CAST(0 AS DECIMAL(10,2))) AS DOUBLE) AS coerced_garbage
        FROM events ORDER BY event_id
    """,
    "d2_completion_counts": """
        SELECT 'clients' AS dataset, COUNT(*) AS n FROM customer
        UNION ALL SELECT 'accounts', COUNT(*) FROM orders
        UNION ALL SELECT 'transactions', COUNT(*) FROM lineitem
    """,
    "q_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(8,2))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(8,2))
                        * CAST(1 + l_tax AS DECIMAL(8,2))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_charge,
               CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
               CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty,
               COUNT(*) AS count_order,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_revenue_filter": """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(8,2))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_quantity < 24
    """,
    "q_top_customers": """
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_spend DESC, c.c_custkey ASC
        LIMIT 10
    """,
    "q_window_running_total": """
        SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS order_seq
        FROM orders ORDER BY o_custkey, order_seq
    """,
    "q_semi_anti_join": """
        SELECT c_custkey, 'has_big_order' AS flag FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 100000)
        UNION ALL
        SELECT c_custkey, 'no_orders' AS flag FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY flag, c_custkey
    """,
    "q_set_ops": """
        WITH building AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ), f_status AS (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT c_custkey, 'both' AS which FROM (
            SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM f_status)
        UNION ALL
        SELECT c_custkey, 'building_only' AS which FROM (
            SELECT c_custkey FROM building EXCEPT ALL SELECT c_custkey FROM f_status)
        ORDER BY which, c_custkey
    """,
    "q_rollup_sales": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "q_pivot_events": """
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q_scalar_functions": """
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               LENGTH(p_name) AS name_len,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               ABS(p_size - 25) AS size_dist,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price,
               CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
        FROM part ORDER BY p_partkey
    """,
}


RESERVOIR_K = 100


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic "reservoir" sample: the RESERVOIR_K orders with the
    smallest md5 hash of their key — a uniform-at-random-but-reproducible
    sample (the hash order is fixed, so re-runs, retries, and different
    partitionings all pick the same rows, unlike rand()-based sampling).

    Scale: expressed as ORDER BY hash LIMIT k, which Spark executes as
    TakeOrderedAndProject — each partition keeps its local top-k, the
    driver merges k-sized heaps; no global sort, no single-partition
    window. This is exactly how distributed reservoir sampling should
    ship: O(k) state per partition.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.expr(
                "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
        .orderBy("h")
        .limit(RESERVOIR_K)
    )


ORACLE_SQL["q_reservoir_sample"] = f"""
    SELECT o_orderkey,
           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM orders
    ORDER BY h
    LIMIT {RESERVOIR_K}
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join breadth: Q3 (shipping priority) and Q5 (local
# supplier volume)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_ODATE_LT = "1999-01-01"
Q3_SDATE_GT = "1998-06-30"
Q3_TOPN = 10


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per order, top-N. The segment filter prunes the broadcast
    customer dim BEFORE the join (predicate pushdown to its scan); the
    orders date filter is scan-side on the fact; revenue is exact decimal,
    cast to double on output; ties broken by (o_orderdate, l_orderkey)
    for cross-engine determinism."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < Q3_ODATE_LT
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > Q3_SDATE_GT
    )
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("decimal(24,4)").cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(Q3_TOPN)
    )


Q5_REGION = "ASIA"
Q5_ODATE_GE = "1996-01-01"
Q5_ODATE_LT = "1998-01-01"


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: six-table join (region→nation→{customer,supplier}
    ⋈ orders ⋈ lineitem) with the "local supplier" condition
    c_nationkey = s_nationkey, revenue per nation. The three dimension
    chains (region/nation, customer, supplier) broadcast; only the
    orders⋈lineitem fact-fact equi-join shuffles — the canonical star-join
    shape Catalyst should (and does) pick when the dims are broadcast."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q5_REGION
    )
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q5_ODATE_GE) & (F.col("o_orderdate") < Q5_ODATE_LT)
    )
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supp.join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(24,4)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


ORACLE_SQL["q_shipping_priority"] = f"""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(8,2))) AS DECIMAL(24,4))
               AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_ODATE_LT} 00:00:00'
      AND l_shipdate > TIMESTAMP '{Q3_SDATE_GT} 00:00:00'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT {Q3_TOPN}
"""

ORACLE_SQL["q_local_supplier_volume"] = f"""
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(8,2))) AS DECIMAL(24,4))
               AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_ODATE_GE} 00:00:00'
      AND o_orderdate < TIMESTAMP '{Q5_ODATE_LT} 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""
