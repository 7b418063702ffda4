"""Analytics surface II: UDF/UDAF, window-function breadth, hypertable-style
time rollups, range joins, top-k per group.

Same cross-engine-determinism discipline as the rest of the query packages.
The range join and time rollup document their 100 TB shapes explicitly:
banded joins go through bin keys (equi-join + residual filter), rollups go
through GROUPING SETS (one shuffle for all granularities).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table, register_views
from ..functions import money_cents

DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# UDF / UDAF surface — Arrow-vectorized, exact (integers and md5 only)
# ---------------------------------------------------------------------------


def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF + grouped-agg pandas UDAF over part, grouped by
    brand: shard tag of the brand name and exact size sums.

    (UDFs are defined inside the query builder — the pandas_udf decorator
    needs an active SparkSession, which module import time can't assume.)
    """

    @pandas_udf("string")
    def _md5_bucket(name: pd.Series) -> pd.Series:
        # Scalar pandas UDF (one Arrow batch per call): md5-derived shard
        # tag. Python is justified only as a stand-in for logic SQL can't
        # express (tokenizers, featurizers); the oracle re-derives it in
        # SQL to prove batch-path equivalence.
        return name.map(lambda s: hashlib.md5(s.encode()).hexdigest()[:2])

    @pandas_udf("long")
    def _sum_sizes(sizes: pd.Series) -> int:
        # Grouped-aggregate pandas UDAF: exact integer sum (the UDAF shape
        # for state SQL aggregates can't hold — sketches, model partials).
        return int(sizes.astype("int64").sum())

    @pandas_udf("long")
    def _n_rows(sizes: pd.Series) -> int:
        # pandas UDAFs cannot mix with JVM aggregates in one agg() —
        # the row count is a UDAF too
        return int(len(sizes))

    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            _n_rows(F.col("p_size")).alias("n_parts"),
            _sum_sizes(F.col("p_size")).alias("total_size"),
        )
        .withColumn("brand_shard", _md5_bucket(F.col("p_brand")))
        .select("p_brand", "brand_shard", "n_parts", "total_size")
        .orderBy("p_brand")
    )


UDTF_MAX_TOKENS = 3


def q_udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function) in a LATERAL position:
    each document expands to its first 3 leading tokens with positions —
    the one-row-in / many-rows-out shape (parsers, span extractors,
    segmenters) that scalar UDFs and UDAFs can't express.

    The UDTF runs once per input row in an Arrow-batched Python worker;
    the oracle re-derives the same expansion relationally
    (generate_series lateral) to prove the table-function path is exact.
    Splitting is on single spaces on BOTH engines (Python str.split(' ')
    == DuckDB string_split) so empty tokens from runs agree.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class LeadingTokens:
        def eval(self, text: str):  # noqa: ANN001 — UDTF eval signature
            for i, tok in enumerate(text.split(" ")[:UDTF_MAX_TOKENS]):
                yield i, tok

    spark.udtf.register("leading_tokens", LeadingTokens)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.token
        FROM documents d, LATERAL leading_tokens(d.text) s
        ORDER BY d.doc_id, s.pos
        """
    )


# ---------------------------------------------------------------------------
# Window-function breadth
# ---------------------------------------------------------------------------


def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lag / lead / first over one deterministic
    window (orders per customer by date+key): one shuffle serves all five."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast(DEC)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        price.cast("double").alias("price"),
    ).orderBy("o_custkey", "rnk", "o_orderkey")


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 lineitems per order by exact decimal price (window + filter —
    the distributed top-k-per-key idiom; partial top-k happens map-side
    inside the window sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    # the window must reference the projected alias — the source column is
    # pruned away by the select below
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("price").desc(), F.col("l_linenumber").asc()
    )
    return (
        li.select("l_orderkey", "l_linenumber", price.alias("price"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .withColumn("price", F.col("price").cast("double"))
        .orderBy("l_orderkey", "rk")
    )


# ---------------------------------------------------------------------------
# Hypertable-style time rollup
# ---------------------------------------------------------------------------


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup (hour + day) of events in ONE pass via
    GROUPING SETS — the hypertable continuous-aggregate shape: a single
    shuffle produces every granularity; `gran` labels the set. Uses the
    SQL API over registered temp views (coverage for the spark.sql path)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT CASE WHEN hour IS NOT NULL THEN 'hour' ELSE 'day' END AS gran,
               COALESCE(hour, day) AS bucket,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM (
            SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm') AS hour,
                   date_format(date_trunc('day', ts), 'yyyy-MM-dd HH:mm') AS day,
                   event_type, value
            FROM events
        )
        GROUP BY GROUPING SETS ((hour, event_type), (day, event_type))
        ORDER BY gran, bucket, event_type
        """
    )


# ---------------------------------------------------------------------------
# Range (band) join
# ---------------------------------------------------------------------------

BAND_SEC = 600


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/range self-join: pairs of *error* events by the same user
    within 10 minutes of a *click* event.

    Scale shape: a naive theta-join (|t1-t2| <= 600 s) is a nested-loop
    scan; instead both sides are binned to 600 s buckets and equi-joined on
    (user, bin) for bin and bin±1, then the exact band predicate filters
    residuals. The shuffle is on (user_id, bin) — skew-bounded, and the
    bin fan-out is a constant 2 extra copies of one side.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("click_id"),
        us.alias("click_us"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("error_id"),
        us.alias("error_us"),
    )
    bin_size = BAND_SEC * 1_000_000
    # clicks are replicated to 3 adjacent bins; errors keep one bin.
    # `div` = exact integer division (double `/` + cast risks boundary drift)
    cbin = F.expr(f"click_us div {bin_size}")
    clicks_binned = clicks.withColumn(
        "bin", F.explode(F.array(cbin - 1, cbin, cbin + 1))
    )
    errors_binned = errors.withColumn("bin", F.expr(f"error_us div {bin_size}"))
    return (
        errors_binned.join(clicks_binned, ["u", "bin"])
        .filter(F.abs(F.col("error_us") - F.col("click_us")) <= bin_size)
        .select(
            F.col("u").alias("user_id"),
            "click_id",
            "error_id",
            (F.col("error_us") - F.col("click_us")).alias("delta_us"),
        )
        .orderBy("user_id", "click_id", "error_id")
    )


ORACLE_SQL = {
    "q_udf_surface": """
        SELECT p_brand,
               substr(md5(p_brand), 1, 2) AS brand_shard,
               COUNT(*) AS n_parts,
               CAST(SUM(p_size) AS BIGINT) AS total_size
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    "q_window_functions": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               lag(o_orderkey, 1) OVER w AS prev_order,
               lead(o_orderkey, 1) OVER w AS next_order,
               first_value(o_orderkey) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rnk, o_orderkey
    """,
    "q_topk_per_group": """
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price, rk
        FROM (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)) DESC,
                                l_linenumber ASC) AS rk
            FROM lineitem
        ) WHERE rk <= 3
        ORDER BY l_orderkey, rk
    """,
    "q_time_rollup": """
        SELECT CASE WHEN hour IS NOT NULL THEN 'hour' ELSE 'day' END AS gran,
               COALESCE(hour, day) AS bucket,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM (
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
                   strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M') AS day,
                   event_type, value
            FROM events
        )
        GROUP BY GROUPING SETS ((hour, event_type), (day, event_type))
        ORDER BY gran, bucket, event_type
    """,
    "q_range_join": f"""
        WITH clicks AS (
            SELECT user_id AS u, event_id AS click_id, epoch_us(ts) AS click_us
            FROM events WHERE event_type = 'click'
        ),
        errors AS (
            SELECT user_id AS u, event_id AS error_id, epoch_us(ts) AS error_us
            FROM events WHERE event_type = 'error'
        )
        SELECT e.u AS user_id, c.click_id, e.error_id,
               e.error_us - c.click_us AS delta_us
        FROM errors e JOIN clicks c ON e.u = c.u
        WHERE abs(e.error_us - c.click_us) <= {BAND_SEC * 1_000_000}
        ORDER BY user_id, click_id, error_id
    """,
}


N_HIST_BUCKETS = 20
HIST_WIDTH = 25_000


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width integer histogram of order totals (floor-bucketed, last
    bucket open-ended) — the profiling primitive behind range-partition
    sizing and skew detection. One map-side-combinable aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        # floor, not cast: DuckDB CAST(double AS BIGINT) rounds; Spark truncates
        F.expr(f"CAST(floor(o_totalprice) AS BIGINT) div {HIST_WIDTH}"),
        F.lit(N_HIST_BUCKETS - 1),
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_orders"))
        .withColumn("lo", F.col("bucket") * HIST_WIDTH)
        .select("bucket", "lo", "n_orders")
        .orderBy("bucket")
    )


FUZZY_MAX_DIST = 1


def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match dedup on customer names: all pairs at Levenshtein
    distance <= 1 (same length, i.e. one substitution), found via a
    *wildcard-pattern equi-join*: each name explodes into L patterns with
    position i replaced by a sentinel char; two single-sentinel patterns
    compare equal iff the names agree everywhere except (at most) that one
    position, so the join produces EXACTLY the hamming<=1 pairs — no
    candidate filtering at all, and for equal lengths hamming<=1 is
    Levenshtein<=1.

    Scale shape: candidate volume equals OUTPUT volume (each dist-1 pair
    matches at exactly its one differing position), vs 1.86M
    Levenshtein-filtered candidates for the previous pigeonhole
    odd/even-chars blocking (6.3 s -> 3.6 s at sf0.1). Pattern buckets are
    bounded by alphabet size (all names matching a fixed pattern differ
    only in the free char), so no block ever goes quadratic, unlike prefix
    blocking where TPC-H's shared 'Customer#' prefix creates one
    single-threaded mega-block. The L-fold explode is linear fan-out
    before one well-distributed shuffle — the same explode-don't-filter
    trade as dedup_minhash_lsh banding.

    The DuckDB oracle keeps the independent pigeonhole formulation
    (odd/even interleave blocking + Levenshtein filter), so the check also
    cross-validates two different exact algorithms against each other."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.length("c_name").alias("ln")
    )
    # chr(1) cannot appear in names; one sentinel per position i (0-based)
    variants = cust.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.expr(
                "transform(sequence(0, ln - 1), i -> "
                "concat(substring(c_name, 1, i), chr(1), substring(c_name, i + 2)))"
            )
        ).alias("pat"),
    )
    # shuffle_hash, NOT broadcast: Catalyst costs the join from the tiny
    # pre-explode parquet size and broadcasts the 270k-row variant side —
    # a single-threaded hashed-relation build measured at ~2x the whole
    # query, and scale-wrong (variants grow linearly with customers).
    # Hash-partitioning both sides on pat keeps the join distributed and
    # each bucket alphabet-bounded; no sort needed, so hash beats merge.
    a = variants.hint("shuffle_hash").alias("a")
    b = variants.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.pat") == F.col("b.pat"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("k1"),
            F.col("b.c_custkey").alias("k2"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("dist"),
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)  # invariant guard; no-op filter
        .distinct()  # identical names (dist 0) match at every position
        .orderBy("k1", "k2")
    )


ORACLE_SQL["q_histogram"] = f"""
    SELECT bucket, bucket * {HIST_WIDTH} AS lo, COUNT(*) AS n_orders
    FROM (
        SELECT least(CAST(floor(o_totalprice) AS BIGINT) // {HIST_WIDTH}, {N_HIST_BUCKETS - 1}) AS bucket
        FROM orders
    )
    GROUP BY bucket
    ORDER BY bucket
"""

ORACLE_SQL["dedup_fuzzy_names"] = f"""
    WITH c AS (
        SELECT c_custkey, c_name, length(c_name) AS blk_len,
               regexp_replace(c_name, '(.).', '\\1', 'g') AS blk_odd,
               regexp_replace(c_name, '.(.)?', '\\1', 'g') AS blk_even
        FROM customer
    ), p AS (
        SELECT a.c_custkey AS k1, b.c_custkey AS k2,
               levenshtein(a.c_name, b.c_name) AS dist
        FROM c a JOIN c b
          ON a.blk_len = b.blk_len AND a.blk_odd = b.blk_odd
         AND a.c_custkey < b.c_custkey
        UNION
        SELECT a.c_custkey, b.c_custkey,
               levenshtein(a.c_name, b.c_name)
        FROM c a JOIN c b
          ON a.blk_len = b.blk_len AND a.blk_even = b.blk_even
         AND a.c_custkey < b.c_custkey
    )
    SELECT k1, k2, dist FROM p
    WHERE dist <= {FUZZY_MAX_DIST}
    ORDER BY k1, k2
"""


# ---------------------------------------------------------------------------
# Grouping sets / distribution analytics (functions.scalars-backed)
# ---------------------------------------------------------------------------


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the DataFrame API (Spark 4
    ``DataFrame.groupingSets``) with ``grouping_id()`` labeling each set —
    the general form behind rollup/cube. One shuffle produces all three
    granularities (priority×status, priority, grand total); money is
    aggregated as exact integer cents (functions.money_cents) so the
    cross-engine hash is bit-stable."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(money_cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy("gid", "o_orderpriority", "o_orderstatus")
    )


N_DECILES = 10


def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile profile of order totals: ntile(10) over a *total* order
    (cents, then orderkey as tiebreak — required for cross-engine
    determinism), then per-decile count/min/max.

    Scale note: a global ntile is a single-partition sort by construction;
    this is the exact-quantile yardstick, kept deliberately. The 100 TB
    path for the same question is q_histogram (one map-side-combinable
    pass) or approx percentiles; projecting to 2 narrow columns first
    keeps the sorted row under 16 bytes so even the exact form survives
    far past test scale."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("cents", "o_orderkey")
    return (
        orders.select(
            "o_orderkey", money_cents("o_totalprice").alias("cents")
        )
        .withColumn("decile", F.ntile(N_DECILES).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("decile")
    )


def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active *days* per
    user (events table). The classic anchor trick — day minus
    row_number() is constant within a consecutive run — turns an
    order-dependent problem into a plain groupBy: one window shuffle on
    user_id, one aggregate, no self-join. Dates are emitted as formatted
    strings (date_format/strftime parity)."""
    events = load_table(spark, sf_dir, "events")
    days = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", F.date_sub("day", F.col("rn")))
        .groupBy("user_id", "anchor")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("start_day"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("end_day"),
            F.count("*").alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
        .orderBy("user_id", "start_day")
    )


ORACLE_SQL["q_grouping_sets"] = """
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority, o_orderstatus) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderpriority, o_orderstatus
"""

ORACLE_SQL["q_ntile_deciles"] = f"""
    WITH t AS (
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), d AS (
        SELECT cents, ntile({N_DECILES}) OVER (ORDER BY cents, o_orderkey) AS decile
        FROM t
    )
    SELECT decile, COUNT(*) AS n_orders,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
    FROM d GROUP BY decile ORDER BY decile
"""

ORACLE_SQL["q_gaps_islands"] = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), r AS (
        SELECT user_id, day,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM days
    ), g AS (
        SELECT user_id, day, day - CAST(rn AS INTEGER) AS anchor FROM r
    )
    SELECT user_id,
           strftime(MIN(day), '%Y-%m-%d') AS start_day,
           strftime(MAX(day), '%Y-%m-%d') AS end_day,
           COUNT(*) AS n_days
    FROM g
    GROUP BY user_id, anchor
    ORDER BY user_id, start_day
"""

ORACLE_SQL["q_udtf_surface"] = f"""
    WITH t AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, token
    FROM t WHERE i <= {UDTF_MAX_TOKENS}
    ORDER BY doc_id, pos
"""


# ---------------------------------------------------------------------------
# Time-range window frames + exact quantiles
# ---------------------------------------------------------------------------


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per customer, the trailing-7-day order count
    and spend (exact integer cents) as of each order — ``RANGE BETWEEN
    INTERVAL 7 DAYS PRECEDING AND CURRENT ROW`` over the order-date axis.

    A RANGE frame is value-defined, so peer rows (same customer, same date)
    share one frame regardless of tie order — the result is deterministic
    with no tie-break column, unlike a ROWS frame. One window shuffle on
    o_custkey; at 100 TB the per-key frame state is bounded by orders
    inside the 7-day band, not partition size.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS order_date,
               COUNT(*) OVER w AS n_7d,
               -- floor-before-cast: DuckDB CAST(double AS BIGINT) rounds,
               -- Spark truncates; floor agrees bit-for-bit
               SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER w AS cents_7d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey
        """
    )


def q_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (50th percentile, linear interpolation) of
    lineitem quantity — integer inputs, so the midpoint is an exact IEEE
    half and hashes identically cross-engine.

    Spark's ``percentile`` aggregates a per-group counts map of distinct
    values — exact, mergeable across partitions, memory bounded by distinct
    values (50 here), not row count. For high-cardinality value domains at
    100 TB the scale path is ``approx_percentile`` (mergeable quantile
    summaries with bounded error); this operator is the exact yardstick the
    same way q_ntile_deciles is for deciles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(CAST(l_quantity AS BIGINT), 0.5)").alias("median_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_SQL["q_window_range_frame"] = """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_7d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
"""

ORACLE_SQL["q_exact_median"] = """
    SELECT l_returnflag,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY 1
    ORDER BY l_returnflag
"""


APPROX_QUANTILE_ACC = 100  # 1/relative-error accuracy knob


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the mergeable quantile-summary path that
    replaces q_exact_median at 100 TB — checked against a CONTRACT oracle:
    the output carries the exact median alongside a flag that the
    approximate answer lies within the summary's rank-error bound. The
    oracle states the same exact median and asserts the flag TRUE, so the
    gate fails if Spark's sketch ever violates its accuracy contract
    (sketch internals differ per engine, so value-equality on the
    approximation itself would be meaningless).

    Scale: approx_percentile aggregates a bounded quantile summary
    (Greenwald-Khanna style) per partition and merges summaries — O(acc)
    state regardless of row count, the property the exact counts-map
    median lacks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = "CAST(l_quantity AS BIGINT)"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(f"percentile({qty}, 0.5)").alias("exact_median"),
            F.expr(
                f"approx_percentile({qty}, 0.5, {APPROX_QUANTILE_ACC})"
            ).alias("approx"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            "n_rows",
            # rank error <= 1/acc: for these narrow int domains that means
            # the approx median sits within 1 quantity unit of exact
            (F.abs(F.col("approx") - F.col("exact_median")) <= F.lit(1.0))
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_SQL["q_approx_quantile"] = """
    SELECT l_returnflag,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS exact_median,
           COUNT(*) AS n_rows,
           1 AS within_bound
    FROM lineitem
    GROUP BY 1
    ORDER BY l_returnflag
"""


FFILL_NULL_BELOW = 20.0  # values below this are nulled to create gaps


def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last-observation-carried-forward) — the canonical
    time-series gap repair: per user, NULL readings take the most recent
    non-NULL value, via ``last(col, ignorenulls=True)`` over a running
    ROWS frame. The demo nulls out low readings first so the corpus
    actually has gaps to fill.

    Values pass through untouched (the filled column copies stored doubles
    bit-for-bit, no arithmetic), so cross-engine hashing is safe. One
    window shuffle on user_id; frame state is a single value per key —
    forward fill scales like any running aggregate.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gapped = events.select(
        "user_id",
        "event_id",
        "ts",  # the window's order key must survive this projection
        F.when(F.col("value") >= FFILL_NULL_BELOW, F.col("value")).alias("reading"),
    )
    return gapped.select(
        "user_id",
        "event_id",
        "reading",
        F.last("reading", ignorenulls=True).over(w).alias("filled"),
    ).orderBy("user_id", "event_id")


ORACLE_SQL["q_forward_fill"] = f"""
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN value >= {FFILL_NULL_BELOW} THEN value END AS reading
        FROM events
    )
    SELECT user_id, event_id, reading,
           last_value(reading IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS filled
    FROM g
    ORDER BY user_id, event_id
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sliding event-time windows: F.window(2h, slide 1h) — every
    event lands in exactly two hour-aligned windows, the batch twin of a
    streaming sliding aggregate (the tumbling twin is
    streaming.views_stream.stream_event_summary). Spark's window()
    generator is epoch-aligned, so the oracle reproduces membership as
    the two hour-truncations {trunc(ts), trunc(ts) - 1h}.

    Scale: explode-by-2 then one hash aggregate on (window, type) —
    fan-out is the window/slide ratio, a constant chosen by the query,
    never data-dependent.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


ORACLE_SQL["q_sliding_window"] = """
    WITH x AS (
        SELECT event_id, event_type, value,
               date_trunc('hour', ts) - o.o * INTERVAL 1 HOUR AS win_start
        FROM events, (SELECT unnest(range(0, 2)) AS o) o
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(event_id) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM x
    GROUP BY 1, 2
    ORDER BY win_start, event_type
"""


FUNNEL_STEPS = (("signup", "1_signup"), ("view", "2_view"),
                ("click", "3_click"), ("purchase", "4_purchase"))


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict sequential funnel over the events stream: a user reaches
    step k only with an event of step k's type strictly AFTER their
    step-(k-1) time; each step records the user's earliest qualifying
    time, which gates the next. The canonical product-analytics operator
    (signup -> view -> click -> purchase).

    Scale: one filtered aggregate per step, each joined to the previous
    step's (user, time) table — step tables only shrink, so every join
    after the first is a broadcast of survivors against a type-pruned
    scan; no windows, no per-user sorting.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    prev = None
    counts = []
    for etype, label in FUNNEL_STEPS:
        step = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            step = step.join(prev, "user_id").filter(F.col("ts") > F.col("t_prev"))
        cur = step.groupBy("user_id").agg(F.min("ts").alias("t_prev"))
        counts.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(label).alias("step"), "n_users"
            )
        )
        prev = cur
    out = counts[0]
    for df in counts[1:]:
        out = out.unionByName(df)
    return out.orderBy("step")


ORACLE_SQL["q_funnel"] = """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
    ),
    s4 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
    )
    SELECT step, n_users FROM (
        SELECT '1_signup' AS step, COUNT(*) AS n_users FROM s1
        UNION ALL SELECT '2_view', COUNT(*) FROM s2
        UNION ALL SELECT '3_click', COUNT(*) FROM s3
        UNION ALL SELECT '4_purchase', COUNT(*) FROM s4
    ) ORDER BY step
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity date,
    counted once per (cohort, 7-day offset bucket) they were active in.
    Week offsets are integer day arithmetic ((activity - cohort) div 7),
    not calendar week truncation — identical across engines and
    independent of week-start conventions.

    Scale: two hash aggregates (first-activity, then the matrix) plus a
    broadcast of the per-user cohort table; the distinct-day projection
    bounds the join input at users x active-days.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.distinct()
        .join(F.broadcast(firsts), "user_id")
        .select(
            "cohort_day",
            F.expr("CAST(datediff(d, cohort_day) div 7 AS BIGINT)").alias("week_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_day", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .select(
            # string-rendered date: Spark DateType and DuckDB DATE reach
            # pandas as different dtypes, which the driver's hash rejects
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "week_offset",
            "n_users",
        )
        .orderBy("cohort_day", "week_offset")
    )


ORACLE_SQL["q_retention_cohorts"] = """
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    firsts AS (SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY 1),
    marks AS (
        SELECT DISTINCT f.cohort_day,
               date_diff('day', f.cohort_day, a.d) // 7 AS week_offset,
               a.user_id
        FROM act a JOIN firsts f USING (user_id)
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           week_offset, COUNT(*) AS n_users
    FROM marks
    GROUP BY 1, 2
    ORDER BY cohort_day, week_offset
"""
