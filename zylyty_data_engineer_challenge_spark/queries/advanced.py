"""Advanced relational surface: the operator families a full engine needs
beyond SURVEY.md §2's literal inventory — outer joins, CUBE, as-of join,
sessionization, skew-salted aggregation, JSON/map functions, correlated
scalar subqueries.

Same correctness-gate discipline as :mod:`.relational`: identical aliases
on both engines, decimal for money, integer counts, timestamps leave as
formatted strings, deterministic tie-breaks.

Scale notes are per-operator; the common theme: every query here is one or
two key-partitioned shuffles with map-side partials, no driver loops, no
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

DEC = "decimal(18,2)"


def q_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer with null-aware fill: every customer, their order count
    and exact spend, 0 for order-less customers (inner join would drop
    them). customer side stays un-broadcast: preserving ALL rows of the
    outer side means the outer side must not be the broadcast build side."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast(DEC).alias("spend"),
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("spend"), F.lit(0).cast(DEC)).cast("double").alias("spend"),
        )
        .orderBy("c_custkey")
    )


def q_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with GROUPING() markers — all
    2^2 grouping-set combinations in one pass (partial aggregation handles
    each set map-side; one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_price"),
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
        )
        .orderBy(
            F.col("g_flag"),
            F.col("g_status"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (event-time point lookup): for every event, the timestamp
    of the same user's most recent *purchase* at-or-before it.

    Spark has no ASOF JOIN operator; the idiomatic single-shuffle form is a
    running `max(CASE WHEN purchase THEN ts END)` over the user's event
    timeline — one window, no self-join, no range explosion. (A sort-merge
    as-of between two tables uses the same trick after a unionByName with a
    side tag.) Total order (ts, event_id) makes ties deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_ts = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_type",
        F.date_format(purchase_ts, "yyyy-MM-dd HH:mm:ss").alias("last_purchase_ts"),
    ).orderBy("user_id", "event_id")


SESSION_GAP_MIN = 30


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands): a new session starts when a
    user's inter-event gap exceeds 30 minutes; emit per-session bounds and
    counts. One shuffle on user_id; two stacked windows (lag, then running
    sum) — the batch shape of streaming session windows."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds — cast(ts as long) truncates to seconds,
    # which disagrees with sub-second-precision gap comparisons
    gap = (
        F.unix_micros(F.col("ts"))
        - F.lag(F.unix_micros(F.col("ts")), 1).over(order_w)
    )
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    with_session = ev.withColumn("is_new", new_session).withColumn(
        "session_seq",
        F.sum("is_new").over(
            order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


N_SALTS = 8


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated two-phase aggregation: a hot grouping key (event_type
    — 5 values over 100k+ rows) is salted with a deterministic shard
    (event_id % 8), partially aggregated per (key, salt), then finally
    combined per key. Output is identical to the direct groupBy — which is
    exactly what the oracle checks — while the shuffle fans the hot key
    over 8 reducers instead of 1.

    (Catalyst's partial aggregation already handles this case; the pattern
    matters when partials can't combine — e.g. exact distinct sets or
    UDAF state — and for demonstrating the mechanics explicitly.)
    """
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.col("event_id") % N_SALTS)
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast(DEC)).alias("pv"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


def q_json_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + map + array function surface: parse the props JSON into a
    map, extract typed values, build/inspect arrays — all JVM built-ins.
    Narrow per-row projection; nothing shuffles but the final sort.

    Array-valued intermediates (map_keys, the tag array) are serialized to
    sorted comma-joined strings in the output: the driver's pandas
    canonicalizer cannot hash list cells (r1 `err`), and sorting removes
    any cross-engine key-order dependence."""
    ev = load_table(spark, sf_dir, "events")
    props_map = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        props_map.getItem("k").cast("int").alias("k_value"),
        F.array_join(F.array_sort(F.map_keys(props_map)), ",").alias("prop_keys"),
        F.size(F.map_keys(props_map)).alias("n_props"),
        F.array_join(F.array(F.col("event_type"), F.lit("evt")), ",").alias("tags"),
        F.array_contains(F.array(F.lit("click"), F.lit("view")), F.col("event_type")).cast(
            "int"
        ).alias("is_passive"),
    ).orderBy("event_id")


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-subquery shape: orders costing more than 2x their
    customer's average order value. Decorrelated the way Catalyst would:
    compute per-customer aggregates once, broadcast-join them back, compare
    in exact decimal (avg as sum/count stays a decimal-by-integer compare:
    2 * count * price > 2-free exact form avoids float division)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("total"),
        F.count("*").alias("cnt"),
    )
    joined = orders.join(F.broadcast(per_cust), orders.o_custkey == per_cust.k)
    # price > 2 * avg  ⟺  price * cnt > 2 * total   (all exact decimal/int)
    return (
        joined.filter(
            F.col("o_totalprice").cast(DEC) * F.col("cnt") > 2 * F.col("total")
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast(DEC).cast("double").alias("price"),
            "cnt",
            F.col("total").cast(DEC).cast("double").alias("cust_total"),
        )
        .orderBy("o_orderkey")
    )


ORACLE_SQL = {
    "q_outer_joins": """
        WITH per_cust AS (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_mktsegment,
               COALESCE(p.n_orders, 0) AS n_orders,
               CAST(COALESCE(p.spend, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
        ORDER BY c.c_custkey
    """,
    "q_cube_sales": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status,
                 l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "q_asof_join": """
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               event_type,
               strftime(
                   MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   '%Y-%m-%d %H:%M:%S') AS last_purchase_ts
        FROM events
        ORDER BY user_id, event_id
    """,
    "q_sessionize": f"""
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1_000_000}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
            FROM gaps
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        FROM sess
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    "q_salted_agg": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_json_map_ops": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
               array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
               len(json_keys(props)) AS n_props,
               array_to_string([event_type, 'evt'], ',') AS tags,
               CAST(list_contains(['click', 'view'], event_type) AS INT) AS is_passive
        FROM events
        ORDER BY event_id
    """,
    "q_scalar_subquery": """
        WITH per_cust AS (
            SELECT o_custkey AS k,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
                   COUNT(*) AS cnt
            FROM orders GROUP BY o_custkey
        )
        SELECT o.o_orderkey, o.o_custkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               p.cnt,
               CAST(CAST(p.total AS DECIMAL(18,2)) AS DOUBLE) AS cust_total
        FROM orders o JOIN per_cust p ON o.o_custkey = p.k
        WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * p.cnt > 2 * p.total
        ORDER BY o.o_orderkey
    """,
}


# ---------------------------------------------------------------------------
# Reshape (unpivot) + null semantics
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshape: per-user event counts are pivoted into one
    column per event type, then ``DataFrame.unpivot`` (ANSI UNPIVOT /
    melt) turns them back into (user_id, event_type, n_events) rows —
    round-tripping q_pivot_events' reshape, with absent combinations
    (NULL cells) dropped to match the relational group-by form.

    Scale: unpivot is a map-only explode of W value columns into W rows —
    no shuffle at all; the only shuffle here is the upstream pivot
    aggregate. The oracle states the equivalent long-form group-by.
    """
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count("event_id"))
    )
    return (
        wide.unpivot(
            ids=["user_id"],
            values=list(EVENT_TYPES),
            variableColumnName="event_type",
            valueColumnName="n_events",
        )
        .filter(F.col("n_events").isNotNull())
        .orderBy("user_id", "event_type")
    )


NULLIF_NATION = 5


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics breadth on one derived nullable key: NULLIF
    manufactures NULLs, a null-safe self-equality (``<=>`` /
    IS NOT DISTINCT FROM) join groups the NULL key with itself (a plain
    ``=`` join would drop it), and the aggregate shows NULL's own group
    with COALESCE labeling.

    Scale: the null-safe join hashes NULL like any other key value — which
    is exactly why a high-NULL column needs the same skew treatment as any
    hot key (see q_salted_agg); the demo key here is low-cardinality and
    broadcast. Output: per nation-or-NULL group, customer count from both
    join paths, proving = drops the NULL group while <=> keeps it.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif("c_nationkey", F.lit(NULLIF_NATION)).alias("nkey")
    )
    groups = cust.select("nkey").distinct()
    eq = groups.alias("g").join(
        cust.alias("c"), F.col("g.nkey") == F.col("c.nkey"), "left"
    )
    nseq = groups.alias("g").join(
        cust.alias("c"), F.col("g.nkey").eqNullSafe(F.col("c.nkey")), "left"
    )

    def counted(df: DataFrame, colname: str) -> DataFrame:
        return df.groupBy(F.col("g.nkey").alias("nkey")).agg(
            F.count("c.c_custkey").alias(colname)
        )

    left, right = counted(eq, "n_eq").alias("l"), counted(nseq, "n_nullsafe").alias("r")
    return (
        # the combining join must itself be null-safe, or the NULL group
        # row (the query's whole point) would be dropped right here
        left.join(right, F.col("l.nkey").eqNullSafe(F.col("r.nkey")))
        .select(F.col("l.nkey").alias("nkey"), "n_eq", "n_nullsafe")
        .select(
            F.coalesce(F.col("nkey").cast("string"), F.lit("<null>")).alias("group_key"),
            "n_eq",
            "n_nullsafe",
        )
        .orderBy("group_key")
    )


ORACLE_SQL["q_unpivot"] = """
    SELECT user_id, event_type, COUNT(event_id) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY user_id, event_type
"""

ORACLE_SQL["q_null_semantics"] = f"""
    WITH cust AS (
        SELECT c_custkey, NULLIF(c_nationkey, {NULLIF_NATION}) AS nkey
        FROM customer
    ),
    groups AS (SELECT DISTINCT nkey FROM cust),
    eq AS (
        SELECT g.nkey, COUNT(c.c_custkey) AS n_eq
        FROM groups g LEFT JOIN cust c ON g.nkey = c.nkey
        GROUP BY 1
    ),
    nseq AS (
        SELECT g.nkey, COUNT(c.c_custkey) AS n_nullsafe
        FROM groups g LEFT JOIN cust c ON g.nkey IS NOT DISTINCT FROM c.nkey
        GROUP BY 1
    )
    SELECT COALESCE(CAST(e.nkey AS VARCHAR), '<null>') AS group_key,
           e.n_eq, n.n_nullsafe
    FROM eq e JOIN nseq n ON e.nkey IS NOT DISTINCT FROM n.nkey
    ORDER BY group_key
"""


OVERLAP_MIN = 15
OVERLAP_US = OVERLAP_MIN * 60 * 1_000_000


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of events by the same user whose
    15-minute activity intervals [ts, ts+15min) overlap, with the exact
    overlap length in integer microseconds — completing the temporal-join
    family (as-of = q_asof_join, band = q_range_join, overlap = here).

    Scale shape: equal-length intervals overlap only if their start bins
    (bin width = interval length) differ by at most 1, so one side explodes
    into its three adjacent bin keys and the join is a pure (user, bin)
    EQUI-join plus a residual |Δts| filter — never an inequality
    (nested-loop) join. Each true pair matches on exactly one bin key, so
    no distinct is needed. 3x fan-out on one side, hash join, done.
    """
    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.expr(f"unix_micros(ts) div {OVERLAP_US}").alias("bin"),
    )
    a = ev.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
        ).alias("key"),
    )
    b = ev.select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("us").alias("b_us"),
        F.col("bin").alias("key"),
    )
    return (
        a.join(b, ["user_id", "key"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_us") - F.col("b_us")) < OVERLAP_US)
        )
        .select(
            "user_id",
            "a_id",
            "b_id",
            (F.lit(OVERLAP_US) - F.abs(F.col("a_us") - F.col("b_us"))).alias(
                "overlap_us"
            ),
        )
        .orderBy("a_id", "b_id")
    )


ORACLE_SQL["q_interval_overlap"] = f"""
    SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
           {OVERLAP_US} - abs(epoch_us(a.ts) - epoch_us(b.ts)) AS overlap_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) < {OVERLAP_US}
    ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Salted skew join
# ---------------------------------------------------------------------------

# fold every suppkey divisible by 10 onto one hot key: ~10% of lineitem
# lands on skew_key 0, a realistic power-law hot spot
_SKEW_KEY = "CASE WHEN l_suppkey % 10 = 0 THEN 0 ELSE l_suppkey END"


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dimension join: the fact side's hot key is
    sharded with a deterministic salt and the dimension side is replicated
    across all shards, so the hot key's rows spread over several reducers
    instead of one straggler — the manual technique AQE's skew-join
    automates, expressed as a plan. The oracle runs the PLAIN unsalted
    join: salting must be semantically invisible, and the differential
    check proves it.

    The shard count is NOT a constant: the skew-profile statistics pass
    (:func:`..warehouse.key_skew_stats` — the q_skew_profile shape
    reduced to the two numbers that matter) measures the fact side's
    hottest key, and :func:`..warehouse.decide_salt_shards` converts it
    into exactly enough shards to flatten that key to an average
    reducer's load (1 = no salting on a skew-free key). The stats pass
    demonstrably DECIDES the plan; tests/test_skew_decision.py pins that
    a synthetic hot key changes the decision while rows never change.

    Scale shape: fan-out is dimension-side only (|dim| x shards rows),
    fact rows are mapped once; the join is a pure (key, salt) equi-join.
    At 100 TB the stats come from the maintained q_skew_profile table
    rather than an inline pass.
    """
    from .warehouse import decide_salt_shards, key_skew_stats

    li_keys = load_table(spark, sf_dir, "lineitem").select(
        F.expr(_SKEW_KEY).alias("skew_key")
    )
    shards = decide_salt_shards(*key_skew_stats(li_keys, "skew_key"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(_SKEW_KEY).alias("skew_key"),
        # deterministic shard from line identity — NOT rand(): reruns and
        # retried tasks must land rows on the same shard
        F.expr(f"(l_orderkey * 7 + l_linenumber) % {shards}").alias("salt"),
        "l_extendedprice",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.expr("CASE WHEN s_suppkey % 10 = 0 THEN 0 ELSE s_suppkey END").alias(
            "skew_key"
        ),
        "s_nationkey",
    )
    dim = supp.distinct().crossJoin(
        F.broadcast(spark.range(shards).select(F.col("id").alias("salt")))
    )
    return (
        li.join(dim, ["skew_key", "salt"])
        .groupBy("skew_key", "s_nationkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("skew_key", "s_nationkey")
    )


ORACLE_SQL["q_salted_join"] = f"""
    WITH li AS (
        SELECT {_SKEW_KEY} AS skew_key, l_extendedprice FROM lineitem
    ),
    dim AS (
        SELECT DISTINCT CASE WHEN s_suppkey % 10 = 0 THEN 0 ELSE s_suppkey END
                   AS skew_key,
               s_nationkey
        FROM supplier
    )
    SELECT li.skew_key, dim.s_nationkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM li JOIN dim ON li.skew_key = dim.skew_key
    GROUP BY 1, 2
    ORDER BY li.skew_key, dim.s_nationkey
"""
