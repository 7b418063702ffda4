"""Time-series / behavioral analytics over the events stream table:
robust outlier profiling (median/MAD), CUSUM changepoint detection, and
market-basket co-occurrence.

[EXTENDED] — the reference (`/root/reference/main.py`) has no event
analytics; these are the monitoring/insight queries a pipeline team runs
over the same tables the engine already serves. Same cross-engine
determinism discipline as the rest of the query packages: every
comparison that involves a ratio is restated division-free over exact
integers (cents, scaled deviations, cross-multiplied lifts), so Spark
and DuckDB agree to the bit.

Scale notes (100 TB):

* ``q_outlier_mad`` makes three passes over events (median, MAD, flag) —
  each a map-side-combinable hash aggregate plus a BROADCAST join of the
  tiny per-type stats table back onto the fact. The exact ``percentile``
  holds per-group distinct-value counts (bounded here); the single-pass
  sketch path for unbounded domains is ``approx_percentile``, whose
  accuracy-contract gate lives at ``q_approx_quantile``.
* ``q_cusum_changepoint`` reduces the corpus to one row per day FIRST
  (the only corpus-sized shuffle), then runs the cumulative scan over
  that day-cardinality table in a single-partition window — thousands of
  rows at any corpus size, deliberately not distributed.
* ``q_market_basket`` self-joins the distinct (user, type) projection on
  user_id: per-user fan-out is k(k-1)/2 with k <= |event types|, so the
  pair count is corpus-linear, never user-count x type-count quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import money_cents

ORACLE_SQL: dict[str, str] = {}

# |v - median| > MAD_K * MAD flags an outlier (the classic 3-sigma-ish cut;
# with the x2/x4 integer scaling below the test is 2*dev2 > MAD_K*mad4)
MAD_K = 3

# a day is a changepoint candidate when |cusum| reaches CUSUM_FRAC of the
# peak |cusum| (cross-multiplied: 100*|cusum| >= CUSUM_FRAC_PCT*peak)
CUSUM_FRAC_PCT = 80


def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier profile of ``value``: median and MAD
    (median absolute deviation) in integer cents, plus how many events
    sit more than ``MAD_K`` MADs from the median.

    Exactness: values quantize to cents (BIGINT). A 0.5-percentile of
    integers is integer or half-integer, so ``2*percentile`` is an exact
    BIGINT (``m2`` = 2x median); deviations ``dev2 = |2v - m2|`` are
    exact BIGINTs (= 2x the absolute deviation), and ``mad4`` =
    2*percentile(dev2) is again exact (= 4x MAD). The outlier test
    |v - med| > MAD_K*MAD becomes the division-free integer compare
    ``2*dev2 > MAD_K*mad4``.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        money_cents(F.col("value")).alias("v"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(v, 0.5) AS BIGINT)").alias("m2")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(F.col("v") * 2 - F.col("m2"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(dev2, 0.5) AS BIGINT)").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("dev2") * 2 > F.col("mad4") * MAD_K, 1).otherwise(0)
            ).alias("n_outliers"),
            F.first("m2").alias("med_cents_x2"),
            F.first("mad4").alias("mad_cents_x4"),
        )
        .orderBy("event_type")
    )


ORACLE_SQL["q_outlier_mad"] = f"""
    WITH ev AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events
    ),
    med AS (
        SELECT event_type, CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS m2
        FROM ev GROUP BY 1
    ),
    dev AS (
        SELECT ev.event_type, ABS(ev.v * 2 - med.m2) AS dev2, med.m2
        FROM ev JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        FROM dev GROUP BY 1
    )
    SELECT dev.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN dev.dev2 * 2 > mad.mad4 * {MAD_K}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(FIRST(dev.m2) AS BIGINT) AS med_cents_x2,
           CAST(FIRST(mad.mad4) AS BIGINT) AS mad_cents_x4
    FROM dev JOIN mad USING (event_type)
    GROUP BY 1
    ORDER BY event_type
"""


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily event count: per day,
    the cumulative sum of (scaled) deviations from the global daily
    mean, and a flag for the days where |cusum| reaches
    ``CUSUM_FRAC_PCT``% of the peak — the classic drift detector for
    ingest-volume monitoring.

    Division-free: with D days and T total events the per-day deviation
    is ``D*c_d - T`` (mean-centered counts scaled by D, exact BIGINT),
    so the cusum, the peak, and the percent threshold are all integer
    arithmetic.

    The day table is aggregate output (one row per day); both windows
    run unpartitioned over it by design — see module scale notes.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("c"))
    )
    return (
        cusum_scan(daily)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("c").alias("n_events"),
            "cusum",
            "is_changepoint",
        )
        .orderBy("day")
    )


def cusum_scan(daily: DataFrame) -> DataFrame:
    """CUSUM kernel over a (d, c) per-bucket count table: adds the
    integer ``cusum`` (running sum of D*c - T deviations) and the
    ``is_changepoint`` flag (|cusum| reaches CUSUM_FRAC_PCT% of the
    peak, cross-multiplied). Pure DataFrame-in/DataFrame-out so the
    property suite can drive it with arbitrary count series."""
    totals = daily.agg(
        F.count("*").alias("n_days"), F.sum("c").alias("n_total")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        daily.crossJoin(F.broadcast(totals))
        .withColumn("dev", F.col("c") * F.col("n_days") - F.col("n_total"))
        .withColumn("cusum", F.sum("dev").over(w))
        .withColumn("peak", F.max(F.abs(F.col("cusum"))).over(wall))
        .select(
            "d",
            "c",
            "cusum",
            F.when(
                F.abs(F.col("cusum")) * 100 >= F.col("peak") * CUSUM_FRAC_PCT, 1
            )
            .otherwise(0)
            .cast("long")
            .alias("is_changepoint"),
        )
    )


ORACLE_SQL["q_cusum_changepoint"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
    ),
    totals AS (SELECT COUNT(*) AS n_days, SUM(c) AS n_total FROM daily),
    scan AS (
        SELECT d, c,
               CAST(SUM(c * n_days - n_total)
                    OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
        FROM daily CROSS JOIN totals
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           c AS n_events,
           cusum,
           CAST(CASE WHEN ABS(cusum) * 100 >=
                    (MAX(ABS(cusum)) OVER ()) * {CUSUM_FRAC_PCT}
                THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
    FROM scan
    ORDER BY day
"""


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence (market-basket pairs): for every ordered
    pair of event types (a < b), how many users did both, each, and
    whether the pair is positively associated. Lift > 1, i.e.
    support/N > (n_a/N)(n_b/N), is the cross-multiplied integer test
    ``support*n_users > n_a*n_b`` — no floating ratio ever materializes.

    Shape: the distinct (user, type) projection is built ONCE (one hash
    aggregate), self-joined on user_id (per-user fan-out bounded by the
    type-set size), and the tiny marginals broadcast back onto the pair
    counts.
    """
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    return basket_pairs(ut).orderBy(F.desc("support"), "type_a", "type_b")


def basket_pairs(ut: DataFrame) -> DataFrame:
    """Co-occurrence kernel over a DISTINCT (user_id, event_type)
    projection: (type_a, type_b, support, n_a, n_b, n_users,
    positive_assoc) for every a < b pair. Pure DataFrame-in/out so the
    property suite can drive it with arbitrary basket sets."""
    n_users = ut.agg(F.count_distinct("user_id").alias("n_users"))
    marg = ut.groupBy("event_type").agg(F.count("*").alias("n_type"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("support"))
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(marg.select(F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "support",
            "n_a",
            "n_b",
            "n_users",
            F.when(F.col("support") * F.col("n_users") > F.col("n_a") * F.col("n_b"), 1)
            .otherwise(0)
            .cast("long")
            .alias("positive_assoc"),
        )
    )


ORACLE_SQL["q_market_basket"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
    marg AS (SELECT event_type, COUNT(*) AS n_type FROM ut GROUP BY 1),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS support
        FROM ut a JOIN ut b ON a.user_id = b.user_id
                           AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.support,
           ma.n_type AS n_a, mb.n_type AS n_b, n.n_users,
           CAST(CASE WHEN p.support * n.n_users > ma.n_type * mb.n_type
                THEN 1 ELSE 0 END AS BIGINT) AS positive_assoc
    FROM pairs p
    JOIN marg ma ON ma.event_type = p.type_a
    JOIN marg mb ON mb.event_type = p.type_b
    CROSS JOIN n
    ORDER BY support DESC, type_a, type_b
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (the Markov-chain view of user
    behavior): per user, events ordered by (ts, event_id); every adjacent
    pair contributes one (prev_type, next_type) observation. Emits the
    count matrix plus each row's most-likely next event as an integer
    rank (rank 1 = argmax, count-desc then name-asc — no probability
    ratio ever materializes).

    Shape: ONE shuffle (the per-user window sort) feeds lag(), then a
    map-side-combinable count aggregate over at most |types|^2 groups and
    a window rank over that tiny matrix.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    rw = Window.partitionBy("prev_type").orderBy(
        F.desc("n"), F.col("next_type")
    )
    return (
        pairs.groupBy(
            F.col("prev_type"), F.col("event_type").alias("next_type")
        )
        .agg(F.count("*").alias("n"))
        .withColumn("next_rank", F.row_number().over(rw).cast("long"))
        .orderBy("prev_type", "next_type")
    )


ORACLE_SQL["q_event_transitions"] = """
    WITH seq AS (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    matrix AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST(ROW_NUMBER() OVER (PARTITION BY prev_type
                                   ORDER BY n DESC, next_type) AS BIGINT)
               AS next_rank
    FROM matrix
    ORDER BY prev_type, next_type
"""
