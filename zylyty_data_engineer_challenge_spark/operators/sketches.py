"""Mergeable sketches, cross-engine deterministic.

[EXTENDED] — approximate distinct-counting at 100 TB is done with sketches
(HLL, theta, KMV), whose partials merge associatively across partitions.
Spark's approx_count_distinct (HLL++) is not reproducible against another
engine, so this module implements **KMV (k-minimum-values)**: keep the k
smallest 60-bit md5 hashes per group; the cardinality estimate is
``(k-1) * 2^60 div kth_min`` — entirely integer arithmetic over md5, so
Spark and DuckDB agree exactly, while keeping the real sketch properties
(fixed size, mergeable by taking the k smallest of a union).

Scale: per-group state is k values regardless of cardinality. Both KMV
queries maintain the k-min set per partition in a streaming mapInPandas
pass and derive the per-group / merged sketches from the
O(partitions x k) partials — raw hashes never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

K = 64
HASH_SPACE = 1 << 60  # 15 md5 hex chars


def _partition_kmins(batches):
    """Per-partition KMV state: stream the partition's Arrow batches
    through a {group -> k smallest distinct hashes} dict and emit only the
    final k-min sets — O(groups x K) memory and output per partition, no
    shuffle of raw hashes. Any value among a group's global k smallest
    distinct hashes is necessarily among its partition's k smallest, so
    merging the per-partition sets (distinct -> sort -> first K) is exact.
    """
    import numpy as np
    import pandas as pd

    state: dict[str, "np.ndarray"] = {}
    for pdf in batches:
        for flag, sub in pdf.groupby("l_returnflag"):
            arr = np.unique(sub["h"].to_numpy())  # sorted distinct
            prev = state.get(flag)
            merged = arr if prev is None else np.unique(np.concatenate([prev, arr]))
            state[flag] = merged[:K]
    flags = sorted(state)
    yield pd.DataFrame(
        {
            "l_returnflag": [f for f in flags for _ in range(len(state[f]))],
            "h": np.concatenate([state[f] for f in flags])
            if flags
            else np.array([], dtype="int64"),
        }
    )


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch of l_orderkey per l_returnflag, alongside
    the exact count so the estimate's error is visible in the output.

    The k-min set is maintained per partition in a streaming mapInPandas
    pass (bounded state, output O(groups x K) per partition), then merged
    globally — raw hashes are never shuffled, which is the production KMV
    shape; the exact_distinct companion column is the one full-shuffle
    aggregate, present by design as the yardstick.
    """
    li = load_table(spark, sf_dir, "lineitem")
    hashed = li.select(
        "l_returnflag",
        F.expr(
            "CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    partials = hashed.mapInPandas(_partition_kmins, schema="l_returnflag string, h bigint")
    w = Window.partitionBy("l_returnflag").orderBy("h")
    kth = (
        partials.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == K)
        .select("l_returnflag", F.col("h").alias("kth_min"))
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return (
        exact.join(kth, "l_returnflag", "left")
        .select(
            "l_returnflag",
            "exact_distinct",
            "kth_min",
            F.when(
                F.col("kth_min").isNotNull(),
                # cast BEFORE multiplying: (k-1)*2^60 overflows int64
                F.expr(f"(CAST({K} - 1 AS DECIMAL(38,0)) * {HASH_SPACE}) div kth_min"),
            )
            .otherwise(F.col("exact_distinct"))  # < K distinct: sketch is exact
            .cast("bigint")
            .alias("kmv_estimate"),
        )
        .orderBy("l_returnflag")
    )


def sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE: the global distinct-count estimate obtained by merging
    the per-returnflag KMV sketches — union the per-group k-min sets, keep
    the k smallest — next to the exact global count.

    Mergeability is the property that matters at 100 TB: per-partition /
    per-group sketches combine associatively into coarser rollups without
    rescanning the data. Merging KMV sketches = k smallest of the union of
    k-min sets; since every hash retained by a group sketch is one of that
    group's k smallest, the union contains the k globally-smallest distinct
    hashes, so the merged estimator equals the global KMV estimator exactly
    — which is what the oracle checks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    hashed = li.select(
        "l_returnflag",
        F.expr(
            "CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    # same bounded-state partial pass as sketch_kmv_distinct: per-partition
    # k-min sets (superset of every group's true k-min set), then the
    # per-group and merged sketches both derive from the tiny partials
    partials = hashed.mapInPandas(_partition_kmins, schema="l_returnflag string, h bigint")
    w = Window.partitionBy("l_returnflag").orderBy("h")
    per_group = (
        partials.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
    )
    merged_kth = (
        per_group.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") == K)
        .select(F.col("h").alias("kth_min"))
    )
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_distinct"))
    return exact.crossJoin(merged_kth).select(
        "exact_distinct",
        "kth_min",
        F.expr(
            f"CAST((CAST({K} - 1 AS DECIMAL(38,0)) * {HASH_SPACE}) div kth_min AS BIGINT)"
        ).alias("kmv_estimate"),
    )


HLL_BUCKETS = 64  # m = 2^6
HLL_MAX_RHO = 55  # 60-bit hash minus 6 bucket bits -> 54 payload bits + 1


def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table of distinct l_orderkey per l_returnflag:
    bucket = low 6 bits of the 60-bit md5 hash, rho = (trailing zeros of
    the remaining bits) + 1, register = MAX(rho) per (group, bucket).

    rho uses the trailing-zero variant (``bit_count((w & -w) - 1) + 1``) —
    same geometric distribution as the classic leading-zero rank, chosen
    because it is exact int64 arithmetic that Spark and DuckDB evaluate
    identically (no float log2). The register table IS the sketch: fixed
    64 rows per group, mergeable by MAX — partial aggregation means each
    executor ships at most 64 registers per group regardless of data
    volume, the whole point of HLL at 100 TB. The float estimator
    (alpha_m * m^2 / sum 2^-rho) is applied at read time and is checked in
    a unit test rather than the oracle (it is a derived constant away from
    the registers, not extra information).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            F.expr(
                "CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
        .select(
            "l_returnflag",
            F.expr(f"h % {HLL_BUCKETS}").alias("bucket"),
            F.expr(f"h div {HLL_BUCKETS}").alias("w"),
        )
        .select(
            "l_returnflag",
            "bucket",
            F.expr(
                f"CASE WHEN w = 0 THEN {HLL_MAX_RHO} "
                "ELSE bit_count((w & -w) - 1) + 1 END"
            ).alias("rho"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.max("rho").alias("register"))
        .orderBy("l_returnflag", "bucket")
    )


def hll_estimate(registers) -> float:
    """Driver-side HLL estimator over collected (bucket, register) rows for
    one group — used by the unit test to check the sketch's accuracy."""
    m = HLL_BUCKETS
    filled = {r["bucket"]: r["register"] for r in registers}
    z = sum(2.0 ** -filled.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m / z


ORACLE_SQL = {
    "sketch_hll_registers": f"""
        WITH hashed AS (
            SELECT l_returnflag,
                   ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM lineitem
        ),
        split AS (
            SELECT l_returnflag, h % {HLL_BUCKETS} AS bucket, h // {HLL_BUCKETS} AS w
            FROM hashed
        )
        SELECT l_returnflag, bucket,
               MAX(CASE WHEN w = 0 THEN {HLL_MAX_RHO}
                        ELSE bit_count((w & (-w)) - 1) + 1 END) AS register
        FROM split
        GROUP BY 1, 2
        ORDER BY l_returnflag, bucket
    """,
    "sketch_kmv_union": f"""
        WITH hashed AS (
            SELECT DISTINCT l_returnflag,
                   ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM lineitem
        ),
        per_group AS (
            SELECT l_returnflag, h
            FROM hashed
            QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY h) <= {K}
        ),
        kth AS (
            SELECT h AS kth_min FROM (SELECT DISTINCT h FROM per_group)
            QUALIFY row_number() OVER (ORDER BY h) = {K}
        )
        SELECT (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS exact_distinct,
               k.kth_min,
               -- HUGEINT (int128) floor division: DECIMAL // rounds at scale 0
               -- BEFORE flooring and can come out one high; Spark's integral
               -- div truncates exactly
               CAST(CAST(({K} - 1) AS HUGEINT) * {HASH_SPACE} // k.kth_min AS BIGINT)
                   AS kmv_estimate
        FROM kth k
    """,
    "sketch_kmv_distinct": f"""
        WITH hashed AS (
            SELECT DISTINCT l_returnflag,
                   ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM lineitem
        ),
        kth AS (
            SELECT l_returnflag, h AS kth_min
            FROM hashed
            QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY h) = {K}
        ),
        exact AS (
            SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_distinct
            FROM lineitem GROUP BY 1
        )
        SELECT e.l_returnflag, e.exact_distinct, k.kth_min,
               -- HUGEINT floor division, not DECIMAL //: see sketch_kmv_union
               CAST(CASE WHEN k.kth_min IS NOT NULL
                    THEN CAST(({K} - 1) AS HUGEINT) * {HASH_SPACE} // k.kth_min
                    ELSE e.exact_distinct END AS BIGINT) AS kmv_estimate
        FROM exact e LEFT JOIN kth k ON e.l_returnflag = k.l_returnflag
        ORDER BY e.l_returnflag
    """,
}


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS = 960  # 16 words x 60 usable bits (DuckDB << overflows at 63)
BLOOM_WORD_BITS = 60
BLOOM_ACCTBAL_MIN = 9000


def sketch_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, end to end: build a 960-bit bloom
    (k=3 md5-derived hash positions, bit_or word aggregation) over the
    keys of a filtered customer dimension, probe every distinct orders
    custkey against it, and report build/probe/pass/true-match counts —
    the false-positive overshoot (n_bloom_pass - n_true_match) is visible
    in the output.

    Scale: this is THE shuffle-avoidance pattern for selective joins at
    100 TB — the bloom aggregates to 16 int64 words per executor
    (map-side bit_or partials), broadcasts for free, and filters the fact
    scan *before* the join shuffle, which is what Spark's runtime row-group
    bloom pushdown does internally; building it explicitly makes the
    technique engine-portable and the FP rate auditable. All arithmetic is
    md5-derived integers: both engines build bit-identical filters.
    """
    cust_keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") >= BLOOM_ACCTBAL_MIN)
        .select("c_custkey")
        .distinct()
    )
    h = (
        "CAST(conv(substr(md5(CAST({k} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )

    def positions(df: DataFrame, key: str) -> DataFrame:
        hh = h.format(k=key)
        return df.select(
            F.col(key).alias("key"),
            F.explode(
                F.expr(
                    f"array({hh} % {BLOOM_BITS},"
                    f" ({hh} div {BLOOM_BITS}) % {BLOOM_BITS},"
                    f" ({hh} div {BLOOM_BITS * BLOOM_BITS}) % {BLOOM_BITS})"
                )
            ).alias("pos"),
        ).select(
            "key",
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            F.expr(f"pos % {BLOOM_WORD_BITS}").alias("bit"),
        )

    bloom = (
        positions(cust_keys, "c_custkey")
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").alias("bits"))
    )
    probe_keys = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    probed = (
        positions(probe_keys, "o_custkey")
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("key")
        .agg(
            F.min(
                F.expr("CAST(shiftright(coalesce(bits, CAST(0 AS BIGINT)), CAST(bit AS INT)) & 1 AS INT)")
            ).alias("all_set")
        )
    )
    n_pass = probed.filter(F.col("all_set") == 1).agg(
        F.count("*").alias("n_bloom_pass")
    )
    n_true = (
        probe_keys.join(cust_keys, probe_keys.o_custkey == cust_keys.c_custkey, "semi")
        .agg(F.count("*").alias("n_true_match"))
    )
    return (
        cust_keys.agg(F.count("*").alias("n_build_keys"))
        .crossJoin(probe_keys.agg(F.count("*").alias("n_probe_keys")))
        .crossJoin(n_pass)
        .crossJoin(n_true)
    )


ORACLE_SQL["sketch_bloom_join"] = f"""
    WITH build AS (
        SELECT DISTINCT c_custkey AS key FROM customer
        WHERE c_acctbal >= {BLOOM_ACCTBAL_MIN}
    ),
    bpos AS (
        SELECT key,
               unnest([h % {BLOOM_BITS},
                       (h // {BLOOM_BITS}) % {BLOOM_BITS},
                       (h // {BLOOM_BITS * BLOOM_BITS}) % {BLOOM_BITS}]) AS pos
        FROM (SELECT key,
                     ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM build)
    ),
    bloom AS (
        SELECT pos // {BLOOM_WORD_BITS} AS word,
               bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD_BITS} AS INT)) AS bits
        FROM bpos GROUP BY 1
    ),
    probe AS (SELECT DISTINCT o_custkey AS key FROM orders),
    ppos AS (
        SELECT key,
               unnest([h % {BLOOM_BITS},
                       (h // {BLOOM_BITS}) % {BLOOM_BITS},
                       (h // {BLOOM_BITS * BLOOM_BITS}) % {BLOOM_BITS}]) AS pos
        FROM (SELECT key,
                     ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM probe)
    ),
    probed AS (
        SELECT p.key,
               MIN(CAST((COALESCE(b.bits, 0) >> CAST(p.pos % {BLOOM_WORD_BITS} AS INT)) & 1 AS INT))
                   AS all_set
        FROM ppos p LEFT JOIN bloom b ON b.word = p.pos // {BLOOM_WORD_BITS}
        GROUP BY p.key
    )
    SELECT (SELECT COUNT(*) FROM build) AS n_build_keys,
           (SELECT COUNT(*) FROM probe) AS n_probe_keys,
           (SELECT COUNT(*) FROM probed WHERE all_set = 1) AS n_bloom_pass,
           (SELECT COUNT(*) FROM probe WHERE key IN (SELECT key FROM build))
               AS n_true_match
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 3  # hash rows
CMS_W = 256  # buckets per row
CMS_TOPK = 20

_CMS_BUCKET_SPARK = (
    "CAST(conv(substr(md5(concat(r, '#', token)), 1, 15), 16, 10) AS BIGINT)"
    f" % {CMS_W}"
)


def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the documents token stream: estimate the
    counts of the CMS_TOPK most frequent tokens and emit them next to the
    exact counts, so the sketch's one-sided error (cms_n >= exact_n,
    inflated only by bucket collisions) is visible in the output.

    Scale shape: the token-count table is one map-side-combinable shuffle;
    the sketch itself compresses it to a CONSTANT CMS_D x CMS_W cells (the
    whole point — at 100 TB the vocabulary is huge but the sketch is 768
    integers, mergeable across partitions/corpora by cell-wise addition).
    Bucket assignment is the repo-standard 60-bit md5 integer (identical
    in DuckDB), the hash rows are a 3-row constant broadcast, and the
    estimate probe touches only CMS_TOPK x CMS_D rows against the tiny
    broadcast sketch.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", r"\s+")).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    rows = spark.range(CMS_D).select(F.col("id").alias("r"))
    sketch = (
        counts.crossJoin(F.broadcast(rows))
        .select("r", F.expr(_CMS_BUCKET_SPARK).alias("b"), "n")
        .groupBy("r", "b")
        .agg(F.sum("n").alias("bn"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(CMS_TOPK)
    return (
        top.crossJoin(F.broadcast(rows))
        .select("token", "n", "r", F.expr(_CMS_BUCKET_SPARK).alias("b"))
        .join(F.broadcast(sketch), ["r", "b"])
        .groupBy("token", "n")
        .agg(F.min("bn").alias("cms_n"))
        .select("token", F.col("n").alias("exact_n"), "cms_n")
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
    )


_CMS_BUCKET_DUCK = "('0x' || substr(md5(r || '#' || token), 1, 15))::BIGINT % {w}"

ORACLE_SQL["sketch_cms_topk"] = f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token FROM documents
    ),
    counts AS (
        SELECT token, COUNT(*) AS n FROM toks WHERE token <> '' GROUP BY token
    ),
    hrows AS (SELECT r FROM range({CMS_D}) t(r)),
    sketch AS (
        SELECT r, {_CMS_BUCKET_DUCK.format(w=CMS_W)} AS b, CAST(SUM(n) AS BIGINT) AS bn
        FROM counts CROSS JOIN hrows
        GROUP BY 1, 2
    ),
    top AS (
        SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT {CMS_TOPK}
    )
    SELECT t.token, t.n AS exact_n, MIN(s.bn) AS cms_n
    FROM top t
    CROSS JOIN hrows h
    JOIN sketch s ON s.r = h.r
        AND s.b = ('0x' || substr(md5(h.r || '#' || t.token), 1, 15))::BIGINT % {CMS_W}
    GROUP BY 1, 2
    ORDER BY exact_n DESC, token ASC
"""


def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch union: merge the per-group register tables of
    :func:`sketch_hll_registers` into ONE global sketch by elementwise
    MAX — while the oracle computes the global sketch directly from the
    raw rows. Equality proves the union law (sketch(A) ∪ sketch(B) =
    sketch(A ∪ B)) that makes HLL composable at 100 TB: per-partition /
    per-day / per-tenant sketches roll up to any coarser grain without
    touching raw data again.

    Scale: input is groups x 64 register rows — the merge aggregates
    sketch-sized data, never corpus-sized data.
    """
    regs = sketch_hll_registers(spark, sf_dir)
    return (
        regs.groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .orderBy("bucket")
    )


ORACLE_SQL["sketch_hll_union"] = f"""
    WITH hashed AS (
        SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM lineitem
    ),
    split AS (SELECT h % {HLL_BUCKETS} AS bucket, h // {HLL_BUCKETS} AS w FROM hashed)
    SELECT bucket,
           MAX(CASE WHEN w = 0 THEN {HLL_MAX_RHO}
                    ELSE bit_count((w & (-w)) - 1) + 1 END) AS register
    FROM split
    GROUP BY 1
    ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Theta-sketch set intersection
# ---------------------------------------------------------------------------

THETA_FLAGS = ("A", "N")


def sketch_theta_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch intersection estimate of |A ∩ B| for two key sets (the
    l_orderkey sets of returnflag 'A' vs 'N'), with the exact intersection
    as the visible yardstick — the sketch family's answer to "how many
    records do these two corpora share?" without materializing either set.

    Mechanics: both sets hash through the same md5-derived 60-bit space as
    the KMV sketches; each keeps its K smallest distinct hashes; theta =
    min of the two k-th minima (HASH_SPACE when a side is exact-mode);
    the estimate is |{h in sampleA ∩ sampleB : h < theta}| / theta *
    HASH_SPACE, computed with exact integral arithmetic (DECIMAL
    multiply + integral div) so both engines agree bit-for-bit.

    Scale notes (100 TB): each side's sample is a bounded top-K selection
    (per-partition partial k-min then a K-sized global merge — the same
    shape as sketch_kmv_distinct); only O(K) hashes ever cross the
    network, and sketches for different corpora merge without touching
    raw data. The exact-intersect companion is the one full-shuffle
    aggregate, present by design as the yardstick.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sets = (
        li.filter(F.col("l_returnflag").isin(*THETA_FLAGS))
        .select("l_returnflag", "l_orderkey")
        .distinct()
    )
    hashed = sets.select(
        "l_returnflag",
        F.expr(
            "CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("h")
    samples = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K)
    theta = samples.filter(F.col("rn") == K).agg(
        F.coalesce(F.min("h"), F.lit(HASH_SPACE)).cast("long").alias("theta")
    )
    a = samples.filter(F.col("l_returnflag") == THETA_FLAGS[0]).select("h")
    b = samples.filter(F.col("l_returnflag") == THETA_FLAGS[1]).select("h")
    common = (
        a.join(b, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    exact = (
        sets.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_flags"))
        .filter(F.col("n_flags") == len(THETA_FLAGS))
        .agg(F.count("*").cast("bigint").alias("exact_intersect"))
    )
    return exact.crossJoin(theta).crossJoin(common).select(
        "exact_intersect",
        "theta",
        "common",
        F.expr(
            f"CAST((CAST(common AS DECIMAL(38,0)) * {HASH_SPACE}) div theta AS BIGINT)"
        ).alias("theta_estimate"),
    )


ORACLE_SQL["sketch_theta_intersect"] = f"""
    WITH sets AS (
        SELECT DISTINCT l_returnflag, l_orderkey
        FROM lineitem
        WHERE l_returnflag IN ('{THETA_FLAGS[0]}', '{THETA_FLAGS[1]}')
    ),
    hashed AS (
        SELECT DISTINCT l_returnflag,
               ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM sets
    ),
    samples AS (
        SELECT l_returnflag, h FROM hashed
        QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY h) <= {K}
    ),
    kth AS (
        SELECT l_returnflag, h FROM hashed
        QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY h) = {K}
    ),
    theta AS (
        SELECT CAST(COALESCE(MIN(h), {HASH_SPACE}) AS BIGINT) AS theta FROM kth
    ),
    common AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS common
        FROM (SELECT a.h FROM samples a JOIN samples b
              ON a.h = b.h
              AND a.l_returnflag = '{THETA_FLAGS[0]}'
              AND b.l_returnflag = '{THETA_FLAGS[1]}') m, theta t
        WHERE m.h < t.theta
    ),
    exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect
        FROM (SELECT l_orderkey FROM sets
              GROUP BY l_orderkey HAVING COUNT(*) = {len(THETA_FLAGS)})
    )
    SELECT e.exact_intersect, t.theta, c.common,
           -- HUGEINT floor division: see sketch_kmv_union
           CAST(CAST(c.common AS HUGEINT) * {HASH_SPACE} // t.theta AS BIGINT)
               AS theta_estimate
    FROM exact e, theta t, common c
"""


# ---------------------------------------------------------------------------
# Weighted bottom-k (priority) sampling
# ---------------------------------------------------------------------------

WS_K = 32  # sample size


def _ws_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, w (= n_chars), skey = h/w with h the repo-standard 60-bit
    md5 integer: ascending skey order == descending priority w/u order.

    Zero-weight docs are filtered out BEFORE the key division: priority
    q = w/u is 0 for w = 0, so such a doc can never be sampled — and the
    explicit filter keeps the cross-engine differential alive on corpora
    that contain one (Spark's non-ANSI x/0 yields NULL while DuckDB
    errors; the fixture's n_chars >= 44 never exercises either)."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("n_chars").cast("long").alias("w"))
        .filter(F.col("w") > 0)
        .withColumn(
            "h",
            F.expr(
                "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            ),
        )
        .withColumn("skey", F.expr("h * 1.0 / w"))
    )


def sketch_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sample (weighted bottom-k, Duffield/Lund/Thorup): WS_K
    documents drawn with probability ~ n_chars — the curation primitive
    for size-weighted corpus subsampling (a 100-token doc should be 100x
    likelier in a token-budgeted sample than a 1-token doc).

    Each doc gets priority q = w/u with u = md5-uniform in (0,1); the top
    WS_K priorities are the sample. Implemented as ascending bottom-k on
    skey = h/w (one exact-rounded IEEE division — monotone inverse of q,
    identical in both engines; md5 replaces the RNG so the "random" draw
    is reproducible anywhere).

    Scale notes (100 TB): ``orderBy(skey).limit(k)`` compiles to
    TakeOrdered — per-partition partial top-k then a k-sized merge on one
    reducer; nothing but k rows ever leaves a partition, and partial
    samples are mergeable (min-merge of bottom-k sets), so this also runs
    as a streaming/mergeable sketch.
    """
    top = _ws_keyed(spark, sf_dir).orderBy("skey", "doc_id").limit(WS_K)
    w = Window.orderBy("skey", "doc_id")  # k rows: single-partition OK
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "w")
        .orderBy("rank")
    )


def sketch_weighted_sample_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance gate: the priority-sampling total-weight estimator
    (sum of max(w_i, tau) over the sample, tau = the (k+1)-th priority)
    next to the exact total — the Horvitz-Thompson-style unbiasedness
    check a pipeline runs before trusting weighted subsamples. Each
    term is floored to an integer before summing so the cross-engine
    hash never depends on float summation order (documented <= k
    absolute error, irrelevant at any realistic total).
    """
    keyed = _ws_keyed(spark, sf_dir)
    topk1 = keyed.orderBy("skey", "doc_id").limit(WS_K + 1)
    w = Window.orderBy("skey", "doc_id")
    ranked = topk1.withColumn("rn", F.row_number().over(w))
    # tau_key: the (k+1)-th smallest skey; NULL when the corpus has <= k
    # docs (then every doc is sampled and the estimate is exact)
    tau = ranked.filter(F.col("rn") == WS_K + 1).agg(
        F.max("skey").alias("tau_key")
    )
    contrib = (
        ranked.filter(F.col("rn") <= WS_K)
        .crossJoin(F.broadcast(tau))
        .select(
            F.expr(
                f"CAST(floor(greatest(CAST(w AS DOUBLE), "
                f"coalesce({HASH_SPACE} * 1.0 / tau_key, 0.0))) AS BIGINT)"
            ).alias("c")
        )
    )
    est = contrib.agg(
        F.sum("c").alias("est_total_weight"),
        F.count("*").cast("bigint").alias("n_sample"),
    )
    exact = keyed.agg(F.sum("w").alias("exact_total_weight"))
    return exact.crossJoin(est).select(
        "exact_total_weight", "est_total_weight", "n_sample"
    )


_WS_KEYED_SQL = """
    keyed AS (
        -- w > 0 mirrors _ws_keyed: zero-weight docs have zero inclusion
        -- probability and must never reach the h/w key division
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM documents
        WHERE n_chars > 0
    ),
    sk AS (SELECT doc_id, w, h * 1.0 / w AS skey FROM keyed),
    ranked AS (
        SELECT doc_id, w, skey,
               ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS rn
        FROM sk
    )
"""

ORACLE_SQL["sketch_weighted_sample"] = f"""
    WITH {_WS_KEYED_SQL}
    SELECT CAST(rn AS INT) AS rank, doc_id, w
    FROM ranked WHERE rn <= {WS_K}
    ORDER BY rank
"""

ORACLE_SQL["sketch_weighted_sample_est"] = f"""
    WITH {_WS_KEYED_SQL},
    tau AS (SELECT MAX(skey) AS tau_key FROM ranked WHERE rn = {WS_K + 1}),
    est AS (
        SELECT CAST(SUM(CAST(floor(greatest(CAST(w AS DOUBLE),
                   coalesce({HASH_SPACE} * 1.0 / t.tau_key, 0.0))) AS BIGINT))
               AS BIGINT) AS est_total_weight,
               CAST(COUNT(*) AS BIGINT) AS n_sample
        FROM ranked, tau t WHERE rn <= {WS_K}
    )
    SELECT (SELECT CAST(SUM(w) AS BIGINT) FROM keyed) AS exact_total_weight,
           e.est_total_weight, e.n_sample
    FROM est e
"""


# ---------------------------------------------------------------------------
# Sample-based quantile sketch (mergeable bottom-k uniform sample)
# ---------------------------------------------------------------------------

QS_K = 256  # sample size
QS_PCTS = (25, 50, 75)


def sketch_quantile_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE uniform sample — the quantile
    member of the sketch family (KMV/HLL/theta/bloom/CMS cover counts and
    membership; this covers order statistics). Every lineitem row gets a
    60-bit md5 hash of its unique (l_orderkey, l_linenumber) key; the
    bottom-QS_K hashes are a uniform sample whose partials merge exactly
    like KMV's (any globally-bottom-k hash is partition-bottom-k, so
    union -> bottom-k of per-partition samples is the global sample — and
    ``orderBy(h).limit(k)`` compiles to exactly that distributed
    TakeOrdered). The p-quantile estimate is the sample's
    ``ceil(p * k)``-th order statistic of l_extendedprice
    (percentile_disc semantics).

    The acceptance yardstick is the estimate's EXACT rank in the full
    data: ``n_lt_est``/``n_le_est`` (strict / inclusive counts below the
    estimate) next to the target rank ``ceil(p * n)`` — the estimate is
    rank-correct iff n_lt_est < target <= n_le_est, and its rank error is
    directly readable against n_total. Counting ranks instead of
    SELECTING the exact quantile value keeps the yardstick fully
    distributed: one conditional aggregate per scan (a 3-row broadcast
    fan-out), versus the global single-partition sort a rank-r value
    selection needs — the 10x smoke measured that sort at 11.6 s where
    this shape stays scan-bound (r8).

    Determinism: md5 replaces the RNG (same sample on any cluster, any
    partitioning, forever); estimates are PICKED values and the yardstick
    is integer counts — no float arithmetic anywhere in the output.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(l_orderkey AS STRING), ':', "
            "CAST(l_linenumber AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    n = li.agg(F.count("*").cast("bigint").alias("n_total"))
    sample = li.orderBy("h", "v").limit(QS_K)
    kn = sample.agg(F.count("*").cast("bigint").alias("n_sample"))
    ws = Window.orderBy("v", "h")  # QS_K rows: single-partition OK
    ranked_sample = sample.withColumn("rs", F.row_number().over(ws))
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in QS_PCTS])).alias("q_pct")
    )
    ests = (
        pcts.crossJoin(F.broadcast(kn))
        .crossJoin(F.broadcast(n))
        .withColumn("rs", F.expr("(q_pct * n_sample + 99) div 100"))
        .join(F.broadcast(ranked_sample.select("rs", F.col("v").alias("est"))), "rs")
        .select(
            "q_pct",
            "est",
            F.expr("(q_pct * n_total + 99) div 100").alias("target_rank"),
            "n_sample",
            "n_total",
        )
        # two consumers (the rank fan-out and the final join): checkpoint
        # the 3-row table so the sample TakeOrdered is not re-run per use
        .localCheckpoint(eager=False)
    )
    ranks = (
        li.crossJoin(F.broadcast(ests.select("q_pct", "est")))
        .groupBy("q_pct")
        .agg(
            F.sum((F.col("v") < F.col("est")).cast("long")).alias("n_lt_est"),
            F.sum((F.col("v") <= F.col("est")).cast("long")).alias("n_le_est"),
        )
    )
    return (
        ests.join(ranks, "q_pct")
        .select(
            "q_pct", "est", "target_rank", "n_lt_est", "n_le_est",
            "n_sample", "n_total",
        )
        .orderBy("q_pct")
    )


ORACLE_SQL["sketch_quantile_sample"] = f"""
    WITH keyed AS (
        SELECT l_extendedprice AS v,
               ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                    CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM keyed),
    sample AS (
        SELECT v, h FROM keyed
        QUALIFY row_number() OVER (ORDER BY h, v) <= {QS_K}
    ),
    kn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sample FROM sample),
    rs AS (SELECT v, row_number() OVER (ORDER BY v, h) AS rs FROM sample),
    pct AS (SELECT unnest([{", ".join(map(str, QS_PCTS))}]) AS q_pct),
    ests AS (
        SELECT p.q_pct, s.v AS est,
               (p.q_pct * n.n_total + 99) // 100 AS target_rank,
               kn.n_sample, n.n_total
        FROM pct p CROSS JOIN kn CROSS JOIN n
        JOIN rs s ON s.rs = (p.q_pct * kn.n_sample + 99) // 100
    ),
    ranks AS (
        SELECT e.q_pct,
               CAST(SUM(CASE WHEN k.v < e.est THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lt_est,
               CAST(SUM(CASE WHEN k.v <= e.est THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_le_est
        FROM keyed k CROSS JOIN (SELECT q_pct, est FROM ests) e
        GROUP BY e.q_pct
    )
    SELECT e.q_pct, e.est, e.target_rank, r.n_lt_est, r.n_le_est,
           e.n_sample, e.n_total
    FROM ests e JOIN ranks r ON e.q_pct = r.q_pct
    ORDER BY e.q_pct
"""


# --- quantile error contract (r8 VERDICT item 6) ---------------------------

# DKW inequality (Dvoretzky–Kiefer–Wolfowitz, with Massart's tight
# constant): for a uniform k-sample, P(sup_x |F_hat(x) - F(x)| > eps)
# <= 2 exp(-2 k eps^2), so with failure probability delta = 1/QS_DELTA_INV
# the sample p-quantile's POPULATION rank sits within eps * n of the
# target rank, eps = sqrt(ln(2 * QS_DELTA_INV) / (2 k)). The bottom-k
# md5 sample is a uniform sample of the key universe (hash order is
# independent of value order), so the bound applies verbatim; the gate
# below asserts the OBSERVED rank error against it. Stored in parts-per-
# million so the acceptance test is pure int64 arithmetic in both engines.
QS_DELTA_INV = 100  # delta = 1%


def _qs_eps_ppm() -> int:
    import math

    return math.ceil(
        math.sqrt(math.log(2 * QS_DELTA_INV) / (2 * QS_K)) * 1_000_000
    )


QS_EPS_PPM = _qs_eps_ppm()


def sketch_quantile_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-contract gate for :func:`sketch_quantile_sample` — the
    quantile twin of the HLL-relative-error and dedup-recall gates: for
    each target percentile, the estimate's observed population rank
    error (0 when n_lt_est < target <= n_le_est, else the distance to
    the nearest end of that bracket — percentile_disc rank-correctness)
    is asserted against the DKW bound eps * n_total IN-BAND via the
    ``within`` column, which tests/test_functions.py pins to 1 for every
    row. All-integer: error and bound compare as
    err * 1e6 <= QS_EPS_PPM * n_total.

    Scale: inherits sketch_quantile_sample's shape exactly (distributed
    rank counts, no global value sort) plus a 3-row projection.
    """
    base = sketch_quantile_sample(spark, sf_dir)
    err = F.expr(
        "CASE WHEN n_le_est < target_rank THEN target_rank - n_le_est "
        "WHEN n_lt_est >= target_rank THEN n_lt_est - target_rank + 1 "
        "ELSE CAST(0 AS BIGINT) END"
    )
    return (
        base.select(
            "q_pct",
            "est",
            "target_rank",
            err.alias("err_rank"),
            F.lit(QS_EPS_PPM).cast("long").alias("eps_ppm"),
            "n_total",
        )
        .withColumn(
            "within",
            (
                F.col("err_rank") * F.lit(1_000_000)
                <= F.col("eps_ppm") * F.col("n_total")
            ).cast("int"),
        )
        .orderBy("q_pct")
    )


def _quantile_err_oracle() -> str:
    from ..oracle_utils import strip_order_by

    return f"""
    SELECT q_pct, est, target_rank, err_rank, eps_ppm, n_total,
           CAST(CASE WHEN err_rank * 1000000 <= eps_ppm * n_total
                THEN 1 ELSE 0 END AS INT) AS within
    FROM (
        SELECT q_pct, est, target_rank,
               CASE WHEN n_le_est < target_rank
                        THEN target_rank - n_le_est
                    WHEN n_lt_est >= target_rank
                        THEN n_lt_est - target_rank + 1
                    ELSE CAST(0 AS BIGINT) END AS err_rank,
               CAST({QS_EPS_PPM} AS BIGINT) AS eps_ppm,
               n_total
        FROM ({strip_order_by(ORACLE_SQL["sketch_quantile_sample"])})
    )
    ORDER BY q_pct
"""


ORACLE_SQL["sketch_quantile_err"] = _quantile_err_oracle()


# ---------------------------------------------------------------------------
# Bottom-k (KMV) Jaccard between source vocabularies
# ---------------------------------------------------------------------------

VJ_K = 32  # bottom-k signature size per source


def sketch_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary similarity across document sources: for every
    source pair, the EXACT token-set intersection/union sizes next to the
    bottom-k (KMV) Jaccard estimator's agreement count — the "how
    lexically similar are these two crawls" question answered from
    constant per-source state.

    Estimator: keep each source's ``VJ_K`` smallest 60-bit token hashes.
    The k smallest hashes of A ∪ B are a subset of bottomk(A) ∪
    bottomk(B), and any of them that belongs to A necessarily sits in
    bottomk(A) (fewer than k union hashes are smaller, so in particular
    fewer than k of A's) — so membership tests against the two
    signatures are EXACT, and ``y = |bottomk(A∪B) ∩ A ∩ B|`` comes out
    as an integer with no rescan of the corpus. Jaccard ≈ y / k_eff is
    left as the two integers (y, k_eff); no float ever materializes.

    Scale: the full (source, token) distinct projection feeds BOTH the
    exact side (one token-keyed self-join — the yardstick; at a million
    sources you would drop it and keep only the signatures) and the
    per-source signature build (one window shuffle); the pair stage then
    touches only |sources| x VJ_K signature rows — constant per source,
    the whole point of KMV.
    """
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source", F.explode(F.split("text", r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return kmv_pair_estimates(st).orderBy("sa", "sb")


def kmv_pair_estimates(st: DataFrame, k: int = VJ_K) -> DataFrame:
    """Kernel: DISTINCT (source, token) set-membership table -> per
    source pair (sa < sb) the exact intersection/union sizes and the
    bottom-k estimator's integer agreement count. Pure DataFrame-in/out
    so the property suite can drive it with arbitrary set families."""
    sizes = st.groupBy("source").agg(F.count("*").alias("vocab"))
    pairs = (
        sizes.select(F.col("source").alias("sa"), F.col("vocab").alias("va"))
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("sb"), F.col("vocab").alias("vb")
                )
            )
        )
        .filter(F.col("sa") < F.col("sb"))
    )
    a = st.select(F.col("source").alias("sa"), "token")
    b = st.select(F.col("source").alias("sb"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("exact_inter"))
    )
    h = F.expr(
        "CAST(conv(substr(md5(token), 1, 15), 16, 10) AS BIGINT)"
    ).alias("h")
    sw = Window.partitionBy("source").orderBy("h", "token")
    bk = (
        st.select("source", "token", h)
        .withColumn("rk", F.row_number().over(sw))
        .filter(F.col("rk") <= k)
        .select("source", "token", "h")
    )
    cand = (
        pairs.select("sa", "sb")
        .join(F.broadcast(bk), F.col("source") == F.col("sa"))
        .select("sa", "sb", "token", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionAll(
            pairs.select("sa", "sb")
            .join(F.broadcast(bk), F.col("source") == F.col("sb"))
            .select("sa", "sb", "token", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("sa", "sb", "token", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    pw = Window.partitionBy("sa", "sb").orderBy("h", "token")
    topk = cand.withColumn("rk", F.row_number().over(pw)).filter(
        F.col("rk") <= k
    )
    est = topk.groupBy("sa", "sb").agg(
        F.count("*").alias("k_eff"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("kmv_inter"),
    )
    return (
        pairs.join(inter, ["sa", "sb"], "left")
        .join(est, ["sa", "sb"])
        .select(
            "sa",
            "sb",
            F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
            (F.col("va") + F.col("vb") - F.coalesce("exact_inter", F.lit(0))).alias(
                "exact_union"
            ),
            "k_eff",
            "kmv_inter",
        )
    )


ORACLE_SQL["sketch_vocab_jaccard"] = f"""
    WITH st AS (
        SELECT DISTINCT source,
               unnest(regexp_split_to_array(text, '\\s+')) AS token
        FROM documents
    ),
    st2 AS (SELECT source, token FROM st WHERE token <> ''),
    sizes AS (SELECT source, COUNT(*) AS vocab FROM st2 GROUP BY 1),
    pairs AS (
        SELECT a.source AS sa, a.vocab AS va, b.source AS sb, b.vocab AS vb
        FROM sizes a JOIN sizes b ON a.source < b.source
    ),
    inter AS (
        SELECT a.source AS sa, b.source AS sb, COUNT(*) AS exact_inter
        FROM st2 a JOIN st2 b ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    ),
    bk AS (
        SELECT source, token, h FROM (
            SELECT source, token,
                   ('0x' || substr(md5(token), 1, 15))::BIGINT AS h,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5(token), 1, 15))::BIGINT,
                                token
                   ) AS rk
            FROM st2
        ) WHERE rk <= {VJ_K}
    ),
    cand AS (
        SELECT sa, sb, token, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
        FROM (
            SELECT p.sa, p.sb, k.token, k.h, 1 AS in_a, 0 AS in_b
            FROM pairs p JOIN bk k ON k.source = p.sa
            UNION ALL
            SELECT p.sa, p.sb, k.token, k.h, 0, 1
            FROM pairs p JOIN bk k ON k.source = p.sb
        )
        GROUP BY 1, 2, 3, 4
    ),
    topk AS (
        SELECT sa, sb, in_a, in_b FROM (
            SELECT sa, sb, in_a, in_b,
                   ROW_NUMBER() OVER (PARTITION BY sa, sb
                                      ORDER BY h, token) AS rk
            FROM cand
        ) WHERE rk <= {VJ_K}
    ),
    est AS (
        SELECT sa, sb, COUNT(*) AS k_eff,
               SUM(in_a * in_b) AS kmv_inter
        FROM topk GROUP BY 1, 2
    )
    SELECT p.sa, p.sb,
           CAST(COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_inter,
           CAST(p.va + p.vb - COALESCE(i.exact_inter, 0) AS BIGINT)
               AS exact_union,
           CAST(e.k_eff AS BIGINT) AS k_eff,
           CAST(e.kmv_inter AS BIGINT) AS kmv_inter
    FROM pairs p
    LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
    JOIN est e ON e.sa = p.sa AND e.sb = p.sb
    ORDER BY p.sa, p.sb
"""
