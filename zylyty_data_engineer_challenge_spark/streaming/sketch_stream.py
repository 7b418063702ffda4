"""Streaming sketch build: HLL registers maintained incrementally over the
event stream.

[EXTENDED] north-star surface — the reference is strictly batch.

The law this module proves end-to-end: a mergeable sketch built
INCREMENTALLY (micro-batch by micro-batch, MAX-merged in streaming state)
equals the sketch built in one batch pass — `stream_hll_registers`'s final
register table is hash-compared against the identical DuckDB batch
computation. This is why production streams count distinct with sketches:
the per-bucket MAX is idempotent and commutative, so replays, duplicate
events, and out-of-order delivery cannot corrupt the answer (no watermark
is even needed — the state is 64 monotone integers, not windows).

Scale: streaming state = HLL_BUCKETS rows total, regardless of stream
volume; each micro-batch ships at most 64 partial registers thanks to
partial aggregation. Reading the registers gives the distinct estimate via
the standard alpha_m * m^2 / sum 2^-rho formula (checked in the batch
module's unit test — derived constant, not extra state).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import HLL_BUCKETS, HLL_MAX_RHO
from .views_stream import _stream_conf, _stream_events


def stream_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register table of distinct event_id, built by a real streaming
    query (availableNow replay, complete mode) — MAX-per-bucket is a
    supported streaming aggregate, so the sketch state lives in the state
    store and the final table equals the batch sketch bit-for-bit. Uses
    the repo-standard 60-bit md5 hash and the integer-exact trailing-zero
    rho (see :func:`..operators.sketches.sketch_hll_registers`)."""
    sink = f"stream_hll_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream_events(spark, sf_dir)
        .select(
            F.expr(
                "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h")
        )
        .select(
            F.expr(f"h % {HLL_BUCKETS}").alias("bucket"),
            F.expr(f"h div {HLL_BUCKETS}").alias("w"),
        )
        .select(
            "bucket",
            F.expr(
                f"CASE WHEN w = 0 THEN {HLL_MAX_RHO} "
                "ELSE bit_count((w & -w) - 1) + 1 END"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )
    with _stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).orderBy("bucket")


ORACLE_SQL = {
    # the BATCH computation of the identical sketch: if the incremental
    # state-store build diverges anywhere, the hash gate breaks
    "stream_hll_registers": f"""
        WITH hashed AS (
            SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM events
        ),
        split AS (
            SELECT h % {HLL_BUCKETS} AS bucket, h // {HLL_BUCKETS} AS w FROM hashed
        )
        SELECT bucket,
               MAX(CASE WHEN w = 0 THEN {HLL_MAX_RHO}
                        ELSE bit_count((w & (-w)) - 1) + 1 END) AS register
        FROM split
        GROUP BY bucket
        ORDER BY bucket
    """,
}


def stream_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch maintained incrementally over the event stream —
    the SUM-merge counterpart of :func:`stream_hll_registers`'s MAX law:
    counter sketches are additive, so cell-wise summation in streaming
    state (micro-batch by micro-batch) equals the one-pass batch sketch
    exactly. Each event explodes into its CMS_D (row, bucket) cells
    inside the stream (a constant 3-way fan-out, JVM-side), the complete
    mode aggregate keeps at most CMS_D x CMS_W counter rows in the state
    store regardless of stream volume, and the final probe — exact top-k
    user_ids against the min over the sketch's rows — runs batch-side on
    the materialized counters.

    The oracle computes the identical sketch + probe from the batch
    table, so hash equality proves stream-of-batches ≡ one batch for the
    additive sketch family too (HLL covered the idempotent-max family).
    """
    from ..catalog import load_table
    from ..operators.sketches import CMS_D, CMS_TOPK, CMS_W

    sink = f"stream_cms_{uuid.uuid4().hex[:8]}"
    cells = (
        _stream_events(spark, sf_dir)
        .select(F.col("user_id").cast("string").alias("token"))
        .select(
            "token",
            F.explode(
                F.sequence(F.lit(0), F.lit(CMS_D - 1)).cast("array<bigint>")
            ).alias("r"),
        )
        .select(
            "r",
            F.expr(
                "CAST(conv(substr(md5(concat(r, '#', token)), 1, 15), 16, 10)"
                f" AS BIGINT) % {CMS_W}"
            ).alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.count("*").alias("bn"))
    )
    with _stream_conf(spark):
        q = (
            cells.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    sketch = spark.table(sink)
    counts = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("string").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(CMS_TOPK)
    rows = spark.range(CMS_D).select(F.col("id").alias("r"))
    return (
        top.crossJoin(F.broadcast(rows))
        .select(
            "token",
            "n",
            "r",
            F.expr(
                "CAST(conv(substr(md5(concat(r, '#', token)), 1, 15), 16, 10)"
                f" AS BIGINT) % {CMS_W}"
            ).alias("b"),
        )
        .join(F.broadcast(sketch), ["r", "b"])
        .groupBy("token", "n")
        .agg(F.min("bn").alias("cms_n"))
        .select(
            F.col("token").alias("user_id"),
            F.col("n").alias("exact_n"),
            "cms_n",
        )
        .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
    )


def _cms_stream_oracle() -> str:
    from ..operators.sketches import CMS_D, CMS_TOPK, CMS_W

    bucket = "('0x' || substr(md5(r || '#' || token), 1, 15))::BIGINT % {w}"
    return f"""
    WITH toks AS (SELECT CAST(user_id AS VARCHAR) AS token FROM events),
    counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    hrows AS (SELECT r FROM range({CMS_D}) t(r)),
    sketch AS (
        SELECT r, {bucket.format(w=CMS_W)} AS b,
               CAST(SUM(n) AS BIGINT) AS bn
        FROM counts CROSS JOIN hrows
        GROUP BY 1, 2
    ),
    top AS (
        SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT {CMS_TOPK}
    )
    SELECT t.token AS user_id, t.n AS exact_n, MIN(s.bn) AS cms_n
    FROM top t
    CROSS JOIN hrows h
    JOIN sketch s ON s.r = h.r
        AND s.b = ('0x' || substr(md5(h.r || '#' || t.token), 1, 15))::BIGINT
                      % {CMS_W}
    GROUP BY 1, 2
    ORDER BY exact_n DESC, user_id ASC
    """


ORACLE_SQL["stream_cms_topk"] = _cms_stream_oracle()
