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
