"""Watermarked stream-stream interval join (click -> purchase attribution).

[EXTENDED] surface — the reference is strictly batch (SURVEY.md §2.12
"Streaming: none"). This is the canonical event-attribution shape: two
event streams joined on a key plus an event-time interval (purchase within
30 minutes after a click by the same user).

Execution model: a stream-stream inner join keeps BOTH sides in the state
store; the time-range condition plus a watermark on each side lets Spark
derive state-eviction bounds (clicks older than watermark + 30 min can
never match a future purchase and are dropped, and vice versa). Inner-join
matches are emitted as soon as both rows arrive — append mode emits the
complete result on a bounded replay, which is what the oracle checks.

Scale: state is O(events inside the watermark horizon) per side, hash-
partitioned by user_id across state stores — the standard production
pattern. The 30-minute band and 1-hour lateness bound keep per-key state
small; no global structure, no driver materialization.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .views_stream import _stream_conf, _stream_events

ATTRIBUTION_WINDOW_SEC = 30 * 60
JOIN_WATERMARK = "1 hour"


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each (click, purchase) pair for the same user with the purchase at
    most 30 minutes after the click; lag reported in exact microseconds
    (integer — hash-stable cross-engine, per the repo output-type rules)."""
    clicks = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", JOIN_WATERMARK)
    )
    purchases = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", JOIN_WATERMARK)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""
            user_id = p_user_id
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL {ATTRIBUTION_WINDOW_SEC} SECONDS
            """
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
    sink = f"stream_attrib_{uuid.uuid4().hex[:8]}"
    with _stream_conf(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).orderBy("click_id", "purchase_id")


ORACLE_SQL = {
    "stream_stream_join": f"""
        SELECT a.event_id AS click_id,
               b.event_id AS purchase_id,
               a.user_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click'
         AND b.event_type = 'purchase'
         AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL {ATTRIBUTION_WINDOW_SEC} SECONDS
        ORDER BY click_id, purchase_id
    """,
}
