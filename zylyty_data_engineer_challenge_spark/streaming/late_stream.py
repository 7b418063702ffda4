"""Watermark semantics canary: late-arrival policy pinned end-to-end.

[EXTENDED] north-star surface — the reference is strictly batch.

Every other streaming query here replays the bounded fixture in one batch
(or complete mode), so multi-batch watermark behavior — the thing that
actually governs state and emission at 100 TB — never gets exercised.
This module constructs a two-batch replay (file order forced by mtime +
``maxFilesPerTrigger=1``) in which the chronologically EARLIER half of
the events arrives AFTER the watermark derived from the later half, and
pins the engine's observed policy:

* append mode emits every closed window EXACTLY ONCE, in the batch where
  the watermark passes its end — never twice, never partially;
* arrivals behind the watermark whose windows are still unemitted are
  MERGED and emitted once with complete counts (this build does not
  apply an input-side late filter in availableNow replay — measured:
  ``numRowsDroppedByWatermark == 0`` with correct totals);
* windows not closed by the final watermark are WITHHELD.

The DuckDB oracle predicts the full output from the raw table (hourly
counts over all events, restricted to windows whose end <= max(ts) -
delay, in exact integer microseconds). The point of the pin: if a Spark
upgrade ever changes the late-arrival policy (e.g. starts dropping
late input rows), the early-half windows vanish from the output and the
hash gate breaks loudly — a semantics change surfaces as a red
correctness row instead of silently altering production aggregates.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .views_stream import _stream_conf

LATE_DELAY = "10 minutes"
LATE_DELAY_US = 600_000_000
HOUR_US = 3_600_000_000


def _late_input_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stable two-file stream-input dir keyed by source identity (same
    contract and identity resolver as views_stream._stream_sink_dirs):
    re-runs against unchanged data reuse the layout; a regenerated fixture
    — local or remote — gets a fresh one."""
    import hashlib
    import tempfile

    from .views_stream import _source_identity

    root = spark.conf.get("spark.zylyty.streamLateDir", None)
    if not root:
        root = os.environ.get("SPARK_GRAFT_STREAM_SINK_DIR") or os.path.join(
            tempfile.gettempdir(), "zylyty_stream_late"
        )
    ident = _source_identity(spark, f"{sf_dir}/events.parquet")
    key = hashlib.sha1(ident.encode()).hexdigest()[:16]
    return f"{root}/{key}"


def _write_single_file(df: DataFrame, tmp_dir: str, dest: str) -> None:
    """Write df as one parquet file at dest (via a coalesce(1) temp write —
    the two halves are fixture-sized; production would keep multi-file
    batches and set mtimes per batch instead)."""
    df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    part = next(
        p for p in os.listdir(tmp_dir) if p.endswith(".parquet") and p.startswith("part-")
    )
    shutil.copyfile(os.path.join(tmp_dir, part), dest)
    shutil.rmtree(tmp_dir)


def stream_watermark_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts from the two-batch out-of-order replay (see the
    module docstring). The epoch-micros midpoint splits the halves — an
    exact integer both engines derive identically, with no driver
    collect."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    bounds = ev.agg(
        F.expr("(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) div 2").alias("cut_us")
    )
    with_cut = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "us", F.expr("unix_micros(ts)")
    )
    base = _late_input_dir(spark, sf_dir)
    in_dir = os.path.join(base, "input")
    marker = os.path.join(base, "_ready")
    if not os.path.exists(marker):
        os.makedirs(in_dir, exist_ok=True)
        _write_single_file(
            with_cut.filter(F.col("us") >= F.col("cut_us")).select("event_id", "ts"),
            os.path.join(base, "_tmp1"),
            os.path.join(in_dir, "batch1.parquet"),
        )
        _write_single_file(
            with_cut.filter(F.col("us") < F.col("cut_us")).select("event_id", "ts"),
            os.path.join(base, "_tmp2"),
            os.path.join(in_dir, "batch2.parquet"),
        )
        # FileStreamSource schedules files by modification time: the
        # chronologically LATER half must form batch 1
        now = 1_700_000_000
        os.utime(os.path.join(in_dir, "batch1.parquet"), (now, now))
        os.utime(os.path.join(in_dir, "batch2.parquet"), (now + 100, now + 100))
        open(marker, "w").close()
    sink = f"stream_canary_{uuid.uuid4().hex[:8]}"
    with _stream_conf(spark):
        q = (
            spark.readStream.schema("event_id BIGINT, ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .withWatermark("ts", LATE_DELAY)
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("event_id").alias("n_events"))
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "n_events",
            )
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _assert_two_batch_replay(q)
    return spark.table(sink).orderBy("window_start")


def _assert_two_batch_replay(q) -> None:
    """Fail loudly if the replay degenerated to in-order / single-batch.

    The canary's expected output is identical to what an in-order or
    single-batch replay would produce, so the mtime-ordering +
    maxFilesPerTrigger=1 scheduling trick is itself an invariant to pin:
    exactly two micro-batches must consume input, and the append output
    must be split across them with the first (later-half) batch emitting
    NOTHING (its watermark is still the epoch when it runs). If Spark
    ever stops honoring either knob, this raises instead of leaving a
    green gate that no longer exercises late arrivals at all.
    """
    import json

    progress = [
        p if isinstance(p, dict) else json.loads(p.json)
        for p in q.recentProgress
    ]
    data_batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    if len(data_batches) != 2:
        raise RuntimeError(
            "watermark canary replay degenerated: expected exactly 2 "
            f"input micro-batches, saw {len(data_batches)} "
            f"(of {len(progress)} progress events)"
        )
    first_out = data_batches[0].get("sink", {}).get("numOutputRows", 0)
    if first_out > 0:
        raise RuntimeError(
            "watermark canary replay degenerated: batch 1 emitted "
            f"{first_out} rows but must emit nothing (watermark not yet "
            "advanced) — the out-of-order schedule is no longer in effect"
        )
    after_first = progress.index(data_batches[0]) + 1
    later_counts = [
        p.get("sink", {}).get("numOutputRows", 0)
        for p in progress[after_first:]
    ]
    if any(c < 0 for c in later_counts):
        # ANY -1 (metric unavailable) among the later batches means the
        # sum is untrustworthy — the emitting batch may be the one
        # reporting -1 while interleaved empty batches report 0, which
        # would sum to 0 and raise a FALSE degeneration failure. Skip the
        # assertion; the oracle hash still checks the actual output rows.
        return
    later_out = sum(later_counts)
    if later_out <= 0:
        raise RuntimeError(
            "watermark canary replay degenerated: no append output after "
            "batch 1 — late-arrival emission never happened"
        )


ORACLE_SQL = {
    "stream_watermark_canary": f"""
        WITH hashed AS (SELECT epoch_us(ts) AS us FROM events),
        wm AS (SELECT MAX(us) - {LATE_DELAY_US} AS wm_us FROM hashed),
        agg AS (
            SELECT us // {HOUR_US} AS bucket, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM hashed GROUP BY 1
        )
        SELECT strftime(to_timestamp((bucket * {HOUR_US}) // 1000000),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               n_events
        FROM agg, wm
        WHERE (bucket + 1) * {HOUR_US} <= wm.wm_us
        ORDER BY window_start
    """,
}
