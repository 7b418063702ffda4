"""Streaming curation monitoring: the quality filter-cascade funnel
maintained live over a document stream.

[EXTENDED] north-star surface — the reference is strictly batch.

The law this module proves: the funnel's survivor counters are plain
integer SUMs of row-local gate flags — additive and commutative — so the
report maintained INCREMENTALLY in streaming state (micro-batch by
micro-batch) equals the one-pass batch report exactly, no matter how the
stream was batched. This is the additive-merge family of
``stream_cms_topk``, applied to the operational report a data lead
actually watches during an ingestion run: which gate is eating the
incoming corpus, updated every trigger.

Scale: every gate flag is computed row-locally inside the stream (no
shuffle before the state store — the top-bigram count is a per-row
higher-order expression, see ``curate.funnel_flags_row_local``); the
streaming state is ONE row of five counters regardless of stream volume,
and each micro-batch ships at most one partial-aggregate row.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.curate import funnel_flags_row_local, funnel_stage_stack, funnel_survivor_agg
from .views_stream import _stream_conf


def stream_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality funnel (:func:`..operators.curate.
    curate_quality_funnel`) as a live streaming monitor: documents
    arrive as a bounded file-stream replay (availableNow), every row's
    cumulative gate flags are evaluated map-side, and the five survivor
    counters are the streaming aggregate (complete mode — a single
    state-store row). The 5-row stage report is stacked batch-side from
    the materialized counters, exactly like the batch op.

    The oracle is the batch funnel's SQL verbatim: integer-sum state is
    additive, so stream-of-batches ≡ one batch, and hash equality
    proves the monitor can never drift from the offline report.
    """
    from ..schemas import DOCUMENTS

    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    return quality_funnel_stream(spark, stream)


def quality_funnel_stream(spark: SparkSession, docs_stream: DataFrame) -> DataFrame:
    """The funnel-monitor kernel over any documents stream — injectable
    so tests can feed a genuinely multi-file replay (the fixture's
    single-file layout yields one micro-batch; tests/test_r10_late_ops.py
    splits a corpus into three flat files and pins streamed == batch)."""
    sink = f"stream_funnel_{uuid.uuid4().hex[:8]}"
    with _stream_conf(spark):
        agg = funnel_survivor_agg(funnel_flags_row_local(docs_stream))
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return funnel_stage_stack(spark.table(sink))


def _stream_funnel_oracle() -> str:
    from ..operators.curate import ORACLE_SQL as _C

    # streamed counters == batch counters, exactly (additive integer sums)
    return _C["curate_quality_funnel"]


ORACLE_SQL = {"stream_quality_funnel": _stream_funnel_oracle()}


def stream_dsir_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR importance estimator maintained LIVE — the streaming
    twin of :func:`..operators.curate.dsir_bucket_counts`: the hashed
    word-bigram bucket counts (raw mass and target-language mass per
    bucket) that :func:`..operators.curate.curate_dsir_sample`'s weights
    are built from, kept current over an arriving document stream. This
    is how a production DSIR deployment actually runs: the target/raw
    distribution estimates update continuously with ingestion, and the
    resampling weights for any batch are computed against the CURRENT
    counts — re-estimating the distributions from scratch per batch
    would re-read the whole standing corpus.

    The law: both counters are plain integer SUMs of row-local events
    (each bigram contributes 1 to its bucket's raw count and, when the
    document is target-language, 1 to its target count), so the
    streamed state — DSIR_BUCKETS rows of two counters, complete mode —
    is additive and batch-split-invariant, and the oracle is the batch
    bucket-count SQL verbatim (the ``stream_quality_funnel`` /
    ``stream_cms_topk`` additive-merge family, applied to the importance
    estimator). Feature extraction (tokenize, bigram, md5 bucket) is
    stateless and runs map-side inside the stream; the state store
    holds 64 rows regardless of stream volume.
    """
    from ..schemas import DOCUMENTS

    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    return dsir_counts_stream(spark, stream)


def dsir_counts_stream(spark: SparkSession, docs_stream: DataFrame) -> DataFrame:
    """Kernel over any documents stream (injectable for the multi-file
    replay test, which pins streamed == batch on a 3-way split)."""
    from ..operators.curate import _dsir_gb, dsir_bucket_counts

    sink = f"stream_dsir_{uuid.uuid4().hex[:8]}"
    with _stream_conf(spark):
        agg = dsir_bucket_counts(_dsir_gb(docs_stream))
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select("b", "r", "tc").orderBy("b")


def _stream_dsir_oracle() -> str:
    """The batch bucket-count SQL, spliced from the dsir-sample oracle's
    own feature CTEs (fail-loud anchor) so stream and sampler hash the
    same buckets forever."""
    from ..operators.curate import CURATE_LANG, ORACLE_SQL as _C

    sample_sql = _C["curate_dsir_sample"]
    anchor = "    rawb AS"
    if sample_sql.count(anchor) != 1:  # explicit: survives `python -O`
        raise RuntimeError("dsir-sample oracle rawb anchor drifted")
    ctes = sample_sql.split("WITH", 1)[1].split(anchor, 1)[0].rstrip().rstrip(",")
    return f"""
    WITH {ctes}
    SELECT b, CAST(COUNT(*) AS BIGINT) AS r,
           CAST(SUM(CASE WHEN lang = '{CURATE_LANG}' THEN 1 ELSE 0 END)
               AS BIGINT) AS tc
    FROM gb GROUP BY b ORDER BY b
"""


ORACLE_SQL["stream_dsir_counts"] = _stream_dsir_oracle()
