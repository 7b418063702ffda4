"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched Python (mapInPandas).

[EXTENDED] north-star surface (SURVEY.md §2.12) — absent from the reference.

The pattern this module demonstrates is the real thing even though the
payloads are synthetic: media arrives as an opaque ``binary`` column with a
typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched Python over ``mapInPandas`` (the only sanctioned Python hot
path — one Arrow batch per invocation, never per-row). The actual
image/audio codecs are NOT in this container, so :func:`decode_media` is a
clearly-marked stub (raises ``NotImplementedError``) and the pipeline uses
:func:`fake_decode_features` — a deterministic stand-in with the same
signature, schema, and batch shape a real decoder would have.

Scale: mapInPandas streams Arrow batches executor-side — no driver
materialization, no shuffle; partition count = upstream scan. Feature
extraction is the narrow stage; anything aggregating features afterwards
shuffles on its own keys.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

FRAME_BYTES = 256  # synthetic "frame" granularity for frame-sampling

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the multimodal table: documents' text UTF-8-encoded as the
    opaque payload, plus a typed metadata struct. In production this is a
    parquet/lance scan of real media bytes — the schema is the contract."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str):
    """Real decoder entry point — image/audio/video libs are not available
    in this environment. The Spark-side plumbing around it is real and
    tested with :func:`fake_decode_features`."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/torchaudio) are not installed in this "
        "container; wire the real decoder here"
    )


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder with a real decoder's shape: consumes
    Arrow batches of (doc_id, payload, meta), emits one feature row per
    input row. Pure function of the payload bytes."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "content_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "n_frames": payloads.map(lambda b: len(b) // FRAME_BYTES + 1).astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
            }
        )


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the multimodal table via mapInPandas.

    The oracle recomputes the same features relationally (octet_length /
    md5 / integer division), proving the Python batch path agrees with the
    declarative definition bit-for-bit.
    """
    media = media_table(spark, sf_dir)
    return (
        media.mapInPandas(fake_decode_features, schema=FEATURES_SCHEMA)
        .orderBy("doc_id")
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode each payload into FRAME_BYTES-sized frame
    descriptors (offset + length + frame hash), keeping every 4th frame —
    the Spark-side shape of video frame-subsampling. Pure JVM built-ins."""
    media = media_table(spark, sf_dir)
    return (
        media.select(
            "doc_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST(meta.n_bytes / {FRAME_BYTES} AS INT)),"
                    f" i -> i)"
                )
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % 4 == 0)
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * FRAME_BYTES).alias("offset"),
            F.least(F.lit(FRAME_BYTES), F.col("n_bytes") - F.col("frame_idx") * FRAME_BYTES).alias(
                "frame_len"
            ),
        )
        .orderBy("doc_id", "frame_idx")
    )


ORACLE_SQL = {
    "mm_features": f"""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_md5,
               octet_length(encode(text)) // {FRAME_BYTES} + 1 AS n_frames,
               CAST(CASE WHEN octet_length(encode(text)) > 0
                    THEN ascii(substr(text, 1, 1))  -- corpus is ASCII: first byte == first codepoint
                    ELSE -1 END AS INT) AS first_byte
        FROM documents ORDER BY doc_id
    """,
    "mm_frame_sample": f"""
        WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
        frames AS (
            SELECT doc_id, n_bytes,
                   unnest(generate_series(0, n_bytes // {FRAME_BYTES})) AS frame_idx
            FROM m
        )
        SELECT doc_id, frame_idx,
               frame_idx * {FRAME_BYTES} AS offset,
               least({FRAME_BYTES}, n_bytes - frame_idx * {FRAME_BYTES}) AS frame_len
        FROM frames
        WHERE frame_idx % 4 = 0
        ORDER BY doc_id, frame_idx
    """,
}
