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


RESIZE_TARGET = 64  # bytes per "thumbnail" (stand-in for pixel dims)


def mm_arrow_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload "resize" via ``mapInArrow`` — the zero-copy Arrow-native
    batch API (no pandas materialization between the JVM and Python; each
    batch arrives as a ``pyarrow.RecordBatch``). The stand-in transform
    subsamples every k-th byte of the payload down to <= RESIZE_TARGET
    bytes and reports old/new sizes plus the resized content hash — the
    exact plumbing shape of an image-thumbnail stage, where the per-batch
    columnar layout is what lets a real codec vectorize.

    Scale: map-only (no shuffle); Arrow batches stream through the Python
    worker at arrow.maxRecordsPerBatch granularity, so peak memory is one
    batch of payloads regardless of partition size. The oracle recomputes
    the same subsample relationally (stride indexing into the byte array).
    """
    import pyarrow as pa

    def resize_batches(batches):
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out_rows = {
                "doc_id": [],
                "n_bytes_in": [],
                "n_bytes_out": [],
                "resized_md5": [],
            }
            for did, pl in zip(doc_ids, payloads):
                b = bytes(pl)
                stride = max(1, -(-len(b) // RESIZE_TARGET))  # ceil div
                resized = b[::stride]
                out_rows["doc_id"].append(did)
                out_rows["n_bytes_in"].append(len(b))
                out_rows["n_bytes_out"].append(len(resized))
                out_rows["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pa.RecordBatch.from_pydict(out_rows)

    media = media_table(spark, sf_dir).select("doc_id", "payload")
    return media.mapInArrow(
        resize_batches,
        schema="doc_id bigint, n_bytes_in bigint, n_bytes_out bigint, resized_md5 string",
    ).orderBy("doc_id")


ORACLE_SQL["mm_arrow_resize"] = f"""
    -- DuckDB cannot slice BLOBs; the corpus text is pure ASCII (verified:
    -- octet_length(encode(text)) == length(text) at every SF), so char
    -- indexing into the VARCHAR equals byte indexing into the payload
    WITH m AS (
        SELECT doc_id, text, length(text) AS n_in FROM documents
    ),
    sized AS (
        SELECT doc_id, text, n_in,
               GREATEST(1, CAST(ceil(n_in / {RESIZE_TARGET}.0) AS BIGINT)) AS stride
        FROM m
    )
    SELECT doc_id,
           n_in AS n_bytes_in,
           CAST(ceil(n_in / CAST(stride AS DOUBLE)) AS BIGINT) AS n_bytes_out,
           md5(list_aggregate(
               [text[i + 1 : i + 1] FOR i IN range(0, n_in, stride)],
               'string_agg', '')) AS resized_md5
    FROM sized
    ORDER BY doc_id
"""
