"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched Python (mapInPandas).

[EXTENDED] north-star surface (SURVEY.md §2.12) — absent from the reference.

The pattern this module demonstrates is the real thing even though the
payloads are synthetic: media arrives as an opaque ``binary`` column with a
typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched Python over ``mapInPandas`` (the only sanctioned Python hot
path — one Arrow batch per invocation, never per-row). :func:`decode_media`
is a real pure-stdlib decoder for the public container formats whose
headers are parseable without codec libraries — PNG (IHDR), BMP
(BITMAPINFOHEADER), GIF (logical screen descriptor) — sniffed by magic
bytes, plus a text/plain path; heavy pixel codecs (JPEG DCT, video) would
slot into the same dispatch with PIL/ffmpeg on a real cluster image.
:func:`mm_decode_image` round-trips genuine binary payloads (built
byte-for-byte to each format's spec, PNG with real CRC32/zlib IDAT)
through that decoder, so the differential gate checks actual
binary-format parsing, not a stand-in.

Scale: mapInPandas streams Arrow batches executor-side — no driver
materialization, no shuffle; partition count = upstream scan. Feature
extraction is the narrow stage; anything aggregating features afterwards
shuffles on its own keys.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


#: PNG color type -> sample channels (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_media(payload: bytes, mime: str) -> dict:
    """Decode a media payload's container header — pure stdlib, no codec
    libraries. Format is sniffed from magic bytes (the mime is only a
    fallback discriminator for text), exactly how a production ingest
    distrusts upstream content-type labels.

    Returns ``{"fmt", "width", "height", "bpp", "n_bytes"}``; dims/bpp are
    None for text. Raises on unrecognized payloads — silent passthrough of
    corrupt media is how bad bytes reach a training run.
    """
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if b[12:16] != b"IHDR":
            raise ValueError("PNG: first chunk is not IHDR")
        w, h = struct.unpack(">II", b[16:24])
        bit_depth, color_type = b[24], b[25]
        return {
            "fmt": "png",
            "width": w,
            "height": h,
            "bpp": bit_depth * _PNG_CHANNELS[color_type],
            "n_bytes": len(b),
        }
    if b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        return {"fmt": "bmp", "width": w, "height": abs(h), "bpp": bpp, "n_bytes": len(b)}
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return {"fmt": "gif", "width": w, "height": h, "bpp": 8, "n_bytes": len(b)}
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # walk the chunk list (fmt need not be first per the RIFF spec)
        off, fmt_chunk, data_len = 12, None, None
        while off + 8 <= len(b):
            cid = b[off : off + 4]
            size = struct.unpack("<I", b[off + 4 : off + 8])[0]
            if cid == b"fmt ":
                fmt_chunk = b[off + 8 : off + 8 + size]
            elif cid == b"data":
                data_len = size
            off += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt_chunk is None or data_len is None:
            raise ValueError("WAV: missing fmt or data chunk")
        _, channels, sample_rate, _, block_align, bits = struct.unpack(
            "<HHIIHH", fmt_chunk[:16]
        )
        return {
            "fmt": "wav",
            "channels": channels,
            "sample_rate": sample_rate,
            "bits": bits,
            "n_samples": data_len // block_align,
            "n_bytes": len(b),
        }
    if mime == "text/plain":
        return {"fmt": "text", "width": None, "height": None, "bpp": None, "n_bytes": len(b)}
    raise ValueError(f"unrecognized media payload (mime={mime}, head={b[:8]!r})")


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature extractor over Arrow batches of (doc_id, payload, meta):
    routes every payload through :func:`decode_media` (which validates the
    container), then derives the content features. One row out per row in;
    pure function of the payload bytes."""
    for pdf in batches:
        payloads = pdf["payload"]
        mimes = pdf["meta"].map(lambda m: m["mime"])
        sizes = [
            decode_media(b, mime)["n_bytes"] for b, mime in zip(payloads, mimes)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
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
        media.mapInPandas(decode_features, schema=FEATURES_SCHEMA)
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


def _build_bmp(w: int, h: int, seed: bytes) -> bytes:
    """Valid 24-bit BMP (BITMAPINFOHEADER): 54-byte header + padded BGR
    rows, pixel bytes cycled from the seed text."""
    row_stride = (w * 3 + 3) // 4 * 4
    img_size = row_stride * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pix = bytes(seed[i % len(seed)] for i in range(img_size)) if seed else bytes(img_size)
    return header + dib + pix


def _build_png(w: int, h: int, seed: bytes) -> bytes:
    """Valid 8-bit RGB PNG: signature + IHDR + zlib-compressed IDAT
    scanlines (filter byte 0) + IEND, each chunk with its real CRC32."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    n = max(1, len(seed))
    raw = b"".join(
        b"\x00" + bytes(seed[(y * w * 3 + i) % n] if seed else 0 for i in range(w * 3))
        for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _build_gif(w: int, h: int) -> bytes:
    """GIF89a: header + logical screen descriptor + 2-entry global color
    table + image descriptor + a minimal LZW data block + trailer."""
    lsd = struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    gct = b"\x00\x00\x00\xff\xff\xff"
    idesc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = b"\x02\x02\x44\x01\x00"
    return b"GIF89a" + lsd + gct + idesc + lzw + b"\x3b"


DECODE_SCHEMA = (
    "doc_id bigint, fmt string, width bigint, height bigint, bpp bigint"
)


def mm_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the real codec: build genuine PNG/BMP/GIF binaries
    (dimensions derived deterministically from doc_id / n_chars, pixel
    bytes from the document text), then parse them back with
    :func:`decode_media` and emit the header facts.

    The oracle recomputes width/height/bpp from the same generative
    formulas, so any error in either the byte-level construction or the
    header parsing (endianness, offsets, chunk layout) breaks the
    differential — this is a codec test, not a passthrough.

    Scale: construct+parse happen inside ONE mapInPandas stage — the
    binary never crosses a shuffle; map-only, scan-partitioned, identical
    shape to running PIL over a 100 TB media scan.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "width": [], "height": [], "bpp": []}
            for did, n_chars, txt in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"]):
                w = int(did) % 13 + 4
                h = int(n_chars) % 11 + 3
                seed = txt.encode("utf-8")
                kind = int(did) % 3
                if kind == 0:
                    payload, mime = _build_bmp(w, h, seed), "image/bmp"
                elif kind == 1:
                    payload, mime = _build_png(w, h, seed), "image/png"
                else:
                    payload, mime = _build_gif(w, h), "image/gif"
                feat = decode_media(payload, mime)
                out["doc_id"].append(int(did))
                out["fmt"].append(feat["fmt"])
                out["width"].append(feat["width"])
                out["height"].append(feat["height"])
                out["bpp"].append(feat["bpp"])
            yield pd.DataFrame(out)

    return docs.mapInPandas(roundtrip, schema=DECODE_SCHEMA).orderBy("doc_id")


ORACLE_SQL["mm_decode_image"] = """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' ELSE 'gif' END AS fmt,
           doc_id % 13 + 4 AS width,
           n_chars % 11 + 3 AS height,
           CASE doc_id % 3 WHEN 2 THEN 8 ELSE 24 END AS bpp
    FROM documents ORDER BY doc_id
"""


def _build_wav(n_samples: int, sample_rate: int, channels: int, seed: bytes) -> bytes:
    """Valid 16-bit PCM WAV: RIFF header + fmt chunk + data chunk, sample
    bytes cycled from the seed text."""
    bits = 16
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = (
        bytes(seed[i % len(seed)] for i in range(n_samples * block_align))
        if seed
        else bytes(n_samples * block_align)
    )
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


AUDIO_SCHEMA = (
    "doc_id bigint, fmt string, sample_rate bigint, channels bigint, "
    "bits bigint, n_samples bigint, duration_ms bigint"
)


def mm_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio analog of :func:`mm_decode_image`: build genuine 16-bit PCM
    WAV binaries (sample count / rate / channels derived deterministically
    from doc_id and n_chars, sample bytes from the text) and parse them
    back through :func:`decode_media`'s RIFF chunk walker.

    The oracle recomputes rate/channels/samples/duration from the same
    generative formulas, so a wrong chunk offset, a missed word-alignment
    pad, or a bad block_align division breaks the differential.

    Scale: construct+parse inside one mapInPandas stage — map-only,
    scan-partitioned, no shuffle; the shape of running soundfile/ffprobe
    over a 100 TB audio corpus.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "fmt": [],
                "sample_rate": [],
                "channels": [],
                "bits": [],
                "n_samples": [],
                "duration_ms": [],
            }
            for did, n_chars, txt in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"]):
                rate = 8000 if int(did) % 2 == 0 else 16000
                channels = int(did) % 2 + 1
                n_samples = int(n_chars) % 50 + 10
                payload = _build_wav(n_samples, rate, channels, txt.encode("utf-8"))
                feat = decode_media(payload, "audio/wav")
                out["doc_id"].append(int(did))
                out["fmt"].append(feat["fmt"])
                out["sample_rate"].append(feat["sample_rate"])
                out["channels"].append(feat["channels"])
                out["bits"].append(feat["bits"])
                out["n_samples"].append(feat["n_samples"])
                out["duration_ms"].append(feat["n_samples"] * 1000 // feat["sample_rate"])
            yield pd.DataFrame(out)

    return docs.mapInPandas(roundtrip, schema=AUDIO_SCHEMA).orderBy("doc_id")


ORACLE_SQL["mm_decode_audio"] = """
    WITH g AS (
        SELECT doc_id,
               CASE doc_id % 2 WHEN 0 THEN 8000 ELSE 16000 END AS sample_rate,
               doc_id % 2 + 1 AS channels,
               n_chars % 50 + 10 AS n_samples
        FROM documents
    )
    SELECT doc_id, 'wav' AS fmt, sample_rate, channels, 16 AS bits, n_samples,
           n_samples * 1000 // sample_rate AS duration_ms
    FROM g ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Full pixel decode (beyond headers)
# ---------------------------------------------------------------------------

PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pix", T.LongType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("pix_max", T.IntegerType()),
    ]
)


def _decode_png_pixels(b: bytes) -> tuple[int, int, bytes]:
    """FULL PNG decode for the filter-0 subset: walk the chunk chain by
    length+CRC (no fixed offsets), verify each CRC32, concatenate IDAT,
    zlib-decompress, strip the per-scanline filter byte. Returns
    (width, height, pixel_bytes). Raises on any structural violation —
    truncated chunk, bad CRC, non-zero filter — because silently skipping
    corrupt media is how bad bytes reach a training run."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    while pos < len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height = struct.unpack(">II", data[:8])
            if data[8] != 8 or data[9] != 2:
                raise ValueError("PNG: only 8-bit RGB supported here")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + width * 3
    if len(raw) != stride * height:
        raise ValueError("PNG: IDAT length does not match dimensions")
    pix = bytearray()
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError("PNG: non-zero scanline filter")
        pix += row[1:]
    return width, height, bytes(pix)


def mm_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level codec round-trip — one level deeper than
    :func:`mm_decode_image`'s header parse: build a genuine PNG (real
    CRC32s, zlib IDAT) whose pixel bytes cycle the document text, then
    FULLY decode it (chunk walk + CRC verify + zlib inflate + filter
    strip) and aggregate the recovered pixels. The oracle recomputes the
    same aggregates from the generative formula (pixel j = byte j % n of
    the ASCII text), so a single corrupted bit anywhere in construction,
    compression, or decode breaks the differential.

    Scale: construct+decode+aggregate all inside ONE mapInPandas stage —
    map-only, scan-partitioned; the decompressed pixels never leave the
    executor, only the 6-column summary row does.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "n_pix", "pix_sum", "pix_max")}
            for did, n_chars, txt in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"]):
                w = int(did) % 13 + 4
                h = int(n_chars) % 11 + 3
                payload = _build_png(w, h, txt.encode("utf-8"))
                w2, h2, pix = _decode_png_pixels(payload)
                out["doc_id"].append(int(did))
                out["width"].append(w2)
                out["height"].append(h2)
                out["n_pix"].append(w2 * h2)
                out["pix_sum"].append(sum(pix))
                out["pix_max"].append(max(pix))
            yield pd.DataFrame(out)

    return docs.mapInPandas(roundtrip, schema=PIXEL_SCHEMA).orderBy("doc_id")


ORACLE_SQL["mm_pixel_decode"] = """
    WITH dims AS (
        SELECT doc_id, n_chars, text,
               CAST(doc_id % 13 + 4 AS INT) AS width,
               CAST(n_chars % 11 + 3 AS INT) AS height
        FROM documents
    ),
    idx AS (
        SELECT doc_id, width, height, n_chars, text,
               unnest(range(0, width * 3 * height)) AS j
        FROM dims
    ),
    -- empty-text guard mirrors _build_png (an empty seed yields all-zero
    -- pixels, never a modulo-by-zero); the byte-for-char substr() identity
    -- additionally relies on the fixture's ASCII text (n_chars == UTF-8
    -- byte length), the same invariant the builders assume
    pix AS (
        SELECT doc_id, width, height,
               CASE WHEN n_chars = 0 THEN 0
                    ELSE unicode(substr(text, CAST(j % n_chars AS INT) + 1, 1))
               END AS bv
        FROM idx
    )
    SELECT doc_id, width, height,
           CAST(width * height AS BIGINT) AS n_pix,
           CAST(SUM(bv) AS BIGINT) AS pix_sum,
           CAST(MAX(bv) AS INT) AS pix_max
    FROM pix
    GROUP BY doc_id, width, height
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Framewise audio energy (PCM decode beyond headers)
# ---------------------------------------------------------------------------

AUDIO_FRAME = 16  # samples per analysis frame (flat, channel-interleaved)

ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def _decode_wav_samples(b: bytes) -> list[int]:
    """FULL 16-bit PCM WAV decode: walk the RIFF chunk chain by declared
    sizes (word-aligned), take fmt's block layout from the chunk itself,
    and unpack the data chunk as little-endian int16 samples. Raises on a
    malformed container — truncated chunk, missing fmt/data, non-16-bit —
    because silently feeding garbage samples to a feature extractor is
    how bad audio reaches a training run."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    (riff_size,) = struct.unpack("<I", b[4:8])
    if riff_size != len(b) - 8:
        raise ValueError("RIFF size does not match payload")
    pos, bits, data = 12, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            bits = struct.unpack("<HHIIHH", body[:16])[5]
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if bits != 16 or data is None:
        raise ValueError("expected 16-bit PCM with fmt and data chunks")
    if len(data) % 2:
        raise ValueError("odd data-chunk length for 16-bit samples")
    return list(struct.unpack(f"<{len(data) // 2}h", data))


def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framewise audio energy — the VAD/segmentation primitive — computed
    from a REAL decode: build the 16-bit PCM WAV (same generative formulas
    as :func:`mm_decode_audio`), walk the RIFF chunks, unpack int16
    samples, and emit sum-of-squares energy per AUDIO_FRAME-sample frame
    (flat over the channel-interleaved stream; the trailing partial frame
    is dropped). The oracle recomputes every sample from the text bytes
    (sample j = byte(2j) + 256*byte(2j+1), two's-complement), so any
    error in chunk walking, alignment, or endianness breaks the
    differential — the audio twin of :func:`mm_pixel_decode`.

    Scale: construct+decode+frame-aggregate inside ONE mapInPandas stage;
    only (doc, frame, energy) rows leave the executor.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame": [], "energy": []}
            for did, n_chars, txt in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"]):
                rate = 8000 if int(did) % 2 == 0 else 16000
                channels = int(did) % 2 + 1
                n_samples = int(n_chars) % 50 + 10
                payload = _build_wav(n_samples, rate, channels, txt.encode("utf-8"))
                samples = _decode_wav_samples(payload)
                for f in range(len(samples) // AUDIO_FRAME):
                    chunk = samples[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
                    out["doc_id"].append(int(did))
                    out["frame"].append(f)
                    out["energy"].append(sum(s * s for s in chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame": pd.Series(out["frame"], dtype="int32"),
                    "energy": pd.Series(out["energy"], dtype="int64"),
                }
            )

    return docs.mapInPandas(roundtrip, schema=ENERGY_SCHEMA).orderBy("doc_id", "frame")


ORACLE_SQL["mm_audio_energy"] = f"""
    WITH g AS (
        SELECT doc_id, n_chars, text,
               (doc_id % 2 + 1) * (n_chars % 50 + 10) AS total
        FROM documents
    ),
    idx AS (
        SELECT doc_id, n_chars, text,
               unnest(range(0, (total // {AUDIO_FRAME}) * {AUDIO_FRAME})) AS j
        FROM g
    ),
    -- empty-text guard mirrors _build_wav (an empty seed yields all-zero
    -- sample bytes, never a modulo-by-zero); the byte-for-char substr()
    -- identity additionally relies on the fixture's ASCII text (n_chars ==
    -- UTF-8 byte length), the same invariant the builders assume
    smp AS (
        SELECT doc_id, CAST(j // {AUDIO_FRAME} AS INT) AS frame,
               CASE WHEN n_chars = 0 THEN 0 ELSE
                   unicode(substr(text, CAST((2 * j) % n_chars AS INT) + 1, 1))
                   + 256 * unicode(substr(text, CAST((2 * j + 1) % n_chars AS INT) + 1, 1))
               END AS raw
        FROM idx
    ),
    s16 AS (
        SELECT doc_id, frame,
               CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        FROM smp
    )
    SELECT doc_id, frame, CAST(SUM(v * v) AS BIGINT) AS energy
    FROM s16
    GROUP BY doc_id, frame
    ORDER BY doc_id, frame
"""


# ---------------------------------------------------------------------------
# Perceptual image hash + Hamming-banded near-dup pairs (r8 VERDICT item 5)
# ---------------------------------------------------------------------------

PHASH_GRID = 8  # 8x8 block-mean aHash -> 64 bits
PHASH_BANDS = 4  # 4 bands x 16 bits; <= 3 flipped bits can't touch all 4
PHASH_BAND_BITS = (PHASH_GRID * PHASH_GRID) // PHASH_BANDS  # 16-bit band keys
PHASH_HAMMING_MAX = PHASH_BANDS - 1  # lossless banding (pigeonhole)

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
    ]
)


def _ahash_bands(pix: bytes, w: int, h: int) -> list[int]:
    """64-bit block-mean aHash of an RGB pixel buffer, returned as 4
    16-bit band signatures (bit k of the hash = block k's mean exceeds
    the global mean; k = (y-block * 8) + x-block). All-integer: the mean
    comparison is the cross-multiplication block_sum * n_total >
    total_sum * n_block, so no float division anywhere and the SQL
    oracle reproduces it bit-for-bit. Blocks that receive no pixels
    (images narrower/shorter than the 8-grid) contribute bit 0, matching
    the oracle where the empty group simply never appears."""
    n_total = len(pix)
    total = sum(pix)
    n_cells = PHASH_GRID * PHASH_GRID
    bsum = [0] * n_cells
    bn = [0] * n_cells
    for j, v in enumerate(pix):
        p = j // 3
        x = p % w
        y = p // w
        k = ((y * PHASH_GRID) // h) * PHASH_GRID + (x * PHASH_GRID) // w
        bsum[k] += v
        bn[k] += 1
    bits = [
        1 if bsum[k] * n_total > total * bn[k] else 0 for k in range(n_cells)
    ]
    return [
        sum(
            bits[i * PHASH_BAND_BITS + t] << t
            for t in range(PHASH_BAND_BITS)
        )
        for i in range(PHASH_BANDS)
    ]


def _explode_bands(sigs: DataFrame, n_bands: int) -> DataFrame:
    """(doc_id, b0..b3) signature rows -> the (doc_id, b0..b3, bidx, bsig)
    band table every banded consumer joins on. A narrow projection —
    shared by the image and audio families, and cheap enough to
    reconstruct from the persisted signature store on every read (the
    store keeps ONE row per document, not four)."""
    return sigs.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bidx"), F.col(f"b{i}").alias("bsig")
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.col("bb.bidx").alias("bidx"), F.col("bb.bsig").alias("bsig"),
    )


def _hamming_expr(n_bands: int) -> str:
    return " + ".join(f"bit_count(x.b{i} ^ y.b{i})" for i in range(n_bands))


def _banded_pairs(bx: DataFrame, by: DataFrame, n_bands: int, ham_max: int) -> DataFrame:
    """Canonical (d1 < d2) near-dup pairs from two exploded band tables:
    bucket equi-join on (bidx, bsig), exact Hamming verify from the
    carried signatures, distinct across the bands a pair shares."""
    return (
        bx.alias("x")
        .join(
            by.alias("y"),
            (F.col("x.bidx") == F.col("y.bidx"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.expr(f"CAST({_hamming_expr(n_bands)} AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= ham_max)
        .distinct()
    )


def _banded_pairs_sym(
    bx: DataFrame, by: DataFrame, n_bands: int, ham_max: int
) -> DataFrame:
    """Canonical pairs where AT LEAST the ``bx`` member of each pair is
    present — the incremental appends' batch-vs-(store ∪ batch) shape in
    ONE join (r16, guide §2.4). The pre-r16 form unioned BOTH
    orientations of :func:`_banded_pairs` (bx⋈by then by⋈bx) because the
    new document may be either the smaller or the larger id; joining on
    ``!=`` and normalizing with least/greatest yields the identical
    distinct pair set while scanning and hash-joining the (bigger)
    ``by`` side once instead of twice. Hamming is XOR-symmetric, so the
    verify is orientation-independent."""
    return (
        bx.alias("x")
        .join(
            by.alias("y"),
            (F.col("x.bidx") == F.col("y.bidx"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .select(
            F.least(F.col("x.doc_id"), F.col("y.doc_id")).alias("d1"),
            F.greatest(F.col("x.doc_id"), F.col("y.doc_id")).alias("d2"),
            F.expr(f"CAST({_hamming_expr(n_bands)} AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= ham_max)
        .distinct()
    )


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs over DECODED pixels: build each document's
    generative PNG (the :func:`mm_pixel_decode` path — real CRC32s, zlib
    IDAT), fully decode it, compute a 64-bit block-mean aHash, and emit
    all pairs at Hamming distance <= 3 via an exact banded equi-join —
    image dedup joining the text (:func:`..dedup.dedup_minhash_lsh`) and
    embedding (:func:`..dedup.dedup_embedding_lsh`) families with the
    same (d1, d2, hamming) pair contract, so the output composes directly
    with ``connected_components``/``dedup_cc``.

    The hash is stored as 4 x 16-bit band signatures (never one 64-bit
    int — bit 63 would overflow signed int64 in both engines); banding at
    Hamming <= 3 with 4 bands is LOSSLESS (pigeonhole: <= 3 flipped bits
    cannot touch all 4 bands), so recall is 1.0 by construction, and the
    oracle recomputes hash + join from the generative pixel formula —
    a corrupted bit anywhere in construction, compression, decode, or
    hashing breaks the differential.

    Scale: decode+hash runs ONCE per source identity (the persisted
    signature store, :func:`phash_signatures_cached`) as one map-only
    Arrow-batched stage (pixels never leave the executor; 4 small ints
    per image do); thereafter every consumer — this pair enumeration,
    :func:`mm_phash_probe`, :func:`mm_phash_append` — starts from a
    columnar scan of the signature parquet. The pair join runs only
    inside (band, sig) buckets over a 2^16 keyspace per band. A
    pathological corpus of near-identical images would concentrate
    buckets like simhash's homogeneous case — the same hot-bucket df-cap
    applies if that corpus ever materializes (documented, not built:
    unlike text, the synthetic image corpus derives dims from doc_id so
    buckets stay populated-but-bounded).
    """
    bands = _phash_bands_table(spark, sf_dir)
    return _banded_pairs(bands, bands, PHASH_BANDS, PHASH_HAMMING_MAX).orderBy(
        "d1", "d2"
    )


def _phash_sig_compute(docs: DataFrame) -> DataFrame:
    """aHash signatures (doc_id, b0..b3) for a documents DataFrame —
    build PNG, decode pixels, block-mean hash, all in one map-only Arrow
    stage. The expensive stage of the image family; callers persist its
    output (:func:`phash_signatures_cached`) rather than re-running it."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "b0", "b1", "b2", "b3")}
            for did, n_chars, txt in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"]):
                w = int(did) % 13 + 4
                h = int(n_chars) % 11 + 3
                payload = _build_png(w, h, txt.encode("utf-8"))
                w2, h2, pix = _decode_png_pixels(payload)
                bands = _ahash_bands(pix, w2, h2)
                out["doc_id"].append(int(did))
                for i in range(PHASH_BANDS):
                    out[f"b{i}"].append(bands[i])
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars", "text").mapInPandas(
        hash_batches, schema=PHASH_SCHEMA
    )


def phash_signatures_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IMAGE signature store — the image modality's band
    index, same identity-keyed build-once contract as the MinHash band
    store (:func:`..dedup.dedup_minhash_append`'s ``bands``): decode +
    hash the corpus ONCE per source identity, then every consumer
    (pair enumeration, query-side probe, incremental append) reads the
    signature parquet. Re-fingerprinting 100 TB of media per query batch
    was the scale-killer this store removes (r9 VERDICT item 1); a
    regenerated source changes the directory key and re-encodes.

    Shares the pair cache's directory (``modality='phash'``) under its
    own ``sigs``/``_SIGS_READY`` marker, so signatures and pairs of one
    source identity live together."""
    from .dedup import _pair_cache_dir
    from ..catalog import hadoop_fs

    base = _pair_cache_dir(spark, sf_dir, modality="phash")
    fs, marker = hadoop_fs(spark, f"{base}/_SIGS_READY")
    if not fs.exists(marker):
        docs = load_table(spark, sf_dir, "documents")
        _phash_sig_compute(docs).write.mode("overwrite").parquet(f"{base}/sigs")
        fs.create(marker, True).close()
    return spark.read.parquet(f"{base}/sigs")


def _phash_bands_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aHash band table (doc_id, b0..b3, bidx, bsig) every phash
    consumer joins on — served from the persisted signature store; the
    only decode happens on the store's first build."""
    return _explode_bands(phash_signatures_cached(spark, sf_dir), PHASH_BANDS)


SCENE_CUT_MIN = 64  # |mean-byte delta vs previous frame| * 256 threshold


def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over the frame stream — the segmentation
    primitive video curation runs after :func:`mm_frame_sample`'s
    subsampling: each FRAME_BYTES-sized frame of the payload gets a
    content signal (its byte sum), and a frame is a CUT when its
    mean byte value jumps by more than SCENE_CUT_MIN/256 against the
    previous frame (mean comparison as exact cross-multiplied integers —
    frames differ in length at the tail, so sums alone would bias the
    final frame). Emits (doc_id, frame_idx, frame_sum, frame_len,
    is_cut) with frame 0 never a cut (no predecessor) — downstream
    shot-level dedup/sampling groups on cumulative cut counts.

    Arrow-batched like the audio/pixel decode paths: one mapInPandas
    stage walks each payload once and emits frame-rows only; the oracle
    recomputes every byte from the text via the substr/unicode identity
    (fixture text is ASCII), the LAG window, and the same integer
    threshold — sample-exact, like :func:`mm_audio_energy`.

    Scale: map-only (no shuffle at all — the signal, the lag, and the
    threshold are computed inside the per-document walk); output is
    frame-count-sized. At 100 TB this is the cheapest operator in the
    multimodal family.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "frame_sum": [],
                "frame_len": [],
                "is_cut": [],
            }
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                payload = txt.encode("utf-8")
                n = len(payload)
                n_frames = max(1, -(-n // FRAME_BYTES)) if n else 1
                prev_sum = prev_len = None
                for f in range(n_frames):
                    chunk = payload[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    s, ln = sum(chunk), len(chunk)
                    if prev_sum is None or ln == 0 or prev_len == 0:
                        cut = 0
                    else:
                        # |s/ln - ps/pl| > MIN/256, cross-multiplied
                        cut = int(
                            abs(s * prev_len - prev_sum * ln) * 256
                            > SCENE_CUT_MIN * ln * prev_len
                        )
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(f)
                    out["frame_sum"].append(s)
                    out["frame_len"].append(ln)
                    out["is_cut"].append(cut)
                    prev_sum, prev_len = s, ln
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_sum": pd.Series(out["frame_sum"], dtype="int64"),
                    "frame_len": pd.Series(out["frame_len"], dtype="int64"),
                    "is_cut": pd.Series(out["is_cut"], dtype="int32"),
                }
            )

    return docs.mapInPandas(
        cuts,
        schema="doc_id bigint, frame_idx int, frame_sum bigint, "
        "frame_len bigint, is_cut int",
    ).orderBy("doc_id", "frame_idx")


ORACLE_SQL["mm_scene_cuts"] = f"""
    WITH g AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ),
    fr AS (
        SELECT doc_id, text, n,
               unnest(range(0, CASE WHEN n = 0 THEN 1
                   ELSE CAST(ceil(n * 1.0 / {FRAME_BYTES}) AS BIGINT) END)) AS f
        FROM g
    ),
    idx AS (
        SELECT doc_id, f,
               unnest(range(f * {FRAME_BYTES},
                            CASE WHEN (f + 1) * {FRAME_BYTES} < n
                                 THEN (f + 1) * {FRAME_BYTES} ELSE n END)) AS j
        FROM fr
    ),
    sums AS (
        SELECT i.doc_id, i.f,
               CAST(COALESCE(SUM(unicode(substr(i.text, CAST(j AS INT) + 1, 1))), 0)
                   AS BIGINT) AS s,
               CAST(COUNT(j) AS BIGINT) AS ln
        FROM fr i LEFT JOIN idx ON idx.doc_id = i.doc_id AND idx.f = i.f
        GROUP BY i.doc_id, i.f
    ),
    lagged AS (
        SELECT doc_id, f, s, ln,
               LAG(s) OVER (PARTITION BY doc_id ORDER BY f) AS ps,
               LAG(ln) OVER (PARTITION BY doc_id ORDER BY f) AS pl
        FROM sums
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx, s AS frame_sum,
           ln AS frame_len,
           CAST(CASE WHEN ps IS NULL OR ln = 0 OR pl = 0 THEN 0
                WHEN abs(s * pl - ps * ln) * 256 > {SCENE_CUT_MIN} * ln * pl
                THEN 1 ELSE 0 END AS INT) AS is_cut
    FROM lagged
    ORDER BY doc_id, frame_idx
"""


AFP_BINS = 32  # audio fingerprint: 32 energy bins -> 32 bits
AFP_BANDS = 4  # 4 bands x 8 bits; <= 3 flipped bits can't touch all 4
AFP_BAND_BITS = AFP_BINS // AFP_BANDS
AFP_HAMMING_MAX = AFP_BANDS - 1  # lossless banding (pigeonhole)


def mm_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs over DECODED samples — the audio modality
    joining the text/embedding/image dedup families with the same
    (d1, d2, hamming) pair contract. Each document's generative WAV is
    built and fully decoded (:func:`mm_audio_energy`'s RIFF path), the
    interleaved int16 stream is partitioned into AFP_BINS equal-width
    bins, and bit b is set iff bin b's mean energy exceeds the whole
    clip's mean (the Haitsma-Kalker energy-profile fingerprint shape,
    normalized to a fixed length so clips of different duration remain
    comparable). Pairs at Hamming <= 3 emerge from an exact banded
    equi-join — 4 x 8-bit bands, lossless at this threshold by
    pigeonhole, exactly :func:`mm_phash_dedup`'s construction.

    The corpus has true audio near-dups by construction: sample bytes
    cycle the document text, so the neighbor-with-one-word-changed
    documents that give the text family its duplicate clusters yield
    nearly identical energy profiles here.

    Scale: build+decode+fingerprint runs ONCE per source identity into
    the persisted signature store (:func:`afp_signatures_cached`) as one
    map-only Arrow-batched stage (samples never leave the executor; 4
    small ints per clip do); every consumer — this pair enumeration,
    :func:`mm_audio_probe`, :func:`mm_audio_append` — then reads the
    signature parquet. The pair join runs inside (band, sig) buckets
    over a 2^8 keyspace per band. The same hot-bucket cap as simhash
    applies if a homogeneous audio corpus concentrates bands
    (documented, not built — profile diversity here tracks text
    diversity).
    """
    bands = _afp_bands_table(spark, sf_dir)
    return _banded_pairs(bands, bands, AFP_BANDS, AFP_HAMMING_MAX).orderBy(
        "d1", "d2"
    )


def _afp_sig_compute(docs: DataFrame) -> DataFrame:
    """Audio-fingerprint signatures (doc_id, b0..b3) for a documents
    DataFrame — build WAV, decode PCM, 32-bin energy-profile hash, one
    map-only Arrow stage; the expensive stage callers persist via
    :func:`afp_signatures_cached`."""

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "b0", "b1", "b2", "b3")}
            for did, n_chars, txt in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"]):
                rate = 8000 if int(did) % 2 == 0 else 16000
                channels = int(did) % 2 + 1
                n_samples = int(n_chars) % 50 + 10
                payload = _build_wav(n_samples, rate, channels, txt.encode("utf-8"))
                samples = _decode_wav_samples(payload)
                t = len(samples)
                tot = sum(s * s for s in samples)
                esum = [0] * AFP_BINS
                cnt = [0] * AFP_BINS
                for j, s in enumerate(samples):
                    b = (j * AFP_BINS) // t
                    esum[b] += s * s
                    cnt[b] += 1
                bits = [
                    1 if (cnt[b] > 0 and esum[b] * t > tot * cnt[b]) else 0
                    for b in range(AFP_BINS)
                ]
                out["doc_id"].append(int(did))
                for k in range(AFP_BANDS):
                    out[f"b{k}"].append(
                        sum(
                            bits[k * AFP_BAND_BITS + i] << i
                            for i in range(AFP_BAND_BITS)
                        )
                    )
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars", "text").mapInPandas(
        fp_batches, schema=PHASH_SCHEMA
    )


def afp_signatures_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted AUDIO signature store — fourth member of the
    identity-keyed band-index family (text MinHash bands, embedding code
    tree, image aHash sigs, these): fingerprint the corpus ONCE per
    source identity, then probes, the pair enumeration, and the append
    path all read the signature parquet instead of re-decoding every WAV
    per call. Lives beside the audio pair cache (``modality='audio'``)
    under its own ``sigs``/``_SIGS_READY`` marker."""
    from .dedup import _pair_cache_dir
    from ..catalog import hadoop_fs

    base = _pair_cache_dir(spark, sf_dir, modality="audio")
    fs, marker = hadoop_fs(spark, f"{base}/_SIGS_READY")
    if not fs.exists(marker):
        docs = load_table(spark, sf_dir, "documents")
        _afp_sig_compute(docs).write.mode("overwrite").parquet(f"{base}/sigs")
        fs.create(marker, True).close()
    return spark.read.parquet(f"{base}/sigs")


def _afp_bands_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio-fingerprint band table (doc_id, b0..b3, bidx, bsig) —
    served from the persisted signature store; the only WAV decode
    happens on the store's first build."""
    return _explode_bands(afp_signatures_cached(spark, sf_dir), AFP_BANDS)


ORACLE_SQL["mm_audio_dedup"] = f"""
    WITH g AS (
        SELECT doc_id, n_chars, text,
               (doc_id % 2 + 1) * (n_chars % 50 + 10) AS total
        FROM documents
    ),
    idx AS (
        SELECT doc_id, n_chars, text, total, unnest(range(0, total)) AS j FROM g
    ),
    smp AS (
        SELECT doc_id, total, CAST((j * {AFP_BINS}) // total AS INT) AS bin,
               CASE WHEN n_chars = 0 THEN 0 ELSE
                   unicode(substr(text, CAST((2 * j) % n_chars AS INT) + 1, 1))
                   + 256 * unicode(substr(text, CAST((2 * j + 1) % n_chars AS INT) + 1, 1))
               END AS raw
        FROM idx
    ),
    s16 AS (
        SELECT doc_id, total, bin,
               CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        FROM smp
    ),
    binsum AS (
        SELECT doc_id, bin, CAST(SUM(v * v) AS BIGINT) AS e, COUNT(*) AS bn
        FROM s16 GROUP BY doc_id, bin
    ),
    tot AS (
        SELECT doc_id, CAST(SUM(v * v) AS BIGINT) AS tsum, COUNT(*) AS tn
        FROM s16 GROUP BY doc_id
    ),
    bits AS (
        SELECT b.doc_id, b.bin,
               CASE WHEN b.e * t.tn > t.tsum * b.bn THEN 1 ELSE 0 END AS bit
        FROM binsum b JOIN tot t USING (doc_id)
    ),
    sigs AS (
        SELECT g.doc_id,
               CAST(COALESCE(SUM(CASE WHEN bin // {AFP_BAND_BITS} = 0
                    THEN bit << (bin % {AFP_BAND_BITS}) END), 0) AS BIGINT) AS b0,
               CAST(COALESCE(SUM(CASE WHEN bin // {AFP_BAND_BITS} = 1
                    THEN bit << (bin % {AFP_BAND_BITS}) END), 0) AS BIGINT) AS b1,
               CAST(COALESCE(SUM(CASE WHEN bin // {AFP_BAND_BITS} = 2
                    THEN bit << (bin % {AFP_BAND_BITS}) END), 0) AS BIGINT) AS b2,
               CAST(COALESCE(SUM(CASE WHEN bin // {AFP_BAND_BITS} = 3
                    THEN bit << (bin % {AFP_BAND_BITS}) END), 0) AS BIGINT) AS b3
        FROM g LEFT JOIN bits ON bits.doc_id = g.doc_id
        GROUP BY g.doc_id
    ),
    bands AS (
        SELECT doc_id, b0, b1, b2, b3, i.i AS bidx,
               CASE i.i WHEN 0 THEN b0 WHEN 1 THEN b1
                        WHEN 2 THEN b2 ELSE b3 END AS bsig
        FROM sigs, (SELECT unnest(range(0, {AFP_BANDS})) AS i) i
    )
    SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
              AS INT) AS hamming
    FROM bands x
    JOIN bands y ON x.bidx = y.bidx AND x.bsig = y.bsig
                AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        <= {AFP_HAMMING_MAX}
    ORDER BY d1, d2
"""


def audio_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted AUDIO near-dup pair list — fourth member of the
    modality pair-cache family, same identity-keyed build-once contract
    as :func:`phash_pairs_cached` (keyed by documents, ``audio``
    namespace)."""
    from .dedup import _pair_cache_dir
    from ..catalog import hadoop_fs

    base = _pair_cache_dir(spark, sf_dir, modality="audio")
    fs, marker = hadoop_fs(spark, f"{base}/_PAIRS_READY")
    if not fs.exists(marker):
        mm_audio_dedup(spark, sf_dir).write.mode("overwrite").parquet(
            f"{base}/pairs"
        )
        fs.create(marker, True).close()
    return spark.read.parquet(f"{base}/pairs")


def phash_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IMAGE near-dup pair list — the pixel modality's twin
    of :func:`..dedup.minhash_pairs_cached`, keyed by the documents
    source identity under the ``phash`` namespace.

    The decode → aHash → banded-join pipeline of :func:`mm_phash_dedup`
    is deterministic per source bytes, and at 100 TB the decode stage
    (every image's pixels) is the dominant cost — recomputing it per
    consumer is exactly the waste the text pair cache eliminated. Build
    once per source identity, then every composition
    (``dedup_multimodal_cc`` and friends) reads the output-sized pair
    parquet; regenerated images change the identity and re-detect.
    """
    from .dedup import _pair_cache_dir
    from ..catalog import hadoop_fs

    base = _pair_cache_dir(spark, sf_dir, modality="phash")
    fs, marker = hadoop_fs(spark, f"{base}/_PAIRS_READY")
    if not fs.exists(marker):
        mm_phash_dedup(spark, sf_dir).write.mode("overwrite").parquet(
            f"{base}/pairs"
        )
        fs.create(marker, True).close()
    return spark.read.parquet(f"{base}/pairs")


ORACLE_SQL["mm_phash_dedup"] = f"""
    WITH dims AS (
        SELECT doc_id, n_chars, text,
               CAST(doc_id % 13 + 4 AS INT) AS width,
               CAST(n_chars % 11 + 3 AS INT) AS height
        FROM documents
    ),
    idx AS (
        SELECT doc_id, width, height, n_chars, text,
               unnest(range(0, width * 3 * height)) AS j
        FROM dims
    ),
    bytes AS (
        SELECT doc_id, width, height,
               CASE WHEN n_chars = 0 THEN 0
                    ELSE unicode(substr(text, CAST(j % n_chars AS INT) + 1, 1))
               END AS bv,
               (j // 3) % width AS x, (j // 3) // width AS y
        FROM idx
    ),
    blocks AS (
        SELECT doc_id,
               ((y * {PHASH_GRID}) // height) * {PHASH_GRID}
                   + (x * {PHASH_GRID}) // width AS k,
               SUM(bv) AS bsum, COUNT(*) AS bn
        FROM bytes GROUP BY 1, 2
    ),
    tot AS (
        SELECT doc_id, SUM(bv) AS tsum, COUNT(*) AS tn FROM bytes GROUP BY 1
    ),
    bits AS (
        SELECT b.doc_id, b.k,
               CASE WHEN b.bsum * t.tn > t.tsum * b.bn THEN 1 ELSE 0 END AS bit
        FROM blocks b JOIN tot t USING (doc_id)
    ),
    sigs AS (
        SELECT doc_id,
               CAST(COALESCE(SUM(CASE WHEN k // {PHASH_BAND_BITS} = 0
                    THEN bit << (k % {PHASH_BAND_BITS}) END), 0) AS BIGINT) AS b0,
               CAST(COALESCE(SUM(CASE WHEN k // {PHASH_BAND_BITS} = 1
                    THEN bit << (k % {PHASH_BAND_BITS}) END), 0) AS BIGINT) AS b1,
               CAST(COALESCE(SUM(CASE WHEN k // {PHASH_BAND_BITS} = 2
                    THEN bit << (k % {PHASH_BAND_BITS}) END), 0) AS BIGINT) AS b2,
               CAST(COALESCE(SUM(CASE WHEN k // {PHASH_BAND_BITS} = 3
                    THEN bit << (k % {PHASH_BAND_BITS}) END), 0) AS BIGINT) AS b3
        FROM bits GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, b0, b1, b2, b3, i.i AS bidx,
               CASE i.i WHEN 0 THEN b0 WHEN 1 THEN b1
                        WHEN 2 THEN b2 ELSE b3 END AS bsig
        FROM sigs, (SELECT unnest(range(0, {PHASH_BANDS})) AS i) i
    )
    SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
              AS INT) AS hamming
    FROM bands x
    JOIN bands y ON x.bidx = y.bidx AND x.bsig = y.bsig
                AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        <= {PHASH_HAMMING_MAX}
    ORDER BY d1, d2
"""


PHASH_PROBE_MOD = 2  # query-image sample: every even doc_id


def mm_phash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-side image search — "find the near-duplicates OF THESE
    images": a deterministic query sample (doc_id % PHASH_PROBE_MOD == 0 — half the corpus, so the sample intersects the sparse duplicate set at every fixture scale)
    probes the aHash band table for corpus images within
    PHASH_HAMMING_MAX, excluding self-matches. The serving twin of
    :func:`mm_phash_dedup` (which enumerates all pairs): band equality
    routes each query to its buckets, so a probe touches only
    bucket-matching corpus rows — against the persisted band index at
    production scale, this is the image analog of
    :func:`..similarity.sim_index_probe`.

    Output keeps BOTH directions' matches for a query (match ids above
    and below the query id), which is the search contract — unlike the
    dedup pair list's d1 < d2 canonicalization.
    """
    bands = _phash_bands_table(spark, sf_dir)
    q = bands.filter(F.col("doc_id") % PHASH_PROBE_MOD == 0)
    ham = " + ".join(
        f"bit_count(x.b{i} ^ y.b{i})" for i in range(PHASH_BANDS)
    )
    return (
        q.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.bidx") == F.col("y.bidx"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("q_doc"),
            F.col("y.doc_id").alias("match_doc"),
            F.expr(f"CAST({ham} AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .distinct()
        .orderBy("q_doc", "match_doc")
    )


def _phash_probe_oracle() -> str:
    # splice the probe SELECT onto mm_phash_dedup's band-building CTEs so
    # the two oracles can never drift apart
    anchor = "SELECT DISTINCT x.doc_id AS d1"
    dedup_sql = ORACLE_SQL["mm_phash_dedup"]
    # explicit raise, not assert: this runs at import time and guards a
    # SPLICED oracle — under `python -O` a stripped assert would let a
    # drifted dedup oracle silently produce a malformed probe oracle
    if dedup_sql.count(anchor) != 1:
        raise RuntimeError("phash oracle anchor drifted")
    prefix = dedup_sql.split(anchor)[0]
    return f"""{prefix}
    SELECT DISTINCT x.doc_id AS q_doc, y.doc_id AS match_doc,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
              AS INT) AS hamming
    FROM bands x
    JOIN bands y ON x.bidx = y.bidx AND x.bsig = y.bsig
                AND x.doc_id <> y.doc_id
    WHERE x.doc_id % {PHASH_PROBE_MOD} = 0
      AND bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        <= {PHASH_HAMMING_MAX}
    ORDER BY q_doc, match_doc
"""


ORACLE_SQL["mm_phash_probe"] = _phash_probe_oracle()


AFP_PROBE_MOD = 2  # query-clip sample: every even doc_id


def mm_audio_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-side audio search — "find the near-duplicate clips OF THESE
    clips": the even-doc_id query sample probes the audio-fingerprint
    band table for corpus clips within AFP_HAMMING_MAX, self-matches
    excluded. Completes probe parity across modalities: text has the
    incremental band-store probe (dedup_minhash_append), embeddings the
    partition-pruned index probe (sim_index_probe), images
    mm_phash_probe — this is the audio member, same banded
    bucket-bounded join, same (query, match, hamming) search contract.
    """
    bands = _afp_bands_table(spark, sf_dir)
    q = bands.filter(F.col("doc_id") % AFP_PROBE_MOD == 0)
    ham = " + ".join(
        f"bit_count(x.b{i} ^ y.b{i})" for i in range(AFP_BANDS)
    )
    return (
        q.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.bidx") == F.col("y.bidx"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("q_doc"),
            F.col("y.doc_id").alias("match_doc"),
            F.expr(f"CAST({ham} AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= AFP_HAMMING_MAX)
        .distinct()
        .orderBy("q_doc", "match_doc")
    )


def _afp_probe_oracle() -> str:
    # same splice discipline as the image probe: reuse the audio dedup
    # oracle's band-building CTEs through a uniqueness-asserted anchor
    anchor = "SELECT DISTINCT x.doc_id AS d1"
    dedup_sql = ORACLE_SQL["mm_audio_dedup"]
    if dedup_sql.count(anchor) != 1:  # explicit: survives `python -O`
        raise RuntimeError("audio oracle anchor drifted")
    prefix = dedup_sql.split(anchor)[0]
    return f"""{prefix}
    SELECT DISTINCT x.doc_id AS q_doc, y.doc_id AS match_doc,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
              AS INT) AS hamming
    FROM bands x
    JOIN bands y ON x.bidx = y.bidx AND x.bsig = y.bsig
                AND x.doc_id <> y.doc_id
    WHERE x.doc_id % {AFP_PROBE_MOD} = 0
      AND bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        <= {AFP_HAMMING_MAX}
    ORDER BY q_doc, match_doc
"""


ORACLE_SQL["mm_audio_probe"] = _afp_probe_oracle()


# ---------------------------------------------------------------------------
# Incremental append for the image and audio modalities (r9 VERDICT item 3)
# ---------------------------------------------------------------------------


def _mm_banded_append(
    spark: SparkSession,
    sf_dir: str,
    modality: str,
    sig_compute,
    n_bands: int,
    ham_max: int,
) -> DataFrame:
    """Shared build-once/append-many kernel for the banded-signature
    modalities — the exact :func:`..dedup.dedup_minhash_append` contract
    (``dedup.py`` append path) applied to image/audio: the persisted base
    signature store is built once per source identity, an arriving batch
    is encoded against it, and only new-vs-corpus and new-vs-new pairs
    are emitted and appended, marker-idempotently.

    Append ≡ full rebuild holds EXACTLY here (the oracle is the full
    rebuild SQL verbatim): a clip/image's signature depends only on its
    own content, so pairs over the union corpus = base-base pairs ∪
    new-vs-anything pairs, and the Hamming verify is per-pair from the
    carried signatures — unlike MinHash there is no shingle recompute at
    all; the entire incremental cost is O(batch) decode + a
    batch-vs-corpus bucket join (never corpus x corpus)."""
    from .dedup import APPEND_MOD, _pair_cache_dir
    from ..catalog import hadoop_fs

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % APPEND_MOD == 0

    base = _pair_cache_dir(spark, sf_dir, modality=f"{modality}-append")
    fs, base_marker = hadoop_fs(spark, f"{base}/_BASE_READY")
    if not fs.exists(base_marker):
        base_sigs = sig_compute(docs.filter(~is_new))
        base_sigs.write.mode("overwrite").parquet(f"{base}/sigs")
        stored = spark.read.parquet(f"{base}/sigs")  # decode once, join twice
        bands = _explode_bands(stored, n_bands)
        _banded_pairs(bands, bands, n_bands, ham_max).write.mode(
            "overwrite"
        ).parquet(f"{base}/pairs")
        fs.create(base_marker, True).close()

    _, appended = hadoop_fs(spark, f"{base}/_APPEND_READY")
    if not fs.exists(appended):
        new_sigs = sig_compute(docs.filter(is_new))
        new_sigs.write.mode("append").parquet(f"{base}/sigs_new")
        nb = _explode_bands(spark.read.parquet(f"{base}/sigs_new"), n_bands)
        ab = _explode_bands(
            spark.read.parquet(f"{base}/sigs").unionByName(
                spark.read.parquet(f"{base}/sigs_new")
            ),
            n_bands,
        )
        # ONE symmetric new-vs-anything bucket join (r16, §2.4): the new
        # doc may be the smaller or larger id of a pair, so the pre-r16
        # form unioned both orientations — the != join + least/greatest
        # normalization emits the identical distinct set while scanning
        # and joining the (store ∪ batch) side once instead of twice
        new_pairs = _banded_pairs_sym(nb, ab, n_bands, ham_max)
        new_pairs.write.mode("append").parquet(f"{base}/pairs")
        fs.create(appended, True).close()

    return spark.read.parquet(f"{base}/pairs").orderBy("d1", "d2")


def mm_phash_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IMAGE dedup — the daily-batch production shape for the
    pixel modality: encode an arriving image batch (doc_id % APPEND_MOD
    == 0 plays the day's arrivals) against the persisted aHash signature
    store, emit only new-vs-corpus and new-vs-new pairs, append both
    signatures and pairs marker-idempotently, and return the stored pair
    table. Oracle = :func:`mm_phash_dedup`'s full-rebuild SQL verbatim,
    so hash-equality proves **append ≡ rebuild on the union corpus** —
    completing build-once/append-many parity across all four modalities
    (text ``dedup_minhash_append``, embeddings ``sim_index_append``,
    image here, audio :func:`mm_audio_append`)."""
    return _mm_banded_append(
        spark, sf_dir, "phash", _phash_sig_compute, PHASH_BANDS, PHASH_HAMMING_MAX
    )


# append must be rebuild-invisible: same oracle, second execution path
ORACLE_SQL["mm_phash_append"] = ORACLE_SQL["mm_phash_dedup"]


def mm_audio_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental AUDIO dedup — :func:`mm_phash_append`'s audio twin:
    the arriving clip batch is fingerprinted against the persisted
    energy-profile signature store; only pairs touching a new clip are
    computed and appended. Oracle = :func:`mm_audio_dedup`'s full-rebuild
    SQL verbatim (append ≡ rebuild, exactly)."""
    return _mm_banded_append(
        spark, sf_dir, "audio", _afp_sig_compute, AFP_BANDS, AFP_HAMMING_MAX
    )


ORACLE_SQL["mm_audio_append"] = ORACLE_SQL["mm_audio_dedup"]


# ---------------------------------------------------------------------------
# Signature-store unlearning: purge a revoked source (r11)
# ---------------------------------------------------------------------------


def _mm_signatures_forget(
    spark: SparkSession,
    sf_dir: str,
    modality: str,
    sig_compute,
    n_bands: int,
    ham_max: int,
) -> DataFrame:
    """Shared takedown kernel for the banded-signature modalities — the
    governance stage the image/audio stores were missing (r10 VERDICT
    item 4), mirroring :func:`..dedup.dedup_pairs_forget`'s
    rewrite-then-swap over the MinHash store: a revoked source's
    documents must leave BOTH persisted artifacts (the per-document
    signatures and the pair list), physically — a takedown that leaves a
    fingerprint of the revoked media in derived state has not taken it
    down. Because a signature depends only on its own document's bytes
    and the Hamming verify is pairwise from carried signatures, the
    surviving store is IDENTICAL whether or not the revoked documents
    were ever present, so the purge is two anti-join rewrites (sigs rows
    of revoked docs out; pairs touching any revoked doc out) and the
    oracle is the full detection SQL over the surviving corpus:
    hash-equality proves purge ≡ rebuild-without-the-source at O(store)
    rewrite cost. Marker-idempotent; pytest pins zero revoked doc_ids
    physically surviving in either parquet tree."""
    from .dedup import _pair_cache_dir
    from .text import FORGET_SOURCE
    from ..catalog import hadoop_fs, store_intact, swap_subtrees

    docs = load_table(spark, sf_dir, "documents")
    base = _pair_cache_dir(spark, sf_dir, modality=f"{modality}-forget")
    fs, built = hadoop_fs(spark, f"{base}/_BASE_READY")
    # marker AND data-dir validation: an interrupted purge swap re-heals
    # by rebuilding instead of wedging on a missing tree
    if not store_intact(
        spark, f"{base}/_BASE_READY", f"{base}/sigs", f"{base}/pairs"
    ):
        # the standing production store: the corpus was fingerprinted
        # before anyone knew the source would be revoked
        sig_compute(docs).write.mode("overwrite").parquet(f"{base}/sigs")
        bands = _explode_bands(spark.read.parquet(f"{base}/sigs"), n_bands)
        _banded_pairs(bands, bands, n_bands, ham_max).write.mode(
            "overwrite"
        ).parquet(f"{base}/pairs")
        _, half = hadoop_fs(spark, f"{base}/_FORGET_READY")
        fs.delete(half, True)  # force the purge to re-run after a re-heal
        fs.create(built, True).close()

    _, purged = hadoop_fs(spark, f"{base}/_FORGET_READY")
    if not fs.exists(purged):
        revoked = docs.filter(F.col("source") == FORGET_SOURCE).select("doc_id")
        kept_sigs = spark.read.parquet(f"{base}/sigs").join(
            revoked, "doc_id", "left_anti"
        )
        kept_pairs = (
            spark.read.parquet(f"{base}/pairs")
            .join(revoked.select(F.col("doc_id").alias("d1")), "d1", "left_anti")
            .join(revoked.select(F.col("doc_id").alias("d2")), "d2", "left_anti")
        )
        kept_sigs.write.mode("overwrite").parquet(f"{base}/sigs_next")
        kept_pairs.write.mode("overwrite").parquet(f"{base}/pairs_next")
        swap_subtrees(spark, base, ("sigs", "pairs"))
        fs.create(purged, True).close()

    return spark.read.parquet(f"{base}/pairs").orderBy("d1", "d2")


def mm_phash_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE signature-store unlearning: purge a revoked source's aHash
    signatures and every pair touching them from the persisted phash
    store, physically (rewrite-then-swap). Completes the takedown story
    across the stores: LM model (:func:`..text.text_lm_forget`), MinHash
    pair store (:func:`..dedup.dedup_pairs_forget`), ANN index
    (:func:`..similarity.sim_index_delete`), image here, audio
    :func:`mm_afp_forget`, labels :func:`..cluster.cluster_labels_forget`."""
    return _mm_signatures_forget(
        spark, sf_dir, "phash", _phash_sig_compute, PHASH_BANDS, PHASH_HAMMING_MAX
    )


def mm_afp_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO signature-store unlearning — :func:`mm_phash_forget`'s audio
    twin over the energy-profile fingerprint store."""
    return _mm_signatures_forget(
        spark, sf_dir, "audio", _afp_sig_compute, AFP_BANDS, AFP_HAMMING_MAX
    )


def _mm_forget_oracle(dedup_key: str) -> str:
    from .text import FORGET_SOURCE

    # rebuild-without-the-source: signatures are per-document
    # deterministic, so the purged store must equal detection run on the
    # surviving corpus (the dedup_pairs_forget discipline)
    sql = ORACLE_SQL[dedup_key]
    if sql.count("FROM documents") != 1:  # explicit: survives `python -O`
        raise RuntimeError(f"{dedup_key} oracle documents-scan anchor drifted")
    return sql.replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE source <> '{FORGET_SOURCE}')",
    )


ORACLE_SQL["mm_phash_forget"] = _mm_forget_oracle("mm_phash_dedup")
ORACLE_SQL["mm_afp_forget"] = _mm_forget_oracle("mm_audio_dedup")
