"""Cross-engine-safe scalar column builders.

These are the shared primitives behind the hashing / quantization idioms
used across ``operators/`` and ``queries/``: integer-only arithmetic on
md5-derived values, so Spark and the DuckDB oracle hash-match exactly.
Each docstring records the DuckDB-SQL equivalent (verified on pyspark
4.1.2 / duckdb 1.0.0).

Scale notes: all builders are pure row-local expressions — they stay
inside whole-stage codegen, vectorize, and never force a shuffle or a
Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int64(col: Column | str) -> Column:
    """Stable non-negative int64 from any string: first 15 hex chars of
    md5 (60 bits — stays in signed range).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def stable_bucket(col: Column | str, n_buckets: int) -> Column:
    """Deterministic bucket id in [0, n_buckets) — partitioner / salting /
    sampling key that is reproducible across engines and cluster sizes
    (unlike ``spark_partition_id`` or ``rand``).

    DuckDB equivalent: ``('0x' || substr(md5(x),1,15))::BIGINT % n``
    (md5_int64 is non-negative, so ``%`` == ``pmod``).
    """
    return md5_int64(col) % n_buckets


def money_cents(col: Column | str) -> Column:
    """Exact integer cents from a double money column: ``floor(x * 100)``
    then cast. floor-before-cast is load-bearing — DuckDB ``CAST(double AS
    BIGINT)`` rounds while Spark truncates, but ``floor`` agrees bit-for-bit.

    DuckDB equivalent: ``CAST(floor(x * 100) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("double") * 100).cast("bigint")


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization, identical to DuckDB
    ``regexp_split_to_array(text, '\\s+')`` (both keep a leading empty
    string when the text has leading whitespace).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")
