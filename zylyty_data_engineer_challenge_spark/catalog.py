"""Table loading / temp-view registration for the driver test corpus.

Reads are plain ``spark.read.parquet`` with the explicit schemas from
:mod:`.schemas` — Catalyst then gets predicate pushdown, column pruning, and
partition pruning for free on every downstream query. At cluster scale the
same code path works against a 100 TB directory tree; nothing here
materializes data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import EVENTS_RAW, TESTDATA_SCHEMAS, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def convert_event_ts(df: DataFrame) -> DataFrame:
    """events.ts arrives as raw epoch nanos (see schemas.EVENTS_RAW);
    truncate to micros — integer div, matching DuckDB's nanos handling —
    and expose a proper TimestampType column."""
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table with its explicit schema (no inference)."""
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) — set the legacy conf here (it is a
        # runtime SQL conf) so the read works on ANY session, not only ones
        # built by .session.get_spark
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(EVENTS_RAW).parquet(f"{sf_dir}/events.parquet")
        return convert_event_ts(raw)
    schema = TESTDATA_SCHEMAS[name]
    return spark.read.schema(schema).parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view (for the SQL API path)."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
