"""File-based sinks: hive-partitioned parquet and bucketed tables.

Not in the reference (its only sink is Postgres, SURVEY.md §2.12) — but at
100 TB the dominant sink is partitioned columnar storage, and bucketing is
the standard way to pre-pay a join shuffle once at write time:

* **partitioned parquet** — one directory per partition value; readers with
  a partition predicate scan only matching directories (partition pruning,
  visible as PartitionFilters in the plan). Partition columns should be
  low-cardinality (date, region), never keys.
* **bucketed tables** — rows hash-distributed into N buckets on the join
  key at write time; two tables bucketed the same way join with NO exchange
  on either side (the scan itself satisfies the distribution requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-layout parquet write. Callers add the partition column(s)
    beforehand (e.g. a ship_month derived from the event time) so the
    partitioning expression is visible in the frame's lineage."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table. Joining two tables
    bucketed on the same key with the same bucket count runs shuffle-free;
    sortBy additionally removes the sort from sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
