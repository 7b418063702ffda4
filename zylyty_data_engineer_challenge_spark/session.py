"""SparkSession factory.

Local test runs use ``local[N]`` (single JVM); production would pass a real
master. Session defaults are chosen for correctness-vs-oracle (UTC
timestamps, ANSI off so try_cast/coercion semantics are uniform) and for
scale (AQE on, Arrow on, shuffle partitions sized to the environment instead
of the 200 default).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))


def get_spark(
    app_name: str = "zylyty-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    - AQE enabled: runtime partition coalescing + skew-join handling mean
      the same plan survives a 100x scale-up without hand-retuning.
    - ``spark.sql.shuffle.partitions`` defaults to the local core count; on
      a real cluster pass ~2-3x total executor cores.
    - Session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle (UTC-naive) and are cluster-location-independent.
    """
    cpus = int(shuffle_partitions or _CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # events.ts unit handling lives in catalog.load_table, which sniffs
        # the parquet footer and only enables the legacy nanosAsLong conf
        # (runtime-settable) when the column really is TIMESTAMP(NANOS).
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
