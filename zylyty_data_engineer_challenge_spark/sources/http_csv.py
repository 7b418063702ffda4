"""S1/S2 — authenticated HTTP CSV sources (reference main.py:62-87).

Reference semantics preserved exactly:

* ``GET {base_url}/download/{name}.csv`` with ``Authorization: Bearer`` and a
  10 s timeout (main.py:63-66);
* **any** failure (network, HTTP status, parse) yields an *empty* DataFrame
  — the pipeline loads what it can (main.py:71-73, SURVEY.md §8.4).

Spark-first shape: the body is spooled to a temp file and read with
``spark.read.csv`` under an explicit schema — so the parse happens in the
JVM's vectorized CSV reader, types are declared (never inferred), and the
same code path handles a multi-GB body without driver-side row
materialization. (The reference parses with pandas in driver memory,
main.py:68-69.)
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

try:
    import requests
except ImportError:  # pragma: no cover - requests is stdlib-adjacent here
    requests = None

DEFAULT_TIMEOUT = 10.0  # main.py:66


def _empty(spark: SparkSession, schema: T.StructType) -> DataFrame:
    return spark.createDataFrame([], schema)


def fetch_csv(
    spark: SparkSession,
    base_url: str,
    name: str,
    token: str,
    schema: T.StructType,
    timeout: float = DEFAULT_TIMEOUT,
) -> DataFrame:
    """Fetch ``{base_url}/download/{name}.csv`` into a typed DataFrame.

    Returns an empty DataFrame (with the right schema) on any failure,
    mirroring the reference's silent-failure ethos (main.py:71-73).
    """
    if requests is None:
        return _empty(spark, schema)
    try:
        resp = requests.get(
            f"{base_url}/download/{name}.csv",
            headers={"Authorization": f"Bearer {token}"},
            timeout=timeout,
        )
        resp.raise_for_status()
        body = resp.content
    except Exception:
        return _empty(spark, schema)

    try:
        fd, path = tempfile.mkstemp(suffix=f"_{name}.csv")
        with os.fdopen(fd, "wb") as f:
            f.write(body)
        return (
            spark.read.schema(schema)
            .option("header", True)
            .option("mode", "PERMISSIVE")
            .csv(path)
        )
    except Exception:
        return _empty(spark, schema)
