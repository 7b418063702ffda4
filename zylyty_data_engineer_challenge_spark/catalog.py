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

from .schemas import EVENTS, EVENTS_RAW, TESTDATA_SCHEMAS, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Sniff results per source identity: the remote-FS fallback probes Spark's
# schema resolution, which must run WITHOUT the legacy nanosAsLong conf (a
# prior events load sets it); caching makes the sniff one-shot per source so
# the probe never races the conf state of an already-warmed session. The key
# includes (mtime, size) when the path is driver-statable, so a fixture
# REWRITTEN at the same path with a different ts unit re-sniffs instead of
# silently reusing the stale answer; remote paths fall back to path-only
# keys (their fixtures don't churn under a live session).
_TS_UNIT_CACHE: dict[tuple, bool] = {}


def _ts_cache_key(events_path: str) -> tuple:
    try:
        st = os.stat(events_path)
        return (events_path, st.st_mtime_ns, st.st_size)
    except OSError:
        return (events_path,)


def clear_ts_unit_cache() -> None:
    """Drop all cached sniff results (test harnesses that rewrite fixtures
    in-place within one process)."""
    _TS_UNIT_CACHE.clear()


def events_ts_is_nanos(events_path: str, spark: SparkSession | None = None) -> bool:
    """Sniff the parquet footer: does ``ts`` need the legacy nanos read path?

    Returns True when the column is TIMESTAMP(NANOS) (which Spark's reader
    rejects as a timestamp). For the standard units (us/ms/s) Spark reads
    TimestampType natively and no conversion is needed. One footer read on
    the driver — O(KB) regardless of data scale.

    A raw int64 ``ts`` has NO unit metadata; guessing recreates the r4
    unit-corruption bug, so the footer's column statistics decide: an
    epoch-nanos value for any plausible date is ~1e18 while micros is
    ~1e15 — three orders of magnitude apart. Ambiguous or missing stats
    fail LOUD instead of silently collapsing every timestamp.

    The pyarrow footer read only works on driver-visible filesystems; on
    a remote path (hdfs://, s3a://) it falls back to probing Spark's own
    schema resolution, which raises a legacy-conf error iff the column is
    TIMESTAMP(NANOS) — filesystem-agnostic, same answer.
    """
    key = _ts_cache_key(events_path)
    cached = _TS_UNIT_CACHE.get(key)
    if cached is not None:
        return cached
    result = _sniff_events_ts(events_path, spark)
    _TS_UNIT_CACHE[key] = result
    return result


def _sniff_events_ts(events_path: str, spark: SparkSession | None) -> bool:
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(events_path)
        t = f.schema_arrow.field("ts").type
        unit = getattr(t, "unit", None)
        if unit is not None:
            return unit == "ns"
        # raw int64: decide by magnitude from footer stats (no data scan)
        idx = f.schema_arrow.get_field_index("ts")
        stats = f.metadata.row_group(0).column(idx).statistics
        if stats is None or stats.min is None:
            raise ValueError(
                f"events ts at {events_path} is raw int64 with no column "
                "statistics — cannot infer the epoch unit; fix the fixture "
                "or declare the unit explicitly"
            )
        if stats.min > 10**17:  # epoch nanos: ~1e18 for any modern date
            return True
        raise ValueError(
            f"events ts at {events_path} is raw int64 with min={stats.min}"
            " — not epoch nanos; add a conversion for this unit instead of"
            " guessing"
        )
    except (OSError, ImportError):
        # non-local filesystem (or no pyarrow): let Spark resolve the
        # footer. A NANOS column makes schema resolution raise the
        # nanosAsLong guidance error; a schema whose ts resolves to a
        # native TimestampType means a standard unit. A ts that resolves
        # to LongType is a RAW int64 with no unit metadata — the pyarrow
        # path decides that case from footer stats, which this probe
        # cannot see, so it must fail loud here rather than let a later
        # int64-to-timestamp read error mask the real problem. The probe
        # is only meaningful with the legacy conf OFF — a prior events
        # load may have set it, so unset for the probe and restore after
        # (the sniff is cached, but restore anyway so the session conf is
        # never left mutated by a probe). NOT thread-safe: the unset/
        # probe/restore window assumes the single-threaded driver usage
        # this repo has throughout — a concurrent thread planning a nanos
        # events read during the window would fail; guard with a shared
        # lock before adding driver-side threading.
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.unset(conf_key)
        try:
            resolved = spark.read.parquet(events_path).schema
            from pyspark.sql import types as T

            ts_type = resolved["ts"].dataType
            if isinstance(ts_type, T.LongType):
                raise ValueError(
                    f"events ts at {events_path} is raw int64 and the "
                    "parquet footer is not driver-readable — cannot infer "
                    "the epoch unit; install pyarrow, make the path "
                    "driver-visible, or declare the unit explicitly"
                )
            return False
        except ValueError:
            raise
        except Exception as e:
            # Spark <4 raises the nanosAsLong guidance; Spark 4 raises
            # [PARQUET_TYPE_ILLEGAL] Illegal Parquet type: INT64
            # (TIMESTAMP(NANOS,false)) — both mean the same thing. (The
            # r6 matcher only knew the former; this branch was first
            # exercised by tests/test_fixture_contract.py this round.)
            msg = str(e)
            if "nanosAsLong" in msg or "TIMESTAMP(NANOS" in msg:
                return True
            raise
        finally:
            if prior is not None:
                spark.conf.set(conf_key, prior)


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any scheme — local file paths and hdfs/s3a
    resolve through the same API, so existence checks and marker writes
    work identically on a laptop and a cluster. Shared by every durable
    artifact (ANN index, format migrations, near-dup pair cache)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def artifact_ready(spark: SparkSession, marker_path: str) -> bool:
    """Existence check for a durable-artifact ready marker that works on
    remote filesystems too — a driver-local ``os.path.exists`` would
    never see an hdfs/s3a marker, silently demoting 'build once per
    source identity' to 'rebuild every call'."""
    fs, marker = hadoop_fs(spark, marker_path)
    return fs.exists(marker)


def store_intact(spark: SparkSession, marker_path: str, *data_paths: str) -> bool:
    """Marker-AND-data existence check for a rewrite-then-swap store: a
    crash inside a purge swap can leave the ready marker present while a
    data directory is mid-rename, and a marker-only check then skips the
    rebuild and wedges every later read on the missing path. Validating
    the data directories alongside the marker makes an interrupted swap
    re-heal (the caller rebuilds) instead of wedging."""
    fs, marker = hadoop_fs(spark, marker_path)
    if not fs.exists(marker):
        return False
    return all(fs.exists(hadoop_fs(spark, p)[1]) for p in data_paths)


def swap_subtrees(spark: SparkSession, base: str, names) -> None:
    """Crash-safe commit of a rewrite-then-swap purge: for each ``name``,
    ``<name>_next`` replaces ``<name>`` by renaming the live tree ASIDE
    (``<name>_trash``), renaming the rewritten tree in, then deleting the
    trash — never delete-before-rename, so no crash point loses both
    copies and the live path is absent only between the two renames (an
    interrupted swap is then healed by the caller's :func:`store_intact`
    rebuild; the old delete-first order left a marker-complete store with
    the data directory gone and no self-repair). Any ``_trash`` debris
    from a previous interrupted swap is cleared first."""
    for name in names:
        fs, old = hadoop_fs(spark, f"{base}/{name}")
        _, nxt = hadoop_fs(spark, f"{base}/{name}_next")
        _, trash = hadoop_fs(spark, f"{base}/{name}_trash")
        if fs.exists(trash):
            fs.delete(trash, True)
        if fs.exists(old):
            if not fs.rename(old, trash):
                raise RuntimeError(f"swap_subtrees: rename-aside failed for {name}")
        if not fs.rename(nxt, old):
            raise RuntimeError(f"swap_subtrees: rename-in failed for {name}")
        fs.delete(trash, True)


def source_identity(spark: SparkSession, src: str) -> str:
    """Content identity of a source path: ``path:mtime:size:nfiles``.

    Local paths resolve through ``os.stat``; anything that is not
    driver-statable (hdfs://, s3a://, or any scheme the local OS can't
    see) resolves through the Hadoop FileSystem API instead — content
    summary length + file count + max file modification time over a
    RECURSIVE listing (a regenerated source whose churn is confined to
    nested subdirectories would keep unchanged top-level mtimes) — so a
    REGENERATED remote source at the same path still changes identity.
    Used to key every durable artifact derived from a source (stream
    sinks/checkpoints, persisted ANN indexes) so stale state can never be
    reused against regenerated data, while unchanged data reuses it by
    construction.
    """
    try:
        st = os.stat(src)
        return f"{src}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        pass
    # remote path: ask the filesystem that will actually serve the reads
    fs, hpath = hadoop_fs(spark, src)
    status = fs.getFileStatus(hpath)
    if status.isDirectory():
        summary = fs.getContentSummary(hpath)
        size = summary.getLength()
        nfiles = summary.getFileCount()
        mtime = status.getModificationTime()
        it = fs.listFiles(hpath, True)  # recursive: nested churn counts
        while it.hasNext():
            mtime = max(mtime, it.next().getModificationTime())
        return f"{src}:{mtime}:{size}:{nfiles}"
    size = status.getLen()
    mtime = status.getModificationTime()
    return f"{src}:{mtime}:{size}"


def convert_event_ts(df: DataFrame) -> DataFrame:
    """Raw epoch-nanos ``ts`` (see schemas.EVENTS_RAW) -> TimestampType,
    truncating to micros (integer div, matching DuckDB's nanos handling)."""
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table with its explicit schema (no inference)."""
    if name == "events":
        path = f"{sf_dir}/events.parquet"
        if events_ts_is_nanos(path, spark):
            # TIMESTAMP(NANOS): read the raw int64 under the legacy conf
            # (runtime-settable, so this works on ANY session) and convert.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return convert_event_ts(spark.read.schema(EVENTS_RAW).parquet(path))
        # TIMESTAMP(MICROS/MILLIS/SECONDS): native TimestampType read.
        return spark.read.schema(EVENTS).parquet(path)
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
