"""Fixture-contract tests: local green must predict driver green.

Round 4 regression postmortem: the driver fixture's events.ts parquet unit
changed (nanos -> micros) between rounds; the repo's hard-coded nanos
assumption collapsed every timestamp into a 43-minute span on 1970-01-20
while all 151 unit tests stayed green, because none of them read the REAL
fixture and asserted a sane ts range or cross-checked DuckDB.

These tests close that gap:

- the batch read (catalog.load_table) and the streaming read
  (streaming.views_stream._stream_events) of the real events fixture must
  both land in the corpus's [2024-01-01, 2024-02-01) window and agree with
  DuckDB's independent read of the same file (min/max/count);
- batch and streaming aggregation over the same fixture must be identical
  (pins the two readers against ever diverging on unit handling again).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from zylyty_data_engineer_challenge_spark.catalog import load_table

TS_LO = datetime.datetime(2024, 1, 1)
TS_HI = datetime.datetime(2024, 2, 1)


def _duck_minmax(sf_dir: str):
    con = duckdb.connect()
    lo, hi, n = con.execute(
        f"SELECT min(ts), max(ts), count(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    con.close()
    return lo, hi, n


def _spark_minmax(df):
    row = df.selectExpr("min(ts) lo", "max(ts) hi", "count(*) n").collect()[0]
    return row["lo"], row["hi"], row["n"]


def test_events_batch_read_matches_duckdb(spark, sf_dir):
    lo, hi, n = _spark_minmax(load_table(spark, sf_dir, "events"))
    assert TS_LO <= lo <= hi < TS_HI, f"events ts range insane: {lo}..{hi}"
    dlo, dhi, dn = _duck_minmax(sf_dir)
    assert (lo, hi, n) == (dlo, dhi, dn)


def test_events_stream_read_matches_batch(spark, sf_dir):
    """Run the streaming reader through a memory sink and compare min/max/
    count against the batch reader — any unit divergence between
    catalog.load_table and _stream_events fails here."""
    import uuid

    from zylyty_data_engineer_challenge_spark.streaming.views_stream import (
        _stream_events,
    )

    sink = f"fixture_contract_{uuid.uuid4().hex[:8]}"
    q = (
        _stream_events(spark, sf_dir)
        .selectExpr("min(ts) lo", "max(ts) hi", "count(*) n")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table(sink).collect()[0]
    assert (row["lo"], row["hi"], row["n"]) == _spark_minmax(
        load_table(spark, sf_dir, "events")
    )
    assert TS_LO <= row["lo"] < TS_HI


def test_stream_event_summary_equals_batch_window_agg(spark, sf_dir):
    """VERDICT r4 item 6: the streaming windowed summary over the fixture
    must equal the same windowed aggregate computed in batch — catches any
    future source-reader divergence between the two paths."""
    from zylyty_data_engineer_challenge_spark.streaming.views_stream import (
        stream_event_summary,
        windowed_event_summary,
    )

    streamed = stream_event_summary(spark, sf_dir)
    batch = windowed_event_summary(load_table(spark, sf_dir, "events")).orderBy(
        "window_start", "event_type"
    )
    assert streamed.columns == batch.columns
    assert streamed.collect() == batch.collect()


@pytest.mark.parametrize("table", ["lineitem", "orders", "documents"])
def test_row_counts_match_duckdb(spark, sf_dir, table):
    """Cheap cross-engine row-count pin for the other hot tables."""
    con = duckdb.connect()
    dn = con.execute(f"SELECT count(*) FROM '{sf_dir}/{table}.parquet'").fetchone()[0]
    con.close()
    assert load_table(spark, sf_dir, table).count() == dn


def test_events_ts_unit_sniff_fails_loud_on_ambiguous_int64(tmp_path):
    """Code-review r5 finding: a raw int64 ts column has no unit metadata;
    assuming nanos would recreate the r4 unit-corruption bug for an int64
    micros fixture. The sniff must accept real TIMESTAMP units, use footer
    stats to confirm nanos-magnitude int64, and raise on anything else."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zylyty_data_engineer_challenge_spark.catalog import events_ts_is_nanos

    def write(name, arr):
        p = str(tmp_path / name)
        pq.write_table(pa.table({"ts": arr}), p)
        return p

    nanos_raw = write("n.parquet", pa.array([1_700_000_000_000_000_000], pa.int64()))
    micros_raw = write("m.parquet", pa.array([1_700_000_000_000_000], pa.int64()))
    micros_ts = write("u.parquet", pa.array([1_700_000_000_000_000], pa.timestamp("us")))

    assert events_ts_is_nanos(nanos_raw) is True
    assert events_ts_is_nanos(micros_ts) is False
    with pytest.raises(ValueError, match="not epoch nanos"):
        events_ts_is_nanos(micros_raw)


def test_events_ts_sniff_spark_probe_branch(spark, tmp_path, monkeypatch):
    """r6 VERDICT item 8: force the no-pyarrow Spark-probe fallback and
    assert it (a) answers correctly for MICROS and NANOS files even on a
    warmed session where a prior events load set the legacy nanos conf,
    (b) restores that conf after probing, (c) fails LOUD on a raw int64
    ts it cannot unit-check without footer stats, and (d) caches per
    source identity so a rewritten fixture re-sniffs."""
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    from zylyty_data_engineer_challenge_spark.catalog import (
        clear_ts_unit_cache,
        events_ts_is_nanos,
    )

    def write(name, arr):
        p = str(tmp_path / name)
        pq.write_table(pa.table({"ts": arr}), p)
        return p

    nanos_ts = write("n.parquet", pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")))
    micros_ts = write("u.parquet", pa.array([1_700_000_000_000_000], pa.timestamp("us")))
    raw_int = write("r.parquet", pa.array([1_700_000_000_000_000], pa.int64()))

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    clear_ts_unit_cache()
    # make `import pyarrow.parquet` raise ImportError inside the sniff
    monkeypatch.setitem(sys.modules, "pyarrow.parquet", None)
    # simulate a warmed session: a prior nanos events load set the conf
    spark.conf.set(conf_key, "true")
    try:
        assert events_ts_is_nanos(micros_ts, spark) is False
        assert spark.conf.get(conf_key) == "true", "probe must restore conf"
        assert events_ts_is_nanos(nanos_ts, spark) is True
        assert spark.conf.get(conf_key) == "true"
        with pytest.raises(ValueError, match="raw int64"):
            events_ts_is_nanos(raw_int, spark)

        # (d) cache keyed on (path, mtime, size): rewrite micros->nanos at
        # the same path and the answer must flip, not replay stale cache
        monkeypatch.delitem(sys.modules, "pyarrow.parquet")
        pq.write_table(
            pa.table({"ts": pa.array([1_700_000_000_000_000_000, 1], pa.timestamp("ns"))}),
            micros_ts,
        )
        monkeypatch.setitem(sys.modules, "pyarrow.parquet", None)
        assert events_ts_is_nanos(micros_ts, spark) is True
    finally:
        spark.conf.unset(conf_key)
        clear_ts_unit_cache()
