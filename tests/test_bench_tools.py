"""Bench adjudication tooling (r12: VERDICT r11 items 1 + 8).

No Spark here — these pin the pure-Python calibration/diff logic that
PERF.md adjudication rests on: host_factor is the MEDIAN ratio over the
frozen r01 subset (robust to one genuine regression), and bench_diff
divides per-query ratios by the two runs' host-factor ratio so a
uniformly slower host flags nothing.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_host_factor_is_median_over_r01_subset():
    sys.path.insert(0, str(REPO))
    import bench

    r01 = json.load(open(REPO / "BENCH_r01.json"))["parsed"]["queries"]
    # a uniform 2x-inflated run of the exact r01 queries -> factor 2.0
    timings = {q: t * 2 for q, t in r01.items()}
    assert bench.host_factor(timings) == 2.0
    # one genuinely regressed query must not move the median
    timings[next(iter(timings))] *= 50
    assert bench.host_factor(timings) == 2.0
    # no overlap -> None, not a crash
    assert bench.host_factor({"not_a_query": 1.0}) is None


def test_bench_diff_calibrates_away_uniform_host_inflation(tmp_path):
    # stream lane: uniformly 2x-inflated host (s1-s3) plus one real
    # regression — the lane-local median calibrator (r12 VERDICT item 5)
    # must divide out the 2x and flag only s_bad
    cur = {
        "value": 100.0,
        "host_factor": 2.0,
        "queries": {"steady": 2.0, "regressed": 4.0},
        "stream_queries": {"s1": 10.0, "s2": 6.0, "s3": 4.0, "s_bad": 40.0},
        "stream_total": 60.0,
    }
    base = {
        "value": 50.0,
        "host_factor": 1.0,
        "queries": {"steady": 1.0, "regressed": 1.0},
        "stream_queries": {"s1": 5.0, "s2": 3.0, "s3": 2.0, "s_bad": 5.0},
        "stream_total": 15.0,
    }
    cp, bp = tmp_path / "cur.json", tmp_path / "base.json"
    cp.write_text(json.dumps(cur))
    bp.write_text(json.dumps(base))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"), str(cp), str(bp)],
        capture_output=True,
        text=True,
        check=True,
    )
    report = json.loads(out.stdout)
    assert report["host_calibration"] == 2.0
    # the uniformly-inflated query is NOT flagged; the real one is
    assert "steady" not in report["headline"]["flagged"]
    assert report["headline"]["flagged"]["regressed"]["calibrated_ratio"] == 2.0
    assert report["stream_calibration"] == 2.0
    assert not {"s1", "s2", "s3"} & set(report["stream"]["flagged"])
    assert report["stream"]["flagged"]["s_bad"]["calibrated_ratio"] == 4.0


def test_bench_diff_skips_truncated_per_query_maps(tmp_path):
    """Driver artifacts tail-truncate the headline map to the slowest 10;
    diffing those against a full map would flag the wrong things — the
    lane must be skipped with a note, totals still reported."""
    cur = {
        "value": 10.0,
        "queries": {"a": 9.0},
        "queries_truncated": True,
        "stream_queries": {"s": 1.0},
        "stream_total": 1.0,
    }
    base = {
        "value": 8.0,
        "queries": {"a": 1.0, "b": 1.0},
        "stream_queries": {"s": 1.0},
        "stream_total": 1.0,
    }
    cp, bp = tmp_path / "cur.json", tmp_path / "base.json"
    cp.write_text(json.dumps(cur))
    bp.write_text(json.dumps(base))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"), str(cp), str(bp)],
        capture_output=True,
        text=True,
        check=True,
    )
    report = json.loads(out.stdout)
    assert report["headline"]["compared"] == 0
    assert report["stream"]["compared"] == 1
    assert report["totals"]["headline"] == {"cur": 10.0, "base": 8.0}


def test_stream_host_factor_uses_pinned_subset_and_cold_lines():
    """r14 (r13 ADVICE): the stream calibrator reads ONLY the pinned
    frozen-op subset — a non-pinned op (whose code may legitimately
    change) cannot move it, however wild its line is. r15: the baseline
    is the newest committed CLEAN quiet artifact (stalled stream
    phases, i.e. a non-null stream_cal_warning, are skipped) and the
    chosen artifact name is returned in-band."""
    sys.path.insert(0, str(REPO))
    import bench

    bname, bcold = bench._stream_cal_baseline()
    assert bname is not None and len(bcold) >= 5
    # the resolved baseline is clean by construction
    art = json.load(open(REPO / bname))
    assert not art.get("stream_cal_warning")
    cold = {q: bcold[q] * 3 for q in bench.STREAM_CAL_SET if q in bcold}
    assert len(cold) >= 5
    assert bench.stream_host_factor(cold) == (3.0, bname)
    # a 100x line on a NON-pinned op is invisible to the calibrator
    if "stream_phash_append" in bcold:
        cold["stream_phash_append"] = bcold["stream_phash_append"] * 100
        assert bench.stream_host_factor(cold) == (3.0, bname)
    # no pinned overlap -> None factor, not a crash
    assert bench.stream_host_factor({"stream_phash_append": 1.0})[0] is None


def test_stream_cal_baseline_skips_stalled_artifacts():
    """The committed r14 quiet artifact's stream phase crossed a host
    stall (warning in-band) — the resolver must never pick it."""
    sys.path.insert(0, str(REPO))
    import bench

    r14 = REPO / "BENCH_QUIET_r14.json"
    if r14.exists() and json.load(open(r14)).get("stream_cal_warning"):
        name, _ = bench._stream_cal_baseline()
        assert name != "BENCH_QUIET_r14.json"


def test_bench_diff_stream_calibration_pinned_and_cross_checked(tmp_path):
    """The diff-side calibrator anchors on the pinned frozen ops (a
    lane-wide slowdown confined to NON-pinned ops is flagged, not
    divided out), and material stream-vs-host divergence raises the
    cross-check warning instead of passing silently."""
    pinned = [
        "stream_event_summary", "stream_sliding_window", "stream_static_join",
        "stream_high_activity_users", "stream_session_window",
    ]
    base_stream = {q: 2.0 for q in pinned} | {"stream_x": 2.0, "stream_y": 2.0}
    # pinned ops steady (host 1x); the two non-pinned ops regress 4x
    cur_stream = {q: 2.0 for q in pinned} | {"stream_x": 8.0, "stream_y": 8.0}
    cur = {
        "value": 10.0,
        "host_factor": 1.0,
        "queries": {"a": 1.0},
        "stream_queries": cur_stream,
        "stream_total": sum(cur_stream.values()),
    }
    base = {
        "value": 10.0,
        "host_factor": 1.0,
        "queries": {"a": 1.0},
        "stream_queries": base_stream,
        "stream_total": sum(base_stream.values()),
    }
    cp, bp = tmp_path / "cur.json", tmp_path / "base.json"
    cp.write_text(json.dumps(cur))
    bp.write_text(json.dumps(base))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"), str(cp), str(bp)],
        capture_output=True,
        text=True,
        check=True,
    )
    report = json.loads(out.stdout)
    # pinned median is 1.0 — the old all-ops median would have been 1.0
    # too here, but with most ops regressed it would swallow the shift;
    # assert the regressed non-pinned ops ARE flagged under the pinned
    # calibration
    assert report["stream_calibration"] == 1.0
    assert {"stream_x", "stream_y"} <= set(report["stream"]["flagged"])
    assert report["stream_cal_warning"] is None

    # now a LANE-WIDE 4x shift (pinned ops too) with an unmoved headline
    # host factor: divergence must raise the warning
    cur["stream_queries"] = {q: v * 4 for q, v in base_stream.items()}
    cp.write_text(json.dumps(cur))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"), str(cp), str(bp)],
        capture_output=True,
        text=True,
        check=True,
    )
    report = json.loads(out.stdout)
    assert report["stream_calibration"] == 4.0
    assert report["stream_cal_vs_host"] == 4.0
    assert report["stream_cal_warning"] is not None
