#!/usr/bin/env python
"""Cross-round bench regression check (r11 VERDICT item 8).

Compares a current bench artifact (default ``BENCH_LAST.json``) against
the best available prior-round baseline and flags UNCHANGED-op
regressions above ``FLAG_RATIO`` — separately for the headline lane and
the streaming lane (which got its first recorded baseline in r11 and
previously had no regression visibility at all).

Baseline resolution, best first:

1. an explicit second CLI argument;
2. the newest committed ``BENCH_QUIET_r*.json`` (full per-query maps —
   the quiet-host closing artifact bench.py writes when given a path);
3. the newest ``BENCH_r*.json`` whose ``parsed`` block carries per-query
   maps (the driver's stdout capture; headline map is tail-truncated to
   the slowest 10, so coverage is partial);
4. totals only (lane totals compared, per-query skipped with a note).

Host noise handling: per-query ratios are divided by the ratio of the
two runs' ``host_factor`` values when both artifacts carry one, so a
uniformly 1.4x-slower host does not flag 40 false regressions.

Prints one JSON line::

    {"baseline": "...", "headline": {"compared": N, "flagged": {...}},
     "stream": {"compared": N, "flagged": {...}},
     "totals": {...}, "flag_ratio": 1.5}

Exit code 0 always — the report is for PERF.md adjudication, not CI
(wall-clock on a shared host is not a deterministic gate; the plan pins
in tests/test_plans.py are the CI-grade perf contracts).

Usage::

    python tools/bench_diff.py [current.json] [baseline.json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 1.5


def _load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    # driver artifacts wrap the summary in "parsed"
    if "parsed" in data and isinstance(data.get("parsed"), dict):
        return data["parsed"]
    return data


def _round_of(path: str) -> int:
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _pick_baseline(current_path: str) -> str | None:
    cur_round = _round_of(current_path)
    candidates = []
    for pattern in ("BENCH_QUIET_r*.json", "BENCH_r*.json"):
        for p in glob.glob(os.path.join(REPO, pattern)):
            r = _round_of(p)
            if cur_round == -1 or r < cur_round or (
                cur_round == -1 and p != current_path
            ):
                if os.path.abspath(p) != os.path.abspath(current_path):
                    candidates.append((pattern.startswith("BENCH_QUIET"), r, p))
    if not candidates:
        return None
    # prefer quiet artifacts, then the newest round
    candidates.sort(key=lambda t: (t[0], t[1]))
    return candidates[-1][2]


def _load_floors() -> dict:
    """PERF_FLOORS.json (r15, VERDICT r14 item 6): op -> isolated
    steady-state floor, consolidated from the per-round PERF.md
    adjudications so flag settlement is a diff read, not prose."""
    try:
        with open(os.path.join(REPO, "PERF_FLOORS.json")) as f:
            return json.load(f).get("floors", {})
    except (OSError, ValueError):
        return {}


def _lane_diff(
    cur: dict | None, base: dict | None, calib: float, floors: dict | None = None
) -> dict:
    if not cur or not base:
        return {"compared": 0, "note": "per-query map missing on one side"}
    floors = floors or {}
    flagged = {}
    at_floor = {}
    improved = {}
    for q, t in cur.items():
        b = base.get(q)
        if not b or not t:
            continue
        ratio = round((t / b) / calib, 3)
        if ratio > FLAG_RATIO:
            entry = {"cur": t, "base": b, "calibrated_ratio": ratio}
            fl = floors.get(q, {}).get("floor_sec")
            if fl:
                entry["floor_sec"] = fl
                entry["cur_vs_floor"] = round(t / fl, 3)
            # a "regression" whose current time still sits within
            # FLAG_RATIO of the op's recorded isolated floor means the
            # BASELINE line was below-floor-fast (or this run's line is
            # mildly hosted) — auto-adjudicated, no prose needed
            if fl and t <= fl * FLAG_RATIO:
                at_floor[q] = entry
            else:
                flagged[q] = entry
        elif ratio < 1 / FLAG_RATIO:
            improved[q] = {"cur": t, "base": b, "calibrated_ratio": ratio}
    return {
        "compared": len(set(cur) & set(base)),
        "flagged": dict(sorted(flagged.items(), key=lambda kv: -kv[1]["calibrated_ratio"])),
        "flagged_at_floor": dict(
            sorted(at_floor.items(), key=lambda kv: -kv[1]["calibrated_ratio"])
        ),
        "improved": dict(sorted(improved.items(), key=lambda kv: kv[1]["calibrated_ratio"])),
    }


# mirror of bench.py's pinned frozen-op calibration subset (r13 ADVICE):
# these ops' code landed r11 or earlier and is unchanged since, so their
# cur/base ratio measures the host+harness, not the operators — the old
# all-ops median was computed over the very ops being compared, so a
# genuine lane-wide regression was indistinguishable from host noise
STREAM_CAL_SET = frozenset(
    {
        "stream_event_summary", "stream_sliding_window", "stream_static_join",
        "stream_high_activity_users", "stream_session_window",
        "stream_sessionize", "stream_dedup_events", "stream_stream_join",
        "stream_watermark_canary", "stream_parquet_sink", "stream_cdc_apply",
        "stream_cms_topk", "stream_hll_registers",
    }
)


def _stream_calibration(cur: dict | None, base: dict | None) -> float:
    """Lane-local calibrator (r12 VERDICT item 5, hardened r14): the
    median cur/base ratio over the PINNED frozen-op subset present in
    both artifacts (falls back to all common ops when fewer than 5
    frozen lines exist on both sides). Whether the result is genuinely
    host (vs a lane-wide harness change uniformly moving even frozen
    ops) is cross-checked against the headline host_calibration in the
    report — the two measure the same host, so material divergence is
    flagged instead of silently divided out."""
    import statistics

    if not cur or not base:
        return 1.0
    common = {q for q in set(cur) & set(base) if base[q] and cur[q]}
    pinned = common & STREAM_CAL_SET
    use = pinned if len(pinned) >= 5 else common
    ratios = [cur[q] / base[q] for q in use]
    return statistics.median(ratios) if ratios else 1.0


def main() -> int:
    current_path = (
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_LAST.json")
    )
    cur = _load(current_path)
    baseline_path = sys.argv[2] if len(sys.argv) > 2 else _pick_baseline(current_path)
    if not baseline_path:
        print(json.dumps({"error": "no baseline artifact found"}))
        return 0
    base = _load(baseline_path)
    floors = _load_floors()

    hf_cur, hf_base = cur.get("host_factor"), base.get("host_factor")
    calib = (hf_cur / hf_base) if (hf_cur and hf_base) else 1.0
    # calibration ratios use each side's COLD (attempt-1) map when the
    # artifact carries one (r14+), else its one-shot stream_queries map
    # (pre-r14 — which IS a cold map): cold-vs-cold comparability, so a
    # best-of-2-vs-one-shot methodology difference can't masquerade as a
    # host factor (r14 ADVICE). Per-op flags below still diff the
    # best-of-2 steady-state maps.
    stream_calib = _stream_calibration(
        cur.get("stream_queries_cold") or cur.get("stream_queries"),
        base.get("stream_queries_cold") or base.get("stream_queries"),
    )

    report = {
        "current": os.path.basename(current_path),
        "baseline": os.path.basename(baseline_path),
        "flag_ratio": FLAG_RATIO,
        "host_calibration": round(calib, 3),
        "headline": _lane_diff(
            None if cur.get("queries_truncated") else cur.get("queries"),
            None if base.get("queries_truncated") else base.get("queries"),
            calib,
            floors,
        ),
        "stream_calibration": round(stream_calib, 3),
        # cross-check (r13 ADVICE): stream vs headline calibration ratio;
        # both measure the same host, so >1.5x divergence means a
        # lane-wide NON-host change is hiding inside the stream factor
        "stream_cal_vs_host": round(stream_calib / calib, 3) if calib else None,
        "stream_cal_warning": (
            "stream calibration diverges >1.5x from host calibration — "
            "suspect a lane-wide harness/session change, not host noise"
            if calib and not (1 / 1.5 <= stream_calib / calib <= 1.5)
            else None
        ),
        # adjudication hint: a baseline whose own stream phase was
        # flagged (e.g. the stalled BENCH_QUIET_r14 lane) makes every
        # stream "improvement" here suspect — diff against the newest
        # CLEAN artifact instead
        "base_stream_stalled": bool(base.get("stream_cal_warning")),
        "stream": _lane_diff(
            cur.get("stream_queries"), base.get("stream_queries"), stream_calib, floors
        ),
        "totals": {
            "headline": {"cur": cur.get("value"), "base": base.get("value")},
            "r01_subset": {
                "cur": cur.get("value_r01_subset"),
                "base": base.get("value_r01_subset"),
            },
            "stream": {
                "cur": cur.get("stream_total"),
                "base": base.get("stream_total"),
            },
        },
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
