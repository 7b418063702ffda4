#!/usr/bin/env python
"""Grading-window rotation planner (r14).

The driver grades the first WINDOW entries of ``__spark_entry__.queries()``
and ``tools/grading_age.py`` enforces the freshness contract. With the
registry saturated (43 rotation slots/round vs ~43-row cohorts), the next
window is ARITHMETIC, not judgement — this tool computes it so a round
can start from a verified plan instead of re-deriving the slot math:

* the always-graded §2 reference rows (policy: every round);
* every never-graded registered entry (the contract REQUIRES these in the
  window);
* rows whose age reaches MAX_AGE_ROUNDS at the next grading (due now),
  oldest-first, alphabetical within a cohort;
* then, slack permitting, the oldest not-yet-due rows.

Prints one JSON line::

    {"next_round": N, "window": [...50 names...], "due_now": K,
     "deferred_due": [...], "slack": S}

``deferred_due`` non-empty means MORE due rows than slots: those rows grade
at age MAX+1 and MUST head the round-after's window — the tool front-loads
them automatically next time since they will be the oldest. Exit 1 if any
deferred row would exceed age MAX+1 (the contract cannot be met by
scheduling alone — the window must shrink additions).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from grading_age import MAX_AGE_ROUNDS, WINDOW, grading_ages  # noqa: E402

# the §2 reference surface — graded every round by policy
ALWAYS = [
    "view1_client_transaction_counts",
    "view2_monthly_transaction_summary",
    "view3_high_transaction_accounts",
    "t1_union_pages",
    "t3_dedup_keep_first",
    "t4_numeric_coercion",
    "d2_completion_counts",
]


def plan() -> dict:
    import glob
    import os
    import re

    import __spark_entry__ as entry_mod

    repo = Path(__file__).resolve().parents[1]
    names = list(entry_mod.queries())
    last: dict[str, int] = {}
    max_r = 0
    for p in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        max_r = max(max_r, r)
        for k in json.load(open(p)):
            last[k] = max(last.get(k, 0), r)
    next_round = max_r + 1

    window = list(ALWAYS)
    never = [n for n in names if n not in last and n not in window]
    window += never  # contract: never-graded must be scheduled

    # rows by urgency: age AFTER the next grading if not regraded
    rest = sorted(
        (n for n in names if n in last and n not in ALWAYS),
        key=lambda n: (last[n], n),
    )
    due = [n for n in rest if next_round - last[n] >= MAX_AGE_ROUNDS]
    free = WINDOW - len(window)
    take, deferred = due[:free], due[free:]
    window += take
    free = WINDOW - len(window)
    if free > 0:
        window += [n for n in rest if n not in set(window)][:free]

    # a deferred row grades next round at age MAX+2 only if it was ALREADY
    # at the wall — that breaks the contract outright
    overdue = [
        n for n in deferred if next_round - last[n] > MAX_AGE_ROUNDS
    ]
    return {
        "next_round": next_round,
        "window": window[:WINDOW],
        "n_window": min(len(window), WINDOW),
        "always": len(ALWAYS),
        "never_graded": never,
        "due_now": len(due),
        "deferred_due": deferred,
        "overdue_unschedulable": overdue,
        "slack": WINDOW - len(ALWAYS) - len(never) - len(due),
    }


def main() -> int:
    p = plan()
    print(json.dumps(p))
    return 1 if p["overdue_unschedulable"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
