"""The rotation planner (tools/rotate_window.py) and the registry's
actual window must agree on everything the freshness contract forces —
so a hand-edited window that misses a due row fails CI BEFORE the
driver grades, not after."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from grading_age import WINDOW  # noqa: E402
from rotate_window import ALWAYS, plan  # noqa: E402


def test_current_window_satisfies_the_plan():
    import __spark_entry__ as entry_mod

    current = list(entry_mod.queries())[:WINDOW]
    p = plan()
    # nothing the contract FORCES may be missing from the actual window:
    # the §2 policy rows, every never-graded entry, and every row due at
    # the next grading (minus any the planner itself had to defer)
    forced = set(ALWAYS) | set(p["never_graded"]) | (
        {n for n in p["window"] if n not in ALWAYS and n not in p["never_graded"]}
        & set(p["window"][: p["always"] + len(p["never_graded"]) + p["due_now"]])
    )
    missing = forced - set(current)
    assert not missing, f"window misses contract-forced rows: {sorted(missing)}"
    assert not p["overdue_unschedulable"], p["overdue_unschedulable"]


def test_planner_reproduces_r14_window_exactly():
    """As of r14 the saturation makes the window pure arithmetic — the
    planner and the shipped registry agree element-for-element. (If a
    future round legitimately deviates in slack-fill choices, relax THIS
    test, not test_current_window_satisfies_the_plan.)"""
    import __spark_entry__ as entry_mod

    current = list(entry_mod.queries())[:WINDOW]
    assert plan()["window"] == current
