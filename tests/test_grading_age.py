"""Driver-row freshness contract (r10 VERDICT item 8).

r10 closed with 25 registry entries that had NEVER received a driver
row — rotation debt that accumulated silently because nothing asserted
freshness. This test makes the contract executable: every registry entry
must either have a driver-green row within the last MAX_AGE_ROUNDS
recorded rounds, or sit in the current first-50 graded window (so the
next driver run grades it). A failure here means the window rotation in
``__spark_entry__.queries()`` must be updated before shipping the round.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from grading_age import MAX_AGE_ROUNDS, WINDOW, grading_ages  # noqa: E402


def test_every_entry_fresh_or_scheduled():
    report = grading_ages()
    assert report["n_entries"] >= 226
    # never-graded entries must ALL be scheduled in the next window
    assert report["never_graded"] == [], (
        f"never-graded entries not scheduled in the first {WINDOW}: "
        f"{report['never_graded']}"
    )
    # graded entries must be fresh or scheduled for refresh
    assert report["stale"] == {}, (
        f"entries older than {MAX_AGE_ROUNDS} rounds and not in the "
        f"window: {report['stale']}"
    )


def test_median_age_stays_bounded():
    """The median graded entry should never drift older than the hard
    per-entry cap — if it does, the refresh slots are systematically
    starved even though no single entry trips the stale gate."""
    report = grading_ages()
    assert report["age_median"] is not None
    assert report["age_median"] <= MAX_AGE_ROUNDS
