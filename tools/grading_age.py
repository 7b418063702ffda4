#!/usr/bin/env python
"""Driver-row freshness audit (r10 VERDICT item 8).

Every registry entry should carry a reasonably fresh driver-graded row —
the window rotation is manual, so rotation debt (r10 ended with 25
entries that had NEVER been graded) can silently accumulate unless it is
measured. This tool reads every ``CORRECTNESS_r*.json`` beside the repo
root, computes rounds-since-last-driver-row per registry entry relative
to the newest recorded round, and prints one JSON line::

    {"current_round": N+1, "max_recorded_round": N,
     "n_entries": ..., "never_graded": [...],
     "scheduled_next_window": [... first-50 names ...],
     "age_max": ..., "age_median": ...,
     "stale": {name: age, ...}}   # entries older than MAX_AGE_ROUNDS
                                  # and not scheduled in the next window

``tests/test_grading_age.py`` asserts the freshness contract directly:
every entry is either graded within MAX_AGE_ROUNDS or sits in the
current first-50 window (i.e. will be graded next run) — so window
rotation debt fails CI instead of waiting for a judge to notice.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# an entry may go at most this many rounds without a driver row unless it
# is scheduled in the next graded window; 6 = one full rotation of the
# ~176 off-window entries through the ~15 refresh slots per round would
# exceed this, which is the point — refresh slots must prioritize age
MAX_AGE_ROUNDS = 6
WINDOW = 50  # the driver grades the first WINDOW queries() entries


def grading_ages() -> dict:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    last: dict[str, int] = {}
    max_r = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        max_r = max(max_r, r)
        for k in json.load(open(path)):
            last[k] = max(last.get(k, 0), r)
    ages = {n: max_r - last[n] for n in names if n in last}
    never = [n for n in names if n not in last]
    window = set(names[:WINDOW])
    stale = {
        n: a
        for n, a in sorted(ages.items(), key=lambda kv: -kv[1])
        if a > MAX_AGE_ROUNDS and n not in window
    }
    return {
        "current_round": max_r + 1,
        "max_recorded_round": max_r,
        "n_entries": len(names),
        "n_graded_ever": len(ages),
        "never_graded": [n for n in never if n not in window],
        "never_graded_scheduled": [n for n in never if n in window],
        "age_max": max(ages.values()) if ages else None,
        "age_median": statistics.median(ages.values()) if ages else None,
        "stale": stale,
    }


def main() -> int:
    print(json.dumps(grading_ages()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
