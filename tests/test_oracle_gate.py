"""Full-registry oracle gate (VERDICT r4 item 7).

The driver's per-round correctness run grades only the first 50 registry
entries, so a red query past position 50 can hide for rounds. This test
runs the SAME differential check (tools/oracle_check.py: Spark vs DuckDB,
row count + column set + order-insensitive value hash) over ALL registered
queries at sf0.001 and fails the suite if any single one diverges —
local green then implies driver green regardless of the 50-row budget.

Runs in a subprocess so it gets a clean SparkSession with the exact
oracle_check configuration, not the shared pytest session. ~100 s; set
SPARK_GRAFT_SKIP_ORACLE_GATE=1 to skip during tight inner-loop work.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_ORACLE_GATE") == "1",
    reason="explicitly skipped via SPARK_GRAFT_SKIP_ORACLE_GATE",
)
def test_all_registered_queries_match_oracle():
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry_mod

    n_queries = len(entry_mod.queries())
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "oracle_check.py"), SF_DIR],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1200,
    )
    out = proc.stdout
    fails = [ln for ln in out.splitlines() if ln.startswith("FAIL")]
    graded = re.findall(r"^(?:PASS|WEAK) ", out, flags=re.M)
    assert proc.returncode == 0 and not fails, "\n".join(fails) or out[-2000:]
    # oracle_check exits 0 on unknown/empty subsets — assert coverage too
    assert len(graded) == n_queries, (
        f"gate graded {len(graded)} of {n_queries} registered queries"
    )
