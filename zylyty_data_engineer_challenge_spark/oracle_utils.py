"""Shared helpers for composing oracle SQL strings.

Several acceptance-gate oracles nest another operator's oracle as a derived
table; DuckDB allows a full ``WITH .. SELECT`` inside parentheses but the
trailing top-level ``ORDER BY`` must go. Round 6 had three private copies of
the stripper, each cutting at the *last* ``order by`` substring — a future
oracle ending in a window ``OVER (ORDER BY ...)`` would be silently
truncated mid-query. This single definition only strips a *top-level*
(paren-depth-0) trailing ORDER BY and refuses loudly otherwise.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"\(|\)|\border\s+by\b", re.IGNORECASE)
_NOT_A_SORT_TAIL = re.compile(
    r"\b(limit|offset|union|intersect|except)\b", re.IGNORECASE
)


def strip_order_by(sql: str) -> str:
    """Drop the trailing top-level ORDER BY clause of an oracle query so it
    can nest as a derived table.

    Tracks paren depth so an ``ORDER BY`` inside a window frame, subquery,
    or function call is never mistaken for the outer sort. Asserts the
    stripped tail is end-anchored (nothing but the ORDER BY expression
    follows) — a LIMIT or stray clause after it would mean the cut is
    mid-query, which must fail loudly rather than corrupt the oracle.
    """
    last = None
    depth = 0
    for m in _TOKEN.finditer(sql):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            last = m.start()
    if last is None:
        return sql
    tail = sql[last:]
    if _NOT_A_SORT_TAIL.search(tail):
        raise ValueError(
            "strip_order_by: a set-op/LIMIT clause follows the top-level "
            f"ORDER BY — refusing to truncate mid-query (tail={tail[:80]!r})"
        )
    return sql[:last]
