"""Unit tests for the stateful sessionizer's ledger merge — including
out-of-order arrival across micro-batches, which the end-to-end bounded
replay (single batch) cannot exercise."""

from __future__ import annotations

import pandas as pd

from zylyty_data_engineer_challenge_spark.streaming.sessionize import (
    SESSION_GAP_US,
    _sessionize_user,
)

US = 1_000_000
H = 3600 * US


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run(state, epochs_us):
    pdf = pd.DataFrame({"ts": pd.to_datetime([e * 1000 for e in epochs_us], unit="ns")})
    [out] = list(_sessionize_user((7,), iter([pdf]), state))
    return [
        (r.session_seq, r.n_events, r.session_start, r.session_end)
        for r in out.itertuples()
    ]


def test_single_batch_sessions():
    out = _run(FakeState(), [10 * H, 10 * H + 60 * US, 13 * H])
    assert [(s, n) for s, n, *_ in out] == [(1, 2), (2, 1)]


def test_out_of_order_event_starts_new_session():
    st = FakeState()
    _run(st, [10 * H])
    out = _run(st, [8 * H])  # late event, 2h earlier: must be its OWN session
    assert [(s, n) for s, n, *_ in out] == [(1, 1), (2, 1)]
    assert out[0][2] < out[1][2]  # session 1 starts at 08:00, session 2 at 10:00


def test_late_event_bridges_two_sessions():
    st = FakeState()
    _run(st, [10 * H, 10 * H + 50 * 60 * US])  # two sessions 50 min apart
    assert len(st.get[0]) == 2
    # a late event midway (25 min from both) closes both gaps -> one session
    out = _run(st, [10 * H + 25 * 60 * US])
    assert [(s, n) for s, n, *_ in out] == [(1, 3)]


def test_late_event_extends_session_backwards():
    st = FakeState()
    _run(st, [10 * H])
    out = _run(st, [10 * H - 10 * 60 * US])  # 10 min before the start
    assert [(s, n) for s, n, *_ in out] == [(1, 2)]
    assert out[0][2].endswith("09:50:00")


def test_gap_boundary_is_inclusive():
    st = FakeState()
    _run(st, [10 * H])
    out = _run(st, [10 * H + SESSION_GAP_US])  # exactly the gap: same session
    assert [(s, n) for s, n, *_ in out] == [(1, 2)]
    out = _run(st, [10 * H + 2 * SESSION_GAP_US + 1])  # 1us past: new session
    assert [(s, n) for s, n, *_ in out] == [(1, 2), (2, 1)]
