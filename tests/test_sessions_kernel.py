"""Property tests for the sessionizer's numpy segmentation kernel
(`streaming/sessions.py::_session_fn`) — no Spark session needed.

The kernel is the one place where vectorized numpy (argsort + reduceat +
carry-merge) replaces an obvious per-event loop; these tests pin it to a
naive pure-Python reference model over hypothesis-generated event batches,
covering the edges the E2E streaming tests can't enumerate (carry merge vs
carry close, multi-chunk Arrow batches, empty chunks, ties, single event,
gap-boundary equality).
"""

from __future__ import annotations

import os
import sys

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sql_duckdb_parquet__spark.streaming.sessions import _session_fn  # noqa: E402

GAP_S = 1800
GAP_MS = GAP_S * 1000


class FakeState:
    """Minimal stand-in for pyspark's GroupState (batch path only)."""

    def __init__(self, value=None, timed_out=False, wm=0):
        self._v = tuple(value) if value is not None else None
        self.hasTimedOut = timed_out
        self._wm = wm
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def ref_sessionize(open_state, events):
    """Per-event loop reference: returns (closed sessions, open session).

    Merge semantics: an event within the gap of the session's LATEST seen
    event extends the span in both directions (min start / max last) —
    a late-but-in-gap event must never regress the span or the effective
    gap window (the carried-state bug class)."""
    closed = []
    cur = tuple(open_state) if open_state is not None else None
    for ts, v in sorted(events, key=lambda e: e[0]):
        if cur is None:
            cur = (ts, ts, 1, float(v))
        elif ts - cur[1] > GAP_MS:
            closed.append(cur)
            cur = (ts, ts, 1, float(v))
        else:
            cur = (
                min(cur[0], ts),
                max(cur[1], ts),
                cur[2] + 1,
                cur[3] + float(v),
            )
    return closed, cur


def run_kernel(open_state, chunks, wm=0):
    fn = _session_fn(GAP_S)
    state = FakeState(value=open_state, wm=wm)
    pdfs = [
        pd.DataFrame(
            {
                "ts": pd.to_datetime([t for t, _ in ch], unit="ms"),
                "value": [float(v) for _, v in ch],
            }
        )
        for ch in chunks
    ]
    closed = []
    for out in fn((7,), iter(pdfs), state):
        for r in out.itertuples(index=False):
            assert r.user_id == 7
            closed.append(
                (
                    int(r.session_start.value // 10**6),
                    int(r.session_end.value // 10**6),
                    int(r.n_events),
                    float(r.sum_value),
                    r.closed_by,
                )
            )
    return closed, state


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30 * GAP_MS),
        st.integers(min_value=0, max_value=1000),
    ),
    max_size=60,
)

carried_strategy = st.none() | st.tuples(
    st.integers(min_value=0, max_value=5 * GAP_MS),  # start
    st.integers(min_value=0, max_value=10 * GAP_MS),  # last
    st.integers(min_value=1, max_value=20),  # n
    st.integers(min_value=0, max_value=5000),  # sum (int-valued: exact fp)
).map(lambda t: (min(t[0], t[1]), t[1], t[2], float(t[3])))


@settings(max_examples=300, deadline=None)
@given(events=events_strategy, carried=carried_strategy, n_chunks=st.integers(1, 4))
def test_kernel_matches_reference_model(events, carried, n_chunks):
    chunks = [events[i::n_chunks] for i in range(n_chunks)]  # uneven + empty ok
    got_closed, state = run_kernel(carried, chunks)
    want_closed, want_open = ref_sessionize(carried, events)

    assert [c[:4] for c in got_closed] == [
        (s, e, n, v) for (s, e, n, v) in want_closed
    ]
    assert all(c[4] == "gap" for c in got_closed)
    if not events:
        # kernel returns untouched on an all-empty batch
        assert (state._v if state.exists else None) == carried
    else:
        assert state.get == want_open
        # event-time timeout re-armed past both the deadline and the wm
        assert state.timeout_ts == max(want_open[1] + GAP_MS, 1)


@settings(max_examples=50, deadline=None)
@given(carried=carried_strategy.filter(lambda c: c is not None))
def test_kernel_timeout_emits_and_evicts(carried):
    fn = _session_fn(GAP_S)
    state = FakeState(value=carried, timed_out=True)
    outs = list(fn((7,), iter([]), state))
    assert len(outs) == 1 and len(outs[0]) == 1
    r = next(outs[0].itertuples(index=False))
    assert (
        int(r.session_start.value // 10**6),
        int(r.session_end.value // 10**6),
        int(r.n_events),
        float(r.sum_value),
        r.closed_by,
    ) == (carried[0], carried[1], carried[2], carried[3], "timeout")
    assert not state.exists


def test_late_event_does_not_regress_carried_session():
    """Regression: carried session (start 9:45, last 10:00); a drain
    delivers a late-but-above-watermark event at 9:50 and an on-time one
    at 10:25.  The late event must not pull `last` back to 9:50 — that
    would both shrink the timeout deadline and falsely split the 10:25
    event (25 min after the TRUE last event) into a new session."""
    m = 60_000
    carried = (585 * m, 600 * m, 4, 4.0)  # 9:45 → 10:00
    closed, state = run_kernel(carried, [[(590 * m, 1), (625 * m, 1)]])
    assert closed == []  # everything merged into the one open session
    assert state.get == (585 * m, 625 * m, 6, 6.0)
    assert state.timeout_ts == 625 * m + GAP_MS


def test_gap_boundary_is_strict():
    """An event exactly gap_ms after the last one EXTENDS the session
    (the break requires strictly greater), matching the oracle's
    ``> INTERVAL 1800 SECOND``."""
    closed, state = run_kernel(None, [[(0, 1), (GAP_MS, 1), (2 * GAP_MS, 1)]])
    # both inter-event gaps are exactly GAP_MS: one merged open session
    assert closed == []
    assert state.get == (0, 2 * GAP_MS, 3, 3.0)
    closed2, state2 = run_kernel(None, [[(0, 1), (GAP_MS + 1, 1)]])
    assert [c[:4] for c in closed2] == [(0, 0, 1, 1.0)]
    assert state2.get == (GAP_MS + 1, GAP_MS + 1, 1, 1.0)
