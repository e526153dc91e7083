"""The bench regression gate (VERDICT r4 item 5) is a pure function:
a common-subset query regresses only when BOTH >2x the previous timing
AND >1s absolute — sub-second noise can't trip it, a real plan
regression can't hide under it."""

from __future__ import annotations

from bench import _regressions


def test_double_condition_required():
    prev = {"q1": 0.3, "q2": 5.0, "q3": 2.0, "gone": 1.0}
    cur = {"q1": 0.9, "q2": 7.0, "q3": 4.5, "new": 9.0}
    # q1: 3x but only +0.6s (noise floor) — pass
    # q2: +2s but 1.4x — pass
    # q3: 2.25x AND +2.5s — regression
    # gone/new: not common — ignored
    got = _regressions(prev, cur)
    assert [r["query"] for r in got] == ["q3"]
    assert got[0] == {"query": "q3", "prev_s": 2.0, "now_s": 4.5}


def test_no_regressions_is_empty():
    assert _regressions({"a": 1.0}, {"a": 1.1}) == []
    assert _regressions({}, {"a": 100.0}) == []
