"""tools/front_rotation.py composes the next round's driver front from
the CORRECTNESS history; the policy is load-bearing (the rotation-debt
guard and the judge's staleness target both depend on it), so the pure
composition core is pinned here. The integration-level check is that
the tool reproduces the committed round-9 front byte-for-byte."""

from __future__ import annotations

import pytest

from tools.front_rotation import compose_front, green_union

REG = [f"q{i:02d}" for i in range(12)]


def test_new_and_changed_head_in_registration_order():
    latest = {n: 3 for n in REG if n not in ("q05", "q09")}  # q05/q09 new
    front, deferred = compose_front(REG, latest, ["q07", "q02"], cap=6)
    # new first (registration order), then changed (registration order),
    # then the stalest cohort fills the rest
    assert front[:4] == ["q05", "q09", "q02", "q07"]
    assert front[4:] == ["q00", "q01"]
    assert deferred == ["q03", "q04", "q06", "q08", "q10", "q11"]


def test_changed_query_that_is_also_new_takes_one_slot():
    latest = {n: 2 for n in REG if n != "q03"}
    front, _ = compose_front(REG, latest, ["q03", "q08"], cap=4)
    assert front == ["q03", "q08", "q00", "q01"]
    assert len(set(front)) == len(front)


def test_cohorts_fill_ascending_and_unreached_are_not_deferred():
    latest = {"q00": 5, "q01": 3, "q02": 3, "q03": 4, "q04": 4, "q05": 5}
    reg = [f"q{i:02d}" for i in range(6)]
    front, deferred = compose_front(reg, latest, [], cap=3)
    # r3 cohort fully admitted, r4 cohort cut mid-way -> remainder
    # deferred; the r5 cohort was never reached, so it is NOT a deferral
    assert front == ["q01", "q02", "q03"]
    assert deferred == ["q04"]


def test_boundary_cut_does_not_mislabel_unreached_cohort():
    # The cap is exhausted exactly at the r3 cohort's boundary; the r4
    # cohort was never reached by the stale fill, so it must NOT be
    # deferred — even though the changed head query q00 happens to have
    # latest == 4 (the old membership probe mislabeled this case).
    reg = ["q00", "q01", "q02", "q03"]
    latest = {"q00": 4, "q01": 3, "q02": 3, "q03": 4}
    front, deferred = compose_front(reg, latest, ["q00"], cap=3)
    assert front == ["q00", "q01", "q02"]
    assert deferred == []


def test_head_displacing_whole_cohorts_reports_them_deferred():
    # Policy item 3: EVERYTHING displaced is reported. When new+changed
    # queries exhaust the cap exactly at a cohort boundary, the stale
    # cohorts a head-free fill would have admitted are displaced whole —
    # previously compose_front returned deferred=[] here, silently
    # dropping entire cohorts from the round's documented deferral list.
    reg = ["q00", "q01", "q02", "q03", "q04"]
    latest = {"q02": 3, "q03": 3, "q04": 5}  # q00/q01 new
    front, deferred = compose_front(reg, latest, [], cap=2)
    assert front == ["q00", "q01"]
    # a head-free fill would have admitted the r3 cohort; r5 is beyond
    # even the counterfactual cap, so it is NOT a deferral (not yet due)
    assert deferred == ["q02", "q03"]
    latest: dict[str, int] = {}
    with pytest.raises(ValueError, match="exceed"):
        compose_front(REG, latest, [], cap=5)  # 12 new > 5 slots
    with pytest.raises(ValueError, match="not in registry"):
        compose_front(REG, {n: 1 for n in REG}, ["nope"], cap=5)


def test_reproduces_the_committed_round9_front():
    from wikistream_event_data_pipeline_aws_spark import registry

    reg = list(registry.queries().keys())
    latest = green_union(before_round=registry._FRONT_TARGET_ROUND)
    front, _ = compose_front(reg, latest, list(registry._FRONT_CHANGED))
    assert front == list(registry._DRIVER_FRONT)
