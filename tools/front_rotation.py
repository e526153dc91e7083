"""Compose the next round's ``_DRIVER_FRONT`` from CORRECTNESS history.

Every round starts by recomposing ``registry._DRIVER_FRONT`` (max 50 —
the driver gate truncates there) and bumping ``_FRONT_TARGET_ROUND``;
rounds 7-9 did this by hand from the staleness histogram, which is
exactly the kind of clerical step that silently goes wrong. This tool
makes the composition mechanical and auditable:

    python tools/front_rotation.py --target-round 10 \
        [--changed name1,name2]

Policy (registry.py header; enforced by tests/test_rotation_debt.py):

1. NEW queries (no green driver row in any round before the target)
   and CHANGED queries (``--changed``; plans whose output changed this
   round — same-output refactors verified by the parity suite take no
   slots) head the front, in registration order.
2. The remaining slots go to the stalest cohorts — queries whose
   NEWEST green row is the oldest round — ascending by that round,
   registration order within a cohort.
3. Truncate at 50; everything displaced is reported as the round's
   documented deferral list.

Prints the staleness histogram, the composed front as a Python tuple
ready to paste into ``registry.py``, the ``_FRONT_CHANGED`` tuple, and
the deferrals. Pure composition logic lives in :func:`compose_front`
(unit-tested without touching the filesystem).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRONT_CAP = 50


def green_union(repo: str = REPO, before_round: int | None = None) -> dict[str, int]:
    """query name -> newest round with a fully-green driver row,
    considering only CORRECTNESS files from rounds BEFORE
    ``before_round`` (compose-time semantics: the front for round N is
    built from what rounds < N verified)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if ok:
                latest[name] = max(rnd, latest.get(name, 0))
    return latest


def compose_front(
    reg_order: list[str],
    latest: dict[str, int],
    changed: list[str],
    cap: int = FRONT_CAP,
) -> tuple[list[str], list[str]]:
    """(front, deferred_stalest) per the rotation policy.

    ``deferred_stalest`` lists everything the cap displaced (policy
    item 3): the remainder of a cohort the fill could only PARTIALLY
    admit, plus — when a new/changed head consumed slots — any query
    the stale fill would have admitted without the head (the
    counterfactual no-head fill). Cohorts young enough that even a
    head-free fill would never reach them are not deferrals (they are
    simply not due yet)."""
    unknown = [n for n in changed if n not in reg_order]
    if unknown:
        raise ValueError(f"--changed names not in registry: {unknown}")
    new = [n for n in reg_order if n not in latest]
    changed_set = set(changed)
    head = new + [n for n in reg_order if n in changed_set and n not in new]
    if len(head) > cap:
        raise ValueError(
            f"{len(head)} new+changed queries exceed the {cap}-slot window; "
            "the gate cannot verify them all this round — split the work"
        )
    front = list(head)
    taken = set(front)
    deferred: list[str] = []
    rounds = sorted({latest[n] for n in reg_order if n in latest})
    for rnd in rounds:
        cohort = [
            n for n in reg_order if latest.get(n) == rnd and n not in taken
        ]
        room = cap - len(front)
        if room <= 0:
            # The stale fill never consumed a slot from this cohort (the
            # cap was exhausted at or before the previous cohort's
            # boundary). Whether that makes it a deferral depends on WHY
            # the cap ran out — the counterfactual check below decides;
            # probing front membership by round here would mislabel (a
            # changed head query whose latest happens to equal this
            # round is not evidence the fill reached the cohort).
            break
        front.extend(cohort[:room])
        taken.update(cohort[:room])
        if len(cohort) > room:
            deferred.extend(cohort[room:])
            break
    if head:
        # Policy item 3: EVERYTHING displaced is reported. The loop
        # above only catches the remainder of a partially-admitted
        # cohort; a head big enough to exhaust the cap at a cohort
        # BOUNDARY displaces whole cohorts with no partial cut. Those
        # are exactly the queries a head-free PURE STALE fill (first
        # ``cap`` verified queries, stalest cohorts first) would have
        # admitted that the actual front doesn't contain.
        stale_order = [
            n for rnd in rounds for n in reg_order if latest.get(n) == rnd
        ]
        seen = taken | set(deferred)
        deferred.extend(n for n in stale_order[:cap] if n not in seen)
    return front, deferred


def _tuple_text(names: list[str], indent: str = "    ") -> str:
    return "(\n" + "".join(f'{indent}"{n}",\n' for n in names) + ")"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--target-round", type=int, required=True)
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated changed-output query names (new queries are "
        "detected automatically from the CORRECTNESS history)",
    )
    args = ap.parse_args()

    from wikistream_event_data_pipeline_aws_spark import registry

    reg_order = list(registry.queries().keys())
    latest = green_union(before_round=args.target_round)
    changed = [n for n in args.changed.split(",") if n]

    hist: dict[int, int] = {}
    for n in reg_order:
        if n in latest:
            hist[latest[n]] = hist.get(latest[n], 0) + 1
    n_new = sum(1 for n in reg_order if n not in latest)
    print(f"registered: {len(reg_order)}  never-verified: {n_new}")
    print("staleness histogram (newest green row -> count):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")

    front, deferred = compose_front(reg_order, latest, changed)
    print(f"\ncomposed front ({len(front)} slots):")
    print("_FRONT_CHANGED: tuple[str, ...] = " + _tuple_text(changed))
    print("_DRIVER_FRONT: tuple[str, ...] = " + _tuple_text(front))
    if deferred:
        print(f"\ndeferred from the reached cohort ({len(deferred)}):")
        for n in deferred:
            print(f"  {n} (r{latest[n]})")
    print(
        f"\nremember: bump registry._FRONT_TARGET_ROUND to "
        f"{args.target_round} in the SAME commit"
    )


if __name__ == "__main__":
    main()
