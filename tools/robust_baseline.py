"""Build a degraded-window-robust per-query bench baseline
(VERDICT r11 item 1).

The regression gate went baseline-less for two rounds because it only
trusted quiet-window history rows, and the host stopped providing quiet
windows (13/13 degraded attempts in round 11; 10.6% hypervisor steal
measured during judging). The fix rides on an empirical property of
steal noise: it inflates the MEAN heavily (10-35x per-query tails
observed) but barely touches the per-query MINIMUM across repeated
runs — a query's fastest observation over a dozen runs, quiet or
degraded, sits close to its quiet-window truth.

So: per query, take the minimum wall-clock across every recorded run at
the same (sf, cpus) — degraded and contended rows INCLUDED, because a
minimum can only improve with more samples and a degraded run's best
moments are real executions of the real plan. Pair the result with the
minimum host_index among the runs that contributed (the fastest host
state seen), so the gate's measured-host scaling (cur_idx / base_idx,
clamped >= 1) can only RELAX the bar relative to the recorded best —
a slower host never reads as a plan regression, while a genuine 2x+1s
plan regression still cannot hide (it reproduces at every host speed).

Usage::

    python tools/robust_baseline.py [--sf 0.1] [--cpus 32] \
        [--history BENCH_HISTORY.jsonl] [--out BENCH_BASELINE.json]

Writes the standing baseline file bench.py's gate prefers over single
history rows, and prints a summary. Re-run after any round that adds
queries or records faster runs; the committed file is the contract.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os


def extract_min_baseline(
    runs: list[dict], sf: float, cpus: int, window: int | None = None
) -> dict:
    """Pure min-extraction (unit-tested): per-query minimum across
    runs at (sf, cpus), with the minimum host_index among contributing
    runs and per-query sample counts.

    ``window`` (r13 restart session): restrict to the LAST ``window``
    matching runs. An unwindowed min over ~90 heterogeneous runs is an
    EXTREME order statistic: it preserves one-off lucky draws from
    stale eras (different bench format, different cache/ordering
    states, months-old host conditions) that no honest current run can
    reproduce — e.g. similarity_embedding_neardup's 1.05s min comes
    from two 08-14 draws while every run since sits at 2.0-3.3s on
    UNCHANGED code, so the hard gate false-fired on a quiet window.
    A min over the last K runs keeps the steal-robustness property
    (the minimum over K runs still kills hypervisor tails) while aging
    out states the current code was never measured in; a real plan
    regression this round still reproduces in every one of the last K
    runs and cannot hide."""
    queries: dict[str, float] = {}
    samples: dict[str, int] = {}
    host_indexes: list[float] = []
    matching = [
        r for r in runs if r.get("sf") == sf and r.get("cpus") == cpus
    ]
    if window is not None:
        matching = matching[-window:]
    for r in matching:
        if r.get("host_index"):
            host_indexes.append(r["host_index"])
        for q, t in r.get("queries", {}).items():
            samples[q] = samples.get(q, 0) + 1
            if q not in queries or t < queries[q]:
                queries[q] = t
    return {
        "method": (
            "per-query min across the last "
            f"{window if window is not None else 'ALL'} recorded runs "
            "at (sf, cpus), degraded/contended included; host_index = "
            "min over contributing runs (fastest host state) so "
            "measured-host scaling only relaxes"
        ),
        "sf": sf,
        "cpus": cpus,
        "runs_used": len(matching),
        "host_index": min(host_indexes) if host_indexes else None,
        "queries": queries,
        "samples": samples,
    }


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--history", default=os.path.join(repo, "BENCH_HISTORY.jsonl")
    )
    ap.add_argument("--out", default=os.path.join(repo, "BENCH_BASELINE.json"))
    ap.add_argument(
        "--window",
        type=int,
        default=25,
        help="use only the last N matching runs (0 = all; default 25 — "
        "see extract_min_baseline: an all-history min preserves stale-era "
        "one-off draws and false-fires the gate)",
    )
    ap.add_argument(
        "--allow-rising-floors",
        action="store_true",
        help="write even when per-query floors RISE vs the committed "
        "baseline (ADVICE r13: a regression persisting across the whole "
        "window would otherwise silently become its own baseline — the "
        "rise must be explicitly acknowledged)",
    )
    args = ap.parse_args()
    with open(args.history) as fh:
        runs = [json.loads(line) for line in fh if line.strip()]
    base = extract_min_baseline(
        runs, args.sf, args.cpus, window=args.window or None
    )
    # cross-check vs the committed baseline (ADVICE r13): list queries
    # whose floor RISES >25% and >0.5s — the signature of a regression
    # that persisted across the window — and refuse to overwrite the
    # committed file unless the rise is acknowledged with the flag.
    rising = []
    if os.path.exists(args.out):
        with open(args.out) as fh:
            prev = json.load(fh)
        if prev.get("sf") == args.sf and prev.get("cpus") == args.cpus:
            for q, t in base["queries"].items():
                pt = prev.get("queries", {}).get(q)
                if pt is not None and t > 1.25 * pt and t - pt > 0.5:
                    rising.append((q, pt, t))
    if rising:
        for q, pt, t in sorted(rising):
            print(f"FLOOR RISES: {q} {pt:.2f}s -> {t:.2f}s")
        if not args.allow_rising_floors:
            print(
                f"{len(rising)} per-query floor(s) rise vs the committed "
                "baseline — investigate (tools/spot_measure.py) or "
                "acknowledge with --allow-rising-floors; NOT writing."
            )
            return 1
    base["built_at"] = datetime.datetime.now(
        datetime.timezone.utc
    ).isoformat(timespec="seconds")
    with open(args.out, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
        fh.write("\n")
    qs = base["queries"]
    multi = sum(1 for q in qs if base["samples"][q] >= 3)
    print(
        f"baseline: {len(qs)} queries from {base['runs_used']} runs "
        f"(>=3 samples for {multi}), total {sum(qs.values()):.1f}s, "
        f"host_index {base['host_index']}, -> {args.out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
