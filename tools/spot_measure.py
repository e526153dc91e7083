"""Confirm-or-clear bench `suspect_regressions` with targeted
re-measures (VERDICT r12 item 1).

A degraded bench window records suspects in advisory mode instead of
failing (bench.py); this tool closes the loop without needing a quiet
window for the FULL registry: it re-runs just the suspect queries
``--repeats`` times each in one warmed session and compares each
query's MINIMUM against the standing min-extraction baseline
(BENCH_BASELINE.json) under the same gate arithmetic bench.py uses
(>2x scaled baseline AND >1s absolute). Steal noise inflates means
10-35x but barely touches the minimum over repeats, so a handful of
repeats in ANY window separates host tails from plan regressions.

Usage::

    python tools/spot_measure.py [--queries a,b,c] [--repeats 3] \
        [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--out SPOT_MEASURE.json]

Defaults: the ``suspect_regressions`` list from BENCH_OUT.json.

Writes a JSON verdict file and appends a ``"spot": true`` row to
BENCH_HISTORY.jsonl — bench's gate skips partial spot rows as its
baseline, but tools/robust_baseline.py folds their minima into the
standing baseline (a minimum only improves with more samples).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated; default: BENCH_OUT.json suspect_regressions")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    ap.add_argument("--out", default=os.path.join(REPO, "SPOT_MEASURE.json"))
    args = ap.parse_args()

    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        with open(os.path.join(REPO, "BENCH_OUT.json")) as fh:
            names = [r["query"] for r in json.load(fh).get("suspect_regressions", [])]
    if not names:
        print("no suspects to measure — nothing to do")
        return

    from wikistream_event_data_pipeline_aws_spark import registry
    from wikistream_event_data_pipeline_aws_spark.session import get_spark

    spark = get_spark(app_name="spot_measure", cpus=args.cpus, shuffle_partitions=args.cpus)
    qs = registry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    bench.warmup(spark, args.sf_dir, qs)
    host_index = bench._host_index(spark, args.cpus)

    from wikistream_event_data_pipeline_aws_spark.operators import memo

    ticks = bench._cpu_ticks()
    runs: dict[str, list[float]] = {}
    memo_involved: dict[str, bool] = {}
    for name in names:
        fn = qs[name]
        rs = []
        for _ in range(args.repeats):
            # Reset the session memos before EVERY repeat (VERDICT r13
            # item 3): a memoized query's repeats would otherwise be
            # memo hits, and the minimum this tool feeds into the
            # standing baseline would be a hit time, not the query's
            # standalone floor. The warmup above still covers JIT/IO.
            memo.reset_memos()
            ev0 = len(memo.MEMO_EVENTS)
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            rs.append(round(time.perf_counter() - t0, 4))
            memo_involved[name] = memo_involved.get(name, False) or any(
                True for _ in memo.MEMO_EVENTS[ev0:]
            )
        runs[name] = rs
    steal_pct = bench._steal_pct(ticks, bench._cpu_ticks())
    spark.stop()

    minima = {n: min(rs) for n, rs in runs.items()}
    standing = bench._standing_baseline(REPO, args.sf_dir, args.cpus)
    verdicts: dict[str, dict] = {}
    regressed: list[dict] = []
    if standing is not None:
        scale = bench._host_scale(standing, host_index)
        base_q = {n: standing["queries"][n] for n in names if n in standing["queries"]}
        regressed = bench._regressions(base_q, minima, scale)
        bad = {r["query"] for r in regressed}
        for n in names:
            verdicts[n] = {
                "baseline_s": base_q.get(n),
                "spot_min_s": minima[n],
                "runs_s": runs[n],
                "verdict": (
                    "no-baseline" if n not in base_q
                    else "CONFIRMED-regression" if n in bad
                    else "cleared"
                ),
                # True = this query consumes session memos; its runs here
                # are STANDALONE floors (memos reset per repeat), which
                # can sit far above its in-battery bench time (a memo hit)
                "memoized": memo_involved.get(n, False),
            }
    out = {
        "tool": "spot_measure",
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "repeats": args.repeats,
        "host_index": host_index,
        "steal_pct": steal_pct,
        "queries": verdicts,
        "confirmed": sorted(r["query"] for r in regressed),
        "cleared": sorted(n for n, v in verdicts.items() if v["verdict"] == "cleared"),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")

    # history row for the min-extraction baseline (partial + spot-flagged:
    # bench's last-row gate skips it; robust_baseline folds the minima)
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    row = {
        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "spot": True,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": args.cpus,
        "host_index": host_index,
        "steal_pct": steal_pct,
        "queries": minima,
    }
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl"), "a") as fh:
        fh.write(json.dumps(row, separators=(",", ":")) + "\n")

    print(json.dumps({k: out[k] for k in ("confirmed", "cleared", "host_index", "steal_pct")}))
    for n in names:
        v = verdicts.get(n, {})
        print(f"  {n}: {v.get('verdict')} spot_min={v.get('spot_min_s')}s baseline={v.get('baseline_s')}s runs={v.get('runs_s')}")


if __name__ == "__main__":
    main()
