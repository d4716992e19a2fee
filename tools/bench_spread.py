#!/usr/bin/env python3
"""Cross-run bench spread: recompute per-query max/min across N committed
BENCH_DETAIL files so the noise claim in SURVEY.md is derivable from repo
evidence alone (VERDICT r8 asked for the runs as files, not prose).

Usage: tools/bench_spread.py BENCH_DETAIL_r9_run1.json BENCH_DETAIL_r9_run2.json ...

Prints: total per run, then the queries with the worst cross-run spread
(max_sec/min_sec), flagging anything above the 1.5x noise bar that is not
sub-second jitter.
"""
import json
import sys


def main(paths):
    if len(paths) < 2:
        print("need >= 2 detail files", file=sys.stderr)
        return 2
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p, json.load(f)))
    names = set(runs[0][1]["queries"])
    for _, r in runs[1:]:
        names &= set(r["queries"])
    print(f"{len(names)} shared queries across {len(runs)} runs")
    for p, r in runs:
        total = sum(r["queries"][q]["sec"] for q in names)
        print(f"  {p}: shared-total {total:.1f}s (file total {r['value']:.1f}s)")
    rows = []
    for q in names:
        secs = [r["queries"][q]["sec"] for _, r in runs]
        mn, mx = min(secs), max(secs)
        rows.append((mx / max(mn, 1e-9), mn, mx, q))
    rows.sort(reverse=True)
    print(f"\n{'spread':>7}  {'min_s':>7}  {'max_s':>7}  query")
    for spread, mn, mx, q in rows[:15]:
        flag = " <-- above 1.5x, not sub-second" if spread > 1.5 and mx >= 1.0 else ""
        print(f"{spread:7.2f}  {mn:7.2f}  {mx:7.2f}  {q}{flag}")
    bad = [q for spread, mn, mx, q in rows if spread > 1.5 and mx >= 1.0]
    print(f"\nqueries above the 1.5x spread bar with max >= 1s: {bad or 'none'}")
    return 0


if __name__ == "__main__":
    # piping into head must not traceback (BrokenPipeError on stdout)
    import signal
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    sys.exit(main(sys.argv[1:]))
