#!/usr/bin/env python3
"""Cross-run bench trend: per-query medians and drift across the sweep
history that graft.Bench appends to bench_history.jsonl (one line per FULL
sweep: git head, wall-clock, totals, per-query seconds, loadavg).

Usage:
  python3 tools/bench_trend.py [--last N] [--flag RATIO] [qNN ...]

With query names, prints that query's full time series. Without, prints a
table of per-query median / latest / ratio over the last N sweeps and
flags queries whose latest exceeds RATIO x median (default 1.5) — the
q118-style same-commit drift, now visible without artifact archaeology.
"""
import argparse
import json
import signal
import statistics
import sys
from pathlib import Path

# behave under `| head`: die on SIGPIPE instead of raising BrokenPipeError
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

def load(path):
    rows = []
    if not Path(path).exists():
        return rows
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            print(f"warning: skipping malformed history line: {line[:80]}",
                  file=sys.stderr)
    return rows

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names to plot as series")
    ap.add_argument("--history", default="bench_history.jsonl")
    ap.add_argument("--last", type=int, default=10,
                    help="sweeps to consider (default 10)")
    ap.add_argument("--flag", type=float, default=1.5,
                    help="flag latest > RATIO x median (default 1.5)")
    args = ap.parse_args()

    rows = load(args.history)
    if not rows:
        print("no history — run a full graft.Bench sweep first")
        return 1
    rows = rows[-args.last:]

    if args.queries:
        for q in args.queries:
            print(f"== {q} ==")
            for r in rows:
                sec = r.get("queries", {}).get(q)
                load_s = (r.get("loadavg") or {}).get("start")
                print(f"  {r.get('head','?'):>8}  "
                      f"{sec if sec is not None else '-':>8}  "
                      f"load={load_s}")
        return 0

    names = sorted({q for r in rows for q in r.get("queries", {})})
    newest = rows[-1].get("queries", {})
    flagged = []
    print(f"{'query':<34} {'n':>2} {'median':>8} {'latest':>8} {'ratio':>6}")
    for q in names:
        series = [r["queries"][q] for r in rows if q in r.get("queries", {})]
        med = statistics.median(series)
        if q not in newest:
            # absent from the newest sweep (renamed/retired): report it as
            # such instead of presenting a stale value as "latest"
            print(f"{q:<34} {len(series):>2} {med:>8.3f} {'retired':>8} {'-':>6}")
            continue
        latest = newest[q]
        ratio = latest / med if med > 0 else float("inf")
        mark = ""
        if len(series) >= 2 and ratio > args.flag and latest > 0.5:
            mark = "  <-- drift"
            flagged.append(q)
        print(f"{q:<34} {len(series):>2} {med:>8.3f} {latest:>8.3f} "
              f"{ratio:>6.2f}{mark}")
    totals = [r.get("total") for r in rows if r.get("total") is not None]
    print(f"\nsweep totals (last {len(totals)}): "
          + ", ".join(f"{t:.1f}" for t in totals))
    if flagged:
        print(f"drifting vs median (> {args.flag}x, > 0.5 s): "
              + ", ".join(flagged))
    return 0

if __name__ == "__main__":
    sys.exit(main())
