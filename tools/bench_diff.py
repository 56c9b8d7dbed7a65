#!/usr/bin/env python3
"""Bench regression guard: compare a graft.Bench JSON line against the
committed BENCH_BASELINE.json and flag per-query drift.

Usage:
    python3 tools/bench_diff.py <bench.json> [--baseline BENCH_BASELINE.json]
                                [--ratio 2.0] [--min-sec 0.3]

<bench.json> may be a raw `{"metric":...}` line, a file containing one
(e.g. a bench log — the last metric line wins), or a driver BENCH_r*.json
wrapper with the line embedded in its "tail" field.

A query REGRESSES when  new >= ratio * old  AND  new >= min-sec  (the
absolute floor keeps 0.05s -> 0.12s scheduler jitter out of the report).
Queries missing from the baseline are listed as NEW. Exit code 1 iff any
regression, so the check can gate a commit.

Caveat measured in round 5: timings on the shared driver host swing with
co-tenant load (identical code/data/config measured q_varlen 0.32s
locally vs 8.11s in the r04 driver bench; whole-run total 35.8s vs
66.3s). Compare like with like — regenerate the baseline on the same
machine you measure on — and read a uniform inflation across all queries
as load, not regression.
"""
import argparse
import json
import re
import sys


def extract_metric_line(text: str) -> dict:
    """Last {"metric":...} JSON object found in the text."""
    matches = re.findall(r'\{"metric":.*?"sf":"[^"]*"\}', text)
    if matches:
        return json.loads(matches[-1])
    obj = json.loads(text)
    if "queries" in obj:
        return obj
    if "tail" in obj:  # driver BENCH_r*.json wrapper
        return extract_metric_line(obj["tail"].replace('\\"', '"'))
    raise SystemExit("no bench metric line found in input")


def load(path: str) -> dict:
    with open(path) as f:
        return extract_metric_line(f.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--baseline", default="BENCH_BASELINE.json")
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.3)
    args = ap.parse_args()

    new = load(args.bench)
    old = load(args.baseline)
    new_q, old_q = new["queries"], old["queries"]

    regressions, improvements, fresh = [], [], []
    for name, t in sorted(new_q.items()):
        if t < 0:
            regressions.append((name, None, t))  # errored in the run
            continue
        if name not in old_q:
            fresh.append((name, t))
            continue
        base = old_q[name]
        if base >= 0 and t >= args.ratio * base and t >= args.min_sec:
            regressions.append((name, base, t))
        elif base >= args.min_sec and t <= base / args.ratio:
            improvements.append((name, base, t))

    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(new_q)} queries, baseline {len(old_q)})")
    for name, t in fresh:
        print(f"NEW      {name:24s} {t:7.2f}s")
    for name, base, t in improvements:
        print(f"FASTER   {name:24s} {base:7.2f}s -> {t:7.2f}s ({t / base:.2f}x)")
    for name, base, t in regressions:
        if base is None:
            print(f"ERRORED  {name:24s}")
        else:
            print(f"REGRESS  {name:24s} {base:7.2f}s -> {t:7.2f}s ({t / base:.1f}x)")
    print(f"REGRESSIONS: {len(regressions)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
