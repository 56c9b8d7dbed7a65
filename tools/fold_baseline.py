#!/usr/bin/env python3
"""Fold a round's bench run into BENCH_BASELINE.json (format 2).

Format 2 keeps TWO references side by side:

  - "envelope":   all-time per-query MINIMA across every recorded run.
                  A min-statistic only ever goes down, so the envelope
                  drifts away from what any full 100-query run can
                  achieve — it is reported for context, never flagged on.
  - "last_round": per-query min-of-samples from the most recent full
                  round run (+ its calib). This is what bench_diff.py
                  FLAGS against: round-over-round drift is actionable;
                  distance from an unreachable ratchet is not.

Usage:
    python3 tools/fold_baseline.py <round_bench.json> --round N
                                   [--baseline BENCH_BASELINE.json]

<round_bench.json> is a graft.Bench output file (bench_out.json) or a
driver BENCH_r*.json wrapper. The envelope is updated elementwise
(min with the new run); last_round is replaced wholesale.
"""
import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_diff import extract_metric_line, calib_of  # noqa: E402


def run_minima(run: dict) -> dict:
    out = {}
    for name, t in run["queries"].items():
        ts = [x for x in run.get("samples", {}).get(name, []) if x >= 0]
        qm = run.get("qmin", {}).get(name, -1)
        cands = ts + ([qm] if qm >= 0 else []) + ([t] if t >= 0 else [])
        if cands:
            out[name] = min(cands)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--baseline", default="BENCH_BASELINE.json")
    args = ap.parse_args()

    with open(args.bench) as f:
        run = extract_metric_line(f.read())
    new_min = run_minima(run)
    new_calib = calib_of(run)

    with open(args.baseline) as f:
        old = json.load(f)

    if "envelope" in old:  # already format 2
        env_q = dict(old["envelope"]["queries"])
        env_calib = old["envelope"].get("calib")
    else:  # format 1: flat all-time minima
        env_q = dict(old["queries"])
        env_calib = old.get("calib")

    for name, t in new_min.items():
        env_q[name] = min(env_q.get(name, t), t)

    out = {
        "format": 2,
        "note": ("envelope = all-time per-query minima (context only); "
                 "last_round = previous full round's min-of-samples "
                 "(what bench_diff flags against)"),
        "envelope": {"calib": env_calib, "queries": dict(sorted(env_q.items()))},
        "last_round": {
            "round": args.round,
            "calib": new_calib,
            "queries": dict(sorted(new_min.items())),
        },
    }
    with open(args.baseline, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"baseline: envelope {len(env_q)} queries, "
          f"last_round r{args.round} {len(new_min)} queries "
          f"(calib {new_calib})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
