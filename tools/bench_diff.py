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

Host-drift handling (rounds 4/5 each lost a triage round to phantom
10-30x "regressions" that were co-tenant load on the shared host):

  1. CALIBRATION — graft.Bench times a fixed single-thread arithmetic
     loop at run start/end and emits it as "calib"/"calib_end". When both
     files carry a calib, new times are normalized by the host-speed
     ratio before comparison (clamped to [0.5, 4.0]): a uniform 2x host
     slowdown doubles the calib too and produces ZERO flags.
  2. MIN OF SAMPLES — "samples" holds per-iteration times; a spike rarely
     hits every iteration, so the minimum is the clean estimate used for
     regression checks (medians are still what "queries" reports).
  3. SPIKE BLOCKS — queries run in alphabetical order; a co-tenant spike
     sweeping the run inflates a CONTIGUOUS block. A run of >= 4
     consecutive flagged queries is reported as LOADSPIKE (informational,
     not a failing regression). Re-measure those in isolation before
     believing them.

     Downgrading needs CORROBORATION: related operators share name
     prefixes (p_ann_*, p_dedup_*), so a genuine regression in one
     operator family is exactly the shape a naive block rule would
     misread as load. A block only downgrades when the calibration also
     moved (host measurably loaded) or the block spans >= 3 unrelated
     name families; otherwise it stays a failing regression. --strict
     disables downgrading entirely (for CI).
"""
import argparse
import json
import re
import sys

SPIKE_BLOCK_LEN = 4
CLAMP_LO, CLAMP_HI = 0.5, 4.0


def query_order() -> list:
    """Committed legend: bench query names in run (ascending) order."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_query_order.json")
    with open(path) as f:
        return json.load(f)


def inflate_positional(obj: dict) -> dict:
    """Rebuild name-keyed "queries"/"qmin" from the positional form the
    bench prints when the name-keyed line would overflow the driver's
    ~2000-byte stdout tail window ("q"/"qmin" arrays in ascending query-
    name order, names in tools/bench_query_order.json, CRC32-pinned)."""
    if "queries" in obj or "q" not in obj:
        return obj
    names = query_order()
    if len(names) != obj.get("nq", len(obj["q"])):
        raise SystemExit(
            f"bench legend has {len(names)} names but run carried "
            f"{obj.get('nq')} values — regenerate tools/bench_query_order.json")
    import zlib
    crc = zlib.crc32(",".join(names).encode()) & 0xFFFFFFFF
    if "names_crc" in obj and crc != obj["names_crc"]:
        raise SystemExit(
            "bench legend CRC mismatch — the committed query order does not "
            "match the binary that produced this run")
    obj["queries"] = dict(zip(names, obj["q"]))
    if isinstance(obj.get("qmin"), list):
        obj["qmin"] = dict(zip(names, obj["qmin"]))
    return obj


def extract_metric_line(text: str) -> dict:
    """Last {"metric":...} JSON object found in the text."""
    matches = re.findall(r'\{"metric":.*?"sf":"[^"]*"\}', text)
    if matches:
        return inflate_positional(json.loads(matches[-1]))
    obj = json.loads(text)
    if "queries" in obj or "q" in obj:
        return inflate_positional(obj)
    if "tail" in obj:  # driver BENCH_r*.json wrapper
        return extract_metric_line(obj["tail"].replace('\\"', '"'))
    raise SystemExit("no bench metric line found in input")


def load(path: str) -> dict:
    with open(path) as f:
        return extract_metric_line(f.read())


def split_baseline(obj: dict):
    """Return (flag_run, envelope_run_or_None).

    Format-2 baselines (tools/fold_baseline.py) carry two references:
    "last_round" (previous full round's minima — what we FLAG against,
    since round-over-round drift is actionable) and "envelope" (all-time
    per-query minima — reported as a context column only; a min-statistic
    ratchets downward forever, so distance from it is not actionable).
    Format-1 baselines are a flat run dict used for both roles."""
    if "envelope" in obj and "last_round" in obj:
        last = dict(obj["last_round"])
        env = dict(obj["envelope"])
        for d in (last, env):
            d.setdefault("value", sum(t for t in d["queries"].values() if t >= 0))
        return last, env
    return obj, None


def calib_of(run: dict):
    """Mean of start/end calibration if present."""
    vals = [run[k] for k in ("calib", "calib_end") if k in run and run[k] > 0]
    return sum(vals) / len(vals) if vals else None


def best_time(run: dict, name: str, default: float) -> float:
    """Min over per-iteration samples when available (clean estimate).
    Compact bench lines carry the pre-computed min as "qmin" instead of
    the full per-iteration samples."""
    ts = [t for t in run.get("samples", {}).get(name, []) if t >= 0]
    if ts:
        return min(ts)
    qm = run.get("qmin", {}).get(name, -1)
    return qm if qm >= 0 else default


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--baseline", default="BENCH_BASELINE.json")
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.3)
    ap.add_argument("--strict", action="store_true",
                    help="never downgrade flagged blocks to LOADSPIKE")
    args = ap.parse_args()

    new = load(args.bench)
    with open(args.baseline) as f:
        baseline_text = f.read()
    try:
        baseline_obj = json.loads(baseline_text)
    except json.JSONDecodeError:
        baseline_obj = extract_metric_line(baseline_text)
    old, envelope = split_baseline(baseline_obj)
    new_q, old_q = new["queries"], old["queries"]

    # host-speed normalization via the fixed-work calibration loop
    factor = 1.0
    nc, oc = calib_of(new), calib_of(old)
    if nc and oc:
        factor = max(CLAMP_LO, min(CLAMP_HI, nc / oc))
        if abs(factor - 1.0) >= 0.1:
            print(f"calib: host {factor:.2f}x baseline speed "
                  f"({oc:.2f}s -> {nc:.2f}s loop); times normalized")

    # per-query host-stall evidence (full bench lines only): seconds the
    # host spent with ALL tasks blocked on IO while this query's
    # iterations ran (/proc/pressure/io full-stall delta, graft.Bench).
    # A query whose measured time is substantially stall is downgraded
    # individually — the r12 anomaly class (4-30x inflation, flat CPU
    # calibration, clean isolated re-run) is exactly this signature.
    iostall = new.get("iostall_s", {})
    def stall_frac(name):
        ts = [t for t in new.get("samples", {}).get(name, []) if t >= 0]
        span = sum(ts) if ts else new_q.get(name, 0)
        s = iostall.get(name, 0.0)
        return (s / span) if span > 0 else 0.0

    flagged, improvements, fresh, errored, stalled = [], [], [], [], []
    for name, t in sorted(new_q.items()):
        if t < 0:
            errored.append(name)
            continue
        if name not in old_q:
            fresh.append((name, t))
            continue
        # min-of-samples on BOTH sides: a baseline regenerated from a raw
        # bench dump stores medians, and comparing new-min vs old-median
        # would be systematically lenient
        base = best_time(old, name, old_q[name])
        norm = best_time(new, name, t) / factor
        if base >= 0 and norm >= args.ratio * base and norm >= args.min_sec:
            # downgrade only when the stall EXPLAINS the excess: with the
            # stalled share removed the query would sit under the ratio.
            # A genuine regression that merely coincides with some stall
            # (e.g. a plan change scanning 10x the bytes) stays REGRESS.
            frac = stall_frac(name)
            if (not args.strict and frac >= 0.25
                    and norm * (1 - frac) < args.ratio * base):
                stalled.append((name, base, t, frac))
            else:
                flagged.append((name, base, t, norm))
        elif base >= args.min_sec and norm <= base / args.ratio:
            improvements.append((name, base, t))

    # contiguous flagged blocks in run order = a load spike sweeping the
    # sequential run, not per-query regressions. Queries that CANNOT be
    # flagged (errored, NEW, sub-floor) are neutral: they must neither
    # split a genuine spike block nor bridge two distant flagged queries.
    order = sorted(new_q)  # bench runs alphabetically, including errored
    pos = {n: i for i, n in enumerate(order)}
    # HOSTSTALL-downgraded names are neutral like errored/NEW ones: they
    # were flag-worthy and host-blocked, so they must neither split a
    # spike block sweeping across them nor count as clean separators
    stalled_names = {s[0] for s in stalled}
    can_flag = {n for n, t in new_q.items()
                if t >= 0 and n in old_q and n not in stalled_names and
                best_time(new, n, t) / factor >= args.min_sec}
    flagged.sort(key=lambda f: pos[f[0]])
    def contiguous(a, b):
        """No flaggable-but-unflagged query sits between a and b."""
        return all(order[i] not in can_flag
                   for i in range(pos[a] + 1, pos[b]))
    def family(name):
        """First two underscore segments: p_dedup_ngram -> p_dedup."""
        return "_".join(name.split("_")[:2])

    def is_spike(blk):
        """A contiguous block downgrades to LOADSPIKE only with
        independent corroboration: the host calibration moved, or the
        block spans unrelated operator families (a real regression in
        one family is contiguous too, since queries run alphabetically)."""
        if args.strict or len(blk) < SPIKE_BLOCK_LEN:
            return False
        calib_moved = abs(factor - 1.0) >= 0.15
        families = {family(f[0]) for f in blk}
        # IO-stall corroboration: at least HALF the block measurably
        # blocked on host IO. A single member with 10% incidental stall
        # must not downgrade a one-family block — that is exactly the
        # shape of a genuine family regression the family rule protects.
        io_evidence = (
            sum(1 for f in blk if stall_frac(f[0]) >= 0.10) * 2 >= len(blk))
        return calib_moved or len(families) >= 3 or io_evidence

    spikes, regressions, block = [], [], []
    for f in flagged:
        if block and contiguous(block[-1][0], f[0]):
            block.append(f)
        else:
            (spikes if is_spike(block) else regressions).extend(block)
            block = [f]
    (spikes if is_spike(block) else regressions).extend(block)

    rnd = old.get("round")
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(new_q)} queries, baseline {len(old_q)}"
          + (f", flagging vs round {rnd} minima" if rnd else "") + ")")
    if envelope is not None:
        # context column: how far the run sits from the all-time minima
        # ratchet — informational only, never flagged on
        env_q = envelope["queries"]
        ec = calib_of(envelope)
        efac = max(CLAMP_LO, min(CLAMP_HI, nc / ec)) if nc and ec else factor
        common = [n for n, t in new_q.items() if t >= 0 and n in env_q]
        if common:
            nsum = sum(best_time(new, n, new_q[n]) for n in common) / efac
            esum = sum(env_q[n] for n in common)
            print(f"envelope (all-time minima, context only): "
                  f"{esum:.1f}s vs this run {nsum:.1f}s normalized "
                  f"= {nsum / esum:.2f}x over {len(common)} queries")
    for name, t in fresh:
        print(f"NEW      {name:24s} {t:7.2f}s")
    for name, base, t in improvements:
        print(f"FASTER   {name:24s} {base:7.2f}s -> {t:7.2f}s ({t / base:.2f}x)")
    for name in errored:
        print(f"ERRORED  {name:24s}")
    for name, base, t, frac in stalled:
        print(f"HOSTSTALL {name:23s} {base:7.2f}s -> {t:7.2f}s "
              f"({frac:.0%} of its wall in full-IO stall; not a plan)")
    for name, base, t, norm in spikes:
        print(f"LOADSPIKE {name:23s} {base:7.2f}s -> {t:7.2f}s "
              f"(contiguous block; re-measure in isolation)")
    for name, base, t, norm in regressions:
        env_note = ""
        if envelope is not None and name in envelope["queries"]:
            ebase = envelope["queries"][name]
            if ebase > 0:
                env_note = f", {norm / ebase:.1f}x envelope"
        print(f"REGRESS  {name:24s} {base:7.2f}s -> {t:7.2f}s "
              f"({norm / base:.1f}x normalized{env_note})")
    print(f"REGRESSIONS: {len(regressions) + len(errored)}"
          + (f"  (+{len(spikes)} in load-spike blocks)" if spikes else ""))
    return 1 if regressions or errored else 0


if __name__ == "__main__":
    sys.exit(main())
