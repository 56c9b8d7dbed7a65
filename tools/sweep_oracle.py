#!/usr/bin/env python3
"""Parallel, timeout-bounded oracle sweep — check_oracle.py's compare
(typed Arrow values, column-sorted) fanned out over worker PROCESSES with
a per-oracle wall budget. Several DuckDB mirrors are honest quadratics
(all-pairs Jaccard, recursive closures) that run effectively
single-threaded; serially they gate the sweep on the slowest entry, and
without a budget one pathological mirror hangs the whole run. Workers
give each oracle its own connection (sibling oracles keep the other
cores busy) and a TIMEOUT verdict instead of a hang.

Usage: sweep_oracle.py <verify_outdir> <sfdir> [--timeout S] [--jobs N]
                       [--only name1,name2,...]
Writes <verify_outdir>/sweep_summary.json and prints one line per entry.
Exit 0 iff every compared entry is OK (timeouts count as failures).
"""
import json, sys, glob, time, multiprocessing as mp

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
timeout = 900.0
jobs = 8
only = None
args = sys.argv[3:]
while args:
    a = args.pop(0)
    if a == '--timeout': timeout = float(args.pop(0))
    elif a == '--jobs': jobs = int(args.pop(0))
    elif a == '--only': only = set(args.pop(0).split(','))
    else: raise SystemExit(f'unknown arg {a}')

TABLES = ['customer','orders','lineitem','nation','region','part','supplier',
          'documents','embeddings','events']


def typed_norm(tab):
    cols = sorted(tab.column_names)
    data = [tab.column(c).to_pylist() for c in cols]
    out = []
    for i in range(tab.num_rows):
        vals = []
        for col in data:
            v = col[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(f'{type(v).__name__}:{v}')
        out.append('|'.join(vals))
    return sorted(out), cols


def check_one(name, sql):
    """Runs in a worker process: fresh DuckDB connection per oracle."""
    import duckdb
    t0 = time.time()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        return (name, 'MISS', 'no spark output', time.time() - t0)
    stab = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_arrow_table()
    try:
        otab = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        return (name, 'ORACLE-ERR', str(e)[:200], time.time() - t0)
    sn, sc = typed_norm(stab)
    on, oc = typed_norm(otab)
    if sc != oc:
        return (name, 'COLS', f'spark={sc} oracle={oc}', time.time() - t0)
    if sn != on:
        oset, sset = set(on), set(sn)
        diff = [x for x in sn if x not in oset][:2] + ['---'] + \
               [x for x in on if x not in sset][:2]
        return (name, 'ROWS', f'spark={len(sn)} oracle={len(on)} e.g. {diff}',
                time.time() - t0)
    if len(sn) == 0:
        # empty-equals-empty proves nothing about the operator: a sample
        # predicate that breaks the fixture's pair structure (the r14
        # p_mm_dedup finding) passes this way. Distinct verdict so the
        # summary names it instead of folding it into OK.
        return (name, 'VACUOUS', 'rows=0 on both sides', time.time() - t0)
    return (name, 'OK', f'rows={len(sn)}', time.time() - t0)


def _worker(conn, name, sql, outdir_, sfdir_):
    global outdir, sfdir
    outdir, sfdir = outdir_, sfdir_
    conn.send(check_one(name, sql))


def main():
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))
    names = sorted(n for n in oracle if only is None or n in only)
    results = {}
    # one process per in-flight oracle; kill-on-timeout needs processes,
    # not threads (DuckDB queries are not interruptible from Python)
    pending = list(names)
    running = {}  # name -> (Process, parent_conn, t_start)
    ctx = mp.get_context('spawn')

    def launch(name):
        parent, child = ctx.Pipe()
        p = ctx.Process(target=_worker,
                        args=(child, name, oracle[name], outdir, sfdir))
        p.start()
        running[name] = (p, parent, time.time())

    while pending or running:
        while pending and len(running) < jobs:
            launch(pending.pop(0))
        time.sleep(0.2)
        for name in list(running):
            p, parent, t0 = running[name]
            if parent.poll():
                res = parent.recv()
                p.join()
                del running[name]
                results[name] = res
                print(f'{res[1]:<10} {name} {res[2]} ({res[3]:.1f}s)', flush=True)
            elif time.time() - t0 > timeout:
                # DuckDB ignores SIGTERM mid-query — escalate to SIGKILL
                p.terminate(); p.join(5)
                if p.is_alive():
                    p.kill(); p.join()
                del running[name]
                results[name] = (name, 'TIMEOUT', f'>{timeout:.0f}s', timeout)
                print(f'TIMEOUT    {name} >{timeout:.0f}s', flush=True)

    bad = {n: r for n, r in results.items()
           if r[1] not in ('OK', 'VACUOUS')}
    vacuous = sorted(n for n, r in results.items() if r[1] == 'VACUOUS')
    summary = {
        'sfdir': sfdir, 'timeout_s': timeout, 'total': len(results),
        'ok': len(results) - len(bad) - len(vacuous),
        'fails': sorted(n for n, r in bad.items() if r[1] not in ('TIMEOUT',)),
        'timeouts': sorted(n for n, r in bad.items() if r[1] == 'TIMEOUT'),
        'vacuous': vacuous,
        'seconds': {n: round(r[3], 1) for n, r in results.items()},
    }
    with open(f'{outdir}/sweep_summary.json', 'w') as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"FAILS: {len(summary['fails'])}  TIMEOUTS: {len(summary['timeouts'])}"
          f"  VACUOUS: {len(vacuous)}  OK: {summary['ok']}/{summary['total']}")
    sys.exit(1 if bad else 0)


if __name__ == '__main__':
    main()
