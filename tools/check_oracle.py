#!/usr/bin/env python3
"""Driver-style correctness check: compare Verify output parquet vs DuckDB oracle."""
import duckdb, json, sys, glob, os, math

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['customer','orders','lineitem','nation','region','part','supplier','documents','embeddings','events']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append('|'.join(vals))
    return sorted(out), [cols[i] for i in order]

fails = 0
for name in sorted(oracle):
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f'MISS {name}: no spark output'); fails += 1; continue
    sq = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    scols = [d[0] for d in sq.description]; srows = sq.fetchall()
    try:
        oq = con.execute(oracle[name])
        ocols = [d[0] for d in oq.description]; orows = oq.fetchall()
    except Exception as e:
        print(f'ORACLE-ERR {name}: {e}'); fails += 1; continue
    sn, sc = norm(srows, scols); on, oc = norm(orows, ocols)
    if sc != oc:
        print(f'COLS {name}: spark={sc} oracle={oc}'); fails += 1
    elif sn != on:
        diff = [x for x in sn if x not in set(on)][:3] + ['---'] + [x for x in on if x not in set(sn)][:3]
        print(f'ROWS {name}: spark={len(sn)} oracle={len(on)} e.g. {diff[:7]}'); fails += 1
    else:
        print(f'OK   {name} rows={len(sn)}')
print('FAILS:', fails)
sys.exit(1 if fails else 0)
