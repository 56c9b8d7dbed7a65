#!/usr/bin/env python3
"""Driver-style correctness check: compare Verify output parquet vs DuckDB oracle.

Dtype-strict: both sides are fetched as Arrow tables and values are rendered
WITH their Python type, so a DuckDB HUGEINT/DECIMAL aggregate (-> Decimal)
vs a Spark BIGINT (-> int) fails locally the same way the driver's value
hasher does. (The old str(v)-only compare hid exactly that divergence and
let the p_curate HUGEINT bug survive three driver rounds.)
"""
import duckdb, json, sys, glob

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['customer','orders','lineitem','nation','region','part','supplier','documents','embeddings','events']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def typed_norm(tab):
    """Sort columns by name, render each value as '<pytype>:<str>' (floats
    rounded to 6dp first). int vs Decimal vs float all render distinctly."""
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

fails = 0
for name in sorted(oracle):
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f'MISS {name}: no spark output'); fails += 1; continue
    stab = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_arrow_table()
    try:
        otab = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f'ORACLE-ERR {name}: {e}'); fails += 1; continue
    sn, sc = typed_norm(stab)
    on, oc = typed_norm(otab)
    if sc != oc:
        print(f'COLS {name}: spark={sc} oracle={oc}'); fails += 1
    elif sn != on:
        oset = set(on); sset = set(sn)
        diff = [x for x in sn if x not in oset][:3] + ['---'] + [x for x in on if x not in sset][:3]
        print(f'ROWS {name}: spark={len(sn)} oracle={len(on)} e.g. {diff[:7]}'); fails += 1
    else:
        print(f'OK   {name} rows={len(sn)}')
print('FAILS:', fails)
sys.exit(1 if fails else 0)
