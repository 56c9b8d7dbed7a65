"""Prototype the p_fingerprint DuckDB oracle: winnowing fingerprints
(xxh64 over 4-word shingles, window-4 min) vs a Python reimplementation."""
import duckdb, re, sys
sys.path.insert(0, '/root/repo/tools/spikes')
from xxh64_sql import xxh64_ctes, ref

def signed(x): return x - (1<<64) if x >= (1<<63) else x

def py_fingerprints(text, k=4, window=4):
    toks = re.split(r'\s+', text.strip().lower())
    cnt = max(len(toks) - (k-1), 1)
    sh, seen = [], set()
    for i in range(cnt):
        s = ' '.join(toks[i:i+k])
        if s not in seen: seen.add(s); sh.append(s)
    hs = [signed(ref(s.encode('utf-8'))) for s in sh]
    wcnt = max(len(hs) - (window-1), 1)
    mins = [min(hs[i:i+window]) for i in range(wcnt)]
    return (len(set(mins)), min(mins))

ORACLE = """
sh AS MATERIALIZED (
  SELECT doc_id, i AS idx, array_to_string(list_slice(toks, i, i + 3), ' ') AS s
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
        FROM documents),
       unnest(range(1, greatest(len(toks) - 3, 1) + 1)) AS t(i)
),
shd AS MATERIALIZED (
  SELECT doc_id, idx, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS sidx
  FROM (SELECT doc_id, idx, s,
               row_number() OVER (PARTITION BY doc_id, s ORDER BY idx) AS occ
        FROM sh)
  WHERE occ = 1
),
hin AS MATERIALIZED (
  SELECT doc_id * 1000000 + sidx AS k, s FROM shd
),
XXHCTES,
hs AS MATERIALIZED (
  SELECT k // 1000000 AS doc_id, k % 1000000 AS sidx,
         CASE WHEN h >= 9223372036854775808::HUGEINT
              THEN (h - 18446744073709551616::HUGEINT)::BIGINT
              ELSE h::BIGINT END AS h
  FROM xres
),
hl AS MATERIALIZED (
  SELECT doc_id, list(h ORDER BY sidx) AS hs FROM hs GROUP BY doc_id
),
mins AS MATERIALIZED (
  SELECT doc_id, list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                                i -> list_min(hs[i:i+3])) AS mins
  FROM hl
)
SELECT doc_id, CAST(len(list_distinct(mins)) AS INTEGER) AS n_fp,
       list_min(mins) AS fp_min
FROM mins
"""

con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('/root/testdata/sf0.01/documents.parquet')")
sql = "WITH RECURSIVE " + ORACLE.replace("XXHCTES", xxh64_ctes("hin", key="k", s="s")) + " ORDER BY doc_id"
import time
t0=time.time()
got = con.execute(sql).fetchall()
print(f"{time.time()-t0:.1f}s  {len(got)} rows")
docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
bad=0
for (did, nfp, fpm), (did2, text) in zip(got, docs):
    assert did == did2
    w = py_fingerprints(text)
    if (nfp, fpm) != w:
        if bad < 3: print("MISMATCH doc", did, (nfp,fpm), w)
        bad += 1
print("ALL MATCH" if bad==0 else f"{bad}/{len(got)} mismatches")
