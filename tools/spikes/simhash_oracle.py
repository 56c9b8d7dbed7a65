"""Prototype the p_dedup_simhash DuckDB oracle vs a Python reimpl."""
import duckdb, re, sys
sys.path.insert(0, '/root/repo/tools/spikes')
from xxh64_sql import xxh64_ctes, ref

def py_simhash(text):
    toks = re.split(r'\s+', text.strip().lower())
    cnt = max(len(toks) - 2, 1)
    sh, seen = [], set()
    for i in range(cnt):
        s = ' '.join(toks[i:i+3])
        if s not in seen: seen.add(s); sh.append(s)
    hs = [ref(s.encode('utf-8')) for s in sh]   # unsigned
    sim = 0
    for j in range(64):
        votes = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if votes > 0: sim |= (1 << j)
    return sim

def py_pairs(docs, max_h=6, max_bucket=10000):
    sims = {d: py_simhash(t) for d, t in docs}
    from collections import defaultdict
    buckets = defaultdict(list)
    for d, s in sims.items():
        for c in range(4):
            buckets[(c, (s >> (16*c)) & 0xFFFF)].append(d)
    pairs = set()
    for ids in buckets.values():
        if len(ids) < 2 or len(ids) > max_bucket: continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i+1, len(ids)):
                h = bin(sims[ids[i]] ^ sims[ids[j]]).count('1')
                if h <= max_h: pairs.add((ids[i], ids[j], h))
    return pairs

ORACLE = """
sh AS MATERIALIZED (
  SELECT doc_id, i AS idx, array_to_string(list_slice(toks, i, i + 2), ' ') AS s
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
        FROM documents),
       unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS t(i)
),
shd AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY min(idx)) AS sidx, s
  FROM sh GROUP BY doc_id, s
),
hin AS MATERIALIZED (SELECT doc_id * 1000000 + sidx AS k, s FROM shd),
XXHCTES,
hs AS MATERIALIZED (SELECT k // 1000000 AS doc_id, h FROM xres),
bits AS MATERIALIZED (
  SELECT doc_id, j,
         sum(CASE WHEN (h // (1::HUGEINT << j)) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM hs, unnest(range(0, 64)) AS t(j)
  GROUP BY doc_id, j
),
sims AS MATERIALIZED (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS simu
  FROM bits GROUP BY doc_id
),
chunked AS MATERIALIZED (
  SELECT doc_id, simu, c AS chunk, (simu // (1::HUGEINT << (16*c))) % 65536 AS cv
  FROM sims, unnest(range(0, 4)) AS t(c)
),
ok AS MATERIALIZED (
  SELECT chunk, cv FROM chunked GROUP BY chunk, cv
  HAVING count(*) > 1 AND count(*) <= 10000
),
inb AS MATERIALIZED (SELECT c.* FROM chunked c JOIN ok USING (chunk, cv))
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simu::UBIGINT, y.simu::UBIGINT)) AS INTEGER) AS hamming
FROM inb x JOIN inb y
  ON x.chunk = y.chunk AND x.cv = y.cv AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simu::UBIGINT, y.simu::UBIGINT)) <= 6
"""

con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('/root/testdata/sf0.01/documents.parquet')")
sql = "WITH RECURSIVE " + ORACLE.replace("XXHCTES", xxh64_ctes("hin", key="k", s="s")) + " ORDER BY a, b"
import time
t0=time.time()
got = set(map(tuple, con.execute(sql).fetchall()))
print(f"{time.time()-t0:.1f}s  {len(got)} pairs")
docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
want = py_pairs(docs)
print("ALL MATCH" if got == want else f"MISMATCH: sql-only={len(got-want)} py-only={len(want-got)}")
for p in list(got-want)[:3]: print("sql-only", p)
for p in list(want-got)[:3]: print("py-only", p)
