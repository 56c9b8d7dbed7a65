"""Prototype: XXH64(seed=42) in pure DuckDB SQL, validated against a
from-the-spec Python reference. Feeds the p_fingerprint/p_dedup_simhash
oracle generators."""
import duckdb, random, string

M = "18446744073709551616::HUGEINT"
P1,P2,P3,P4,P5 = "11400714785074694791::HUGEINT","14029467366897019727::HUGEINT","1609587929392839161::HUGEINT","9650029242287828579::HUGEINT","2870177450012600261::HUGEINT"

def mul(x, y):
    return (f"((({x})%4294967296)*(({y})%4294967296) + "
            f"(((({x})//4294967296)*(({y})%4294967296) + (({x})%4294967296)*(({y})//4294967296)) % 4294967296) * 4294967296) % {M}")
def add(x, y): return f"((({x}) + ({y})) % {M})"
def rotl(x, r): return f"(((({x}) * {1<<r}::HUGEINT) % {M} + (({x}) // {1<<(64-r)}::HUGEINT)) % {M})"
def xor(x, y): return f"xor(({x})::UBIGINT, ({y})::UBIGINT)::HUGEINT"
def shr(x, r): return f"(({x}) // {1<<r}::HUGEINT)"

def lane8(b, off):  # 8-byte little-endian from list b at 1-based offset off
    return "(" + " + ".join(f"({b}[{off}+{j}]::HUGEINT)*{256**j}::HUGEINT" for j in range(8)) + ")"
def lane4(b, off):
    return "(" + " + ".join(f"({b}[{off}+{j}]::HUGEINT)*{256**j}::HUGEINT" for j in range(4)) + ")"

def xxh64_ctes(src, key="k", s="s", seed=42, pfx="x"):
    """CTE chain computing XXH64(seed) of the UTF-8 bytes of column s in
    CTE/table `src`. Result CTE: {pfx}res(key, hash HUGEINT in [0,2^64))."""
    seedH = f"{seed}::HUGEINT"
    ctes = []
    ctes.append(f"""{pfx}by AS MATERIALIZED (
  SELECT {key} AS k, flatten(list_transform(
    list_transform(range(1, length({s})+1), i -> unicode(substring({s}, i, 1))),
    cp -> CASE WHEN cp < 128 THEN [cp]
               WHEN cp < 2048 THEN [192 + cp//64, 128 + cp%64]
               WHEN cp < 65536 THEN [224 + cp//4096, 128 + (cp//64)%64, 128 + cp%64]
               ELSE [240 + cp//262144, 128 + (cp//4096)%64, 128 + (cp//64)%64, 128 + cp%64] END)) AS b
  FROM {src})""")
    ctes.append(f"{pfx}bn AS MATERIALIZED (SELECT k, b, len(b) AS n, len(b)//32 AS ns FROM {pfx}by)")
    # stripe fold (len >= 32)
    a1i = add(add(seedH, P1), P2); a2i = add(seedH, P2); a3i = seedH
    a4i = f"(({seedH} - {P1} + {M}) % {M})"
    def stripe_step(acc, lane):
        t = add(acc, mul(lane, P2))
        return mul(rotl(f"q.t{acc[-1]}", 31), P1), t   # placeholder pattern
    # build recursive term with an inner subquery computing t1..t4 first
    lanes = [lane8("r.b", f"(r.i*32+{off}+1)") for off in (0,8,16,24)]
    inner = ", ".join(f"{add(f'r.a{j+1}', mul(lanes[j], P2))} AS t{j+1}" for j in range(4))
    outer = ", ".join(f"{mul(rotl(f'q.t{j+1}', 31), P1)} AS a{j+1}" for j in range(4))
    ctes.append(f"""{pfx}st AS (
  SELECT k, b, n, ns, 0 AS i, {a1i} AS a1, {a2i} AS a2, {a3i} AS a3, {a4i} AS a4
  FROM {pfx}bn WHERE n >= 32
  UNION ALL
  SELECT q.k, q.b, q.n, q.ns, q.i + 1, {outer}
  FROM (SELECT r.k, r.b, r.n, r.ns, r.i, {inner}
        FROM {pfx}st r WHERE r.i < r.ns) q)""")
    # converged stripe rows + merge accumulators
    mg = []
    h0 = f"{add(add(rotl('a1',1), rotl('a2',7)), add(rotl('a3',12), rotl('a4',18)))}"
    ctes.append(f"""{pfx}sd AS MATERIALIZED (
  SELECT k, b, n, ns, a1, a2, a3, a4, {h0} AS h
  FROM (SELECT *, row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn FROM {pfx}st) WHERE rn = 1)""")
    for j in range(1, 5):
        ctes.append(f"""{pfx}m{j} AS MATERIALIZED (
  SELECT k, b, n, ns, a1, a2, a3, a4, {add(mul(xor('h', mul(rotl(mul(f'a{j}', P2), 31), P1)), P1), P4)} AS h FROM {pfx}m{j-1 if j>1 else 'X'})""".replace(f"{pfx}mX", f"{pfx}sd"))
    # short path + unify; add length; tail position p = ns*32 (0-based consumed)
    ctes.append(f"""{pfx}t0 AS MATERIALIZED (
  SELECT k, b, n, n//32*32 AS p, {add('h', 'n')} AS h FROM {pfx}m4
  UNION ALL
  SELECT k, b, n, 0 AS p, {add(add(seedH, P5), 'n')} AS h FROM {pfx}bn WHERE n < 32)""")
    # up to 3 8-byte rounds
    for j in range(1, 4):
        k8 = lane8("b", "(p+1)")
        ctes.append(f"""{pfx}e{j} AS MATERIALIZED (
  SELECT k, b, n, CASE WHEN p + 8 <= n THEN p + 8 ELSE p END AS p,
         CASE WHEN p + 8 <= n THEN {add(mul(rotl(xor('h', mul(rotl(mul(k8, P2), 31), P1)), 27), P1), P4)} ELSE h END AS h
  FROM {pfx}e{j-1 if j>1 else 'X'})""".replace(f"{pfx}eX", f"{pfx}t0"))
    # one 4-byte round
    k4 = lane4("b", "(p+1)")
    ctes.append(f"""{pfx}f AS MATERIALIZED (
  SELECT k, b, n, CASE WHEN p + 4 <= n THEN p + 4 ELSE p END AS p,
         CASE WHEN p + 4 <= n THEN {add(mul(rotl(xor('h', mul(k4, P1)), 23), P2), P3)} ELSE h END AS h
  FROM {pfx}e3)""")
    # up to 3 single-byte rounds
    for j in range(1, 4):
        b1 = "(b[p+1]::HUGEINT)"
        ctes.append(f"""{pfx}g{j} AS MATERIALIZED (
  SELECT k, b, n, CASE WHEN p < n THEN p + 1 ELSE p END AS p,
         CASE WHEN p < n THEN {mul(rotl(xor('h', mul(b1, P5)), 11), P1)} ELSE h END AS h
  FROM {pfx}g{j-1 if j>1 else 'X'})""".replace(f"{pfx}gX", f"{pfx}f"))
    # avalanche
    s1 = xor('h', shr('h', 33)); 
    ctes.append(f"{pfx}v1 AS MATERIALIZED (SELECT k, {mul(s1, P2)} AS h FROM {pfx}g3)")
    s2 = xor('h', shr('h', 29))
    ctes.append(f"{pfx}v2 AS MATERIALIZED (SELECT k, {mul(s2, P3)} AS h FROM {pfx}v1)")
    ctes.append(f"{pfx}res AS MATERIALIZED (SELECT k, {xor('h', shr('h', 32))} AS h FROM {pfx}v2)")
    return ",\n".join(ctes)

# ---------- validate ----------
MASKI=(1<<64)-1
_P1,_P2,_P3,_P4,_P5 = 11400714785074694791,14029467366897019727,1609587929392839161,9650029242287828579,2870177450012600261
def _rotl(x,r): return ((x<<r)|(x>>(64-r)))&MASKI
def ref(data, seed=42):
    n=len(data); i=0
    if n>=32:
        a=[(seed+_P1+_P2)&MASKI,(seed+_P2)&MASKI,seed&MASKI,(seed-_P1)&MASKI]
        while i+32<=n:
            for j in range(4):
                lane=int.from_bytes(data[i+8*j:i+8*j+8],'little')
                a[j]=(_rotl((a[j]+lane*_P2)&MASKI,31)*_P1)&MASKI
            i+=32
        h=(_rotl(a[0],1)+_rotl(a[1],7)+_rotl(a[2],12)+_rotl(a[3],18))&MASKI
        for x in a: h=((h ^ ((_rotl((x*_P2)&MASKI,31)*_P1)&MASKI))*_P1+_P4)&MASKI
    else: h=(seed+_P5)&MASKI
    h=(h+n)&MASKI
    while i+8<=n:
        kk=int.from_bytes(data[i:i+8],'little')
        h=(h ^ ((_rotl((kk*_P2)&MASKI,31)*_P1)&MASKI))&MASKI
        h=(_rotl(h,27)*_P1+_P4)&MASKI; i+=8
    if i+4<=n:
        kk=int.from_bytes(data[i:i+4],'little')
        h=(h ^ (kk*_P1)&MASKI)&MASKI
        h=(_rotl(h,23)*_P2+_P3)&MASKI; i+=4
    while i<n:
        h=(h ^ (data[i]*_P5)&MASKI)&MASKI
        h=(_rotl(h,11)*_P1)&MASKI; i+=1
    h^=h>>33; h=(h*_P2)&MASKI; h^=h>>29; h=(h*_P3)&MASKI; h^=h>>32
    return h

if __name__ == "__main__":
    rnd = random.Random(7)
    tests = ["", "a", "abcd", "hello world", "exactly-32-bytes-string-here!!!!",
             "a"*31, "b"*32, "c"*33, "d"*100, "汉字 test 混合 string",
             "七十年代末 一个小人物"]
    for L in (7,8,9,15,16,17,31,32,33,63,64,65,100,200):
        tests.append(''.join(rnd.choice(string.ascii_letters+' äöü汉') for _ in range(L)))
    con = duckdb.connect()
    con.execute("CREATE TABLE strs(k INT, s VARCHAR)")
    for i,t in enumerate(tests): con.execute("INSERT INTO strs VALUES (?,?)",[i,t])
    sql = "WITH RECURSIVE " + xxh64_ctes("strs") + "\nSELECT k, h FROM xres ORDER BY k"
    got = dict(con.execute(sql).fetchall())
    bad = 0
    for i,t in enumerate(tests):
        want = ref(t.encode('utf-8'))
        if int(got[i]) != want:
            print("MISMATCH", i, repr(t[:20]), int(got[i]), want); bad += 1
    print("ALL MATCH" if bad==0 else f"{bad} mismatches", f"({len(tests)} cases)")
