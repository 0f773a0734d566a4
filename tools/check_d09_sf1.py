#!/usr/bin/env python3
"""Independent cross-check of d09 (duplicate clustering) at large scale.

The official DuckDB twin (recursive-CTE transitive closure) is
quadratic-in-component in the label set it materializes — fine at the
driver's sf0.01 gate scale, but the corpus's ~500-doc near-dup families
make it impractically slow at a 10x corpus. At that scale this script is
the oracle instead: a THIRD, independent implementation (union-find over
the candidate-pair set, which is itself DuckDB-verified as d03) compared
row-for-row against Spark's d09 output. Same contract: cluster(sid) =
min doc_id of sid's connected component over the LSH candidate pairs.

Usage: check_d09_sf1.py <verify_out_dir>   (expects d03_*/d09_* parquet dumps)
"""
import duckdb, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v_sf1"
con = duckdb.connect()
pairs = con.execute(
    f"SELECT doc_a, doc_b FROM read_parquet('{out}/d03_lsh_pairs/*.parquet')").fetchall()

parent = {}
def find(x):
    r = x
    while parent[r] != r:
        r = parent[r]
    while parent[x] != r:
        parent[x], x = r, parent[x]
    return r

for a, b in pairs:
    parent.setdefault(a, a)
    parent.setdefault(b, b)
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)

expect = {sid: find(sid) for sid in parent}

got = dict(con.execute(
    f"SELECT sid, cluster FROM read_parquet('{out}/d09_dup_clusters/*.parquet')").fetchall())

missing = set(expect) ^ set(got)
diff = [s for s in expect if s in got and expect[s] != got[s]]
print(f"pairs={len(pairs)} nodes={len(expect)} "
      f"components={len(set(expect.values()))}")
if missing or diff:
    print(f"MISMATCH: sym-diff nodes={len(missing)} wrong-cluster={len(diff)}")
    for s in (list(missing)[:5] + diff[:5]):
        print(" ", s, "expect", expect.get(s), "got", got.get(s))
    sys.exit(1)
print("d09 OK (union-find cross-check)")

# d16 (quality-aware canonicalization): composed from the same union-find
# clusters + the DuckDB-verified t02 quality dump — representative = max
# quality, min id among ties. Independent of Spark's d16 plan end-to-end
# (both inputs carry their own linear-cost DuckDB verification at 10x).
import glob
if glob.glob(f"{out}/d16_cluster_canon"):
    qual = dict(con.execute(
        f"SELECT did, quality FROM read_parquet('{out}/t02_quality/*.parquet')").fetchall())
    members = {}
    for sid, cl in expect.items():
        members.setdefault(cl, []).append(sid)
    exp16 = {}
    for cl, sids in members.items():
        rep = min(sids, key=lambda s: (-qual[s], s))
        for s in sids:
            exp16[s] = (cl, qual[s], len(sids), 1 if s == rep else 0)
    got16 = {r[0]: tuple(r[1:]) for r in con.execute(
        f"SELECT did, cluster, quality, n_members, keep "
        f"FROM read_parquet('{out}/d16_cluster_canon/*.parquet')").fetchall()}
    m16 = set(exp16) ^ set(got16)
    d16 = [s for s in exp16 if s in got16 and exp16[s] != got16[s]]
    if m16 or d16:
        print(f"d16 MISMATCH: sym-diff={len(m16)} wrong={len(d16)}")
        for s in (list(m16)[:5] + d16[:5]):
            print(" ", s, "expect", exp16.get(s), "got", got16.get(s))
        sys.exit(1)
    print(f"d16 OK (union-find + verified-quality composition, "
          f"keeps={sum(v[3] for v in exp16.values())})")
