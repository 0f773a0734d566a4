#!/usr/bin/env python3
"""Independent large-scale cross-check of d19 (verbatim-family clustering).

d19's DuckDB twin computes shingles + 16 minhashes for EVERY doc of the
verbatim corpus; on the 10x upscale that is 50k signature computations whose
cost the recursive engine pays serially. But the corpus is verbatim by
construction — every doc carries its family head's text — so signatures are
a FAMILY-level quantity: compute them once per family (10x corpus = 2,500
families), derive the band keys, union-find families sharing a band key,
and expand components back to docs. Semantics replicated exactly:

 - shingle hash: 8-char rolling (acc*31 + ascii) % 2147483647, 1-based substr
 - minhash j: min over shingles of (A_j * t + B_j) % P, A/B from Oracles.scala
 - bands: k=16, r=4 -> 4 keys of 4 '_'-joined minhashes
 - docs with text shorter than 8 chars have no shingles -> NULL minhashes ->
   NULL band keys -> never match any band join (both engines drop them)
 - output contract (same as d09): only docs that appear in >=1 candidate
   pair are emitted; cluster = min doc_id of the pair-graph component.
   A doc participates iff its family has >=2 docs (same text -> identical
   signature -> same band keys -> in-family pairs) or its family shares a
   band key with another family.

Usage: check_d19_sf1.py <sf_dir> <verify_out_dir>
"""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/testdata_sf1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r6_vsf1"
P = 2147483647

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")

hash8 = "cast(0 AS bigint)"
for j in range(8):
    hash8 = f"({hash8}*31 + ascii(substr(text, cast(i+{j} AS int), 1)))"


def mh(j):
    a = (2654435761 * (j + 1)) % P
    b = (1013904223 * (j + 1)) % P
    return f"list_min(list_transform(stoks, t -> ({a}*cast(t AS bigint) + {b}) % {P}))"


sig_cols = ",\n    ".join(f"{mh(j)} AS m{j}" for j in range(16))
bands = " UNION ALL ".join(
    "SELECT fam, %d AS band_idx, %s AS band_key FROM fsig" % (
        bi, " || '_' || ".join(f"cast(m{bi*4+o} AS varchar)" for o in range(4)))
    for bi in range(4))

rows = con.execute(f"""
WITH heads AS (
  SELECT doc_id // 20 AS fam, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY doc_id // 20 ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1),
fshing AS (
  SELECT fam, list_distinct(list_transform(
    range(1, greatest(length(text)-7, 0)+1),
    i -> cast({hash8} % {P} AS int))) AS stoks
  FROM heads),
fsig AS (SELECT fam, {sig_cols} FROM fshing),
fbands AS ({bands})
SELECT fam, band_idx, band_key FROM fbands WHERE band_key IS NOT NULL
""").fetchall()

fam_docs = {}
for did, fam in con.execute("SELECT doc_id, doc_id // 20 FROM documents").fetchall():
    fam_docs.setdefault(fam, []).append(did)

parent = {}
def find(x):
    r = x
    while parent[r] != r:
        r = parent[r]
    while parent[x] != r:
        parent[x], x = r, parent[x]
    return r

by_key = {}
for fam, bi, bk in rows:
    by_key.setdefault((bi, bk), []).append(fam)
has_edge = set()
for fams in by_key.values():
    for f in fams:
        parent.setdefault(f, f)
    if len(fams) > 1:
        has_edge.update(fams)
        r0 = find(fams[0])
        for f in fams[1:]:
            rf = find(f)
            if rf != r0:
                parent[max(r0, rf)] = min(r0, rf)
                r0 = min(r0, rf)

comp = {}
for f in parent:
    comp.setdefault(find(f), []).append(f)

expect = {}
for fams in comp.values():
    multi = len(fams) > 1
    members = [d for f in fams for d in fam_docs[f]
               if multi or f in has_edge or len(fam_docs[f]) >= 2]
    if not members:
        continue
    label = min(members)
    for d in members:
        expect[d] = label

got = dict(con.execute(
    f"SELECT sid, cluster FROM read_parquet('{out}/d19_clusters_verbatim/*.parquet')").fetchall())

missing = set(expect) ^ set(got)
diff = [s for s in expect if s in got and expect[s] != got[s]]
print(f"families={len(fam_docs)} banded={len(parent)} "
      f"components={len(comp)} expected-docs={len(expect)}")
if missing or diff:
    print(f"d19 MISMATCH: sym-diff nodes={len(missing)} wrong-cluster={len(diff)}")
    for s in (sorted(missing)[:5] + diff[:5]):
        print(" ", s, "expect", expect.get(s), "got", got.get(s))
    sys.exit(1)
print("d19 OK (family-level union-find cross-check)")
