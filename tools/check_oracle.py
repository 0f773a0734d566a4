#!/usr/bin/env python3
"""Local dry-run of the driver's correctness gate:
run each oracle SQL in DuckDB over the sf parquet tables, compare to the
Spark result parquet (column names sorted, rows sorted, values hashed)."""
import duckdb, json, sys, glob, os, hashlib

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None: return "\x00"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines: h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

ok = fail = 0
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d): continue
    sp = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    sp_cols = [c[0] for c in sp.description]; sp_rows = sp.fetchall()
    if name not in oracles:
        results[name] = f"ROWS_ONLY rows={len(sp_rows)}"
        print(f"{name:24s} ROWS_ONLY rows={len(sp_rows)}")
        continue
    try:
        oq = con.execute(oracles[name])
        o_cols = [c[0] for c in oq.description]; o_rows = oq.fetchall()
    except Exception as e:
        results[name] = f"ORACLE_ERR {e}"; fail += 1
        print(f"{name:24s} ORACLE_ERR {str(e)[:120]}")
        continue
    if sorted(sp_cols) != sorted(o_cols):
        results[name] = f"SCHEMA spark={sorted(sp_cols)} oracle={sorted(o_cols)}"; fail += 1
        print(f"{name:24s} SCHEMA spark={sorted(sp_cols)} oracle={sorted(o_cols)}")
        continue
    if len(sp_rows) != len(o_rows):
        results[name] = f"ROWCOUNT spark={len(sp_rows)} oracle={len(o_rows)}"; fail += 1
        print(f"{name:24s} ROWCOUNT spark={len(sp_rows)} oracle={len(o_rows)}")
        continue
    hs, ho = table_hash(sp_cols, sp_rows), table_hash(o_cols, o_rows)
    if hs == ho:
        ok += 1; print(f"{name:24s} OK rows={len(sp_rows)}")
    else:
        fail += 1; results[name] = "HASH_MISMATCH"
        order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
        a = sorted("|".join(canon(r[i]) for i in order) for r in sp_rows)
        b = sorted("|".join(canon(r[i]) for i in order) for r in o_rows)
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"{name:24s} HASH_MISMATCH rows={len(sp_rows)} cols={sorted(sp_cols)}")
        for x, y in diffs:
            print(f"   spark : {x[:200]}")
            print(f"   oracle: {y[:200]}")
print(f"\n{ok} OK, {fail} FAIL, {len([r for r in results.values() if str(r).startswith('ROWS_ONLY')])} rows-only")
sys.exit(1 if fail else 0)
