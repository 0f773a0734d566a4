#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle (oracle_sql.json) on the same sf dir.
Usage: compare.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        bad.append((name, "NO SPARK OUTPUT")); continue
    try:
        spark_df = pd.read_parquet(pdir)
    except Exception as e:
        bad.append((name, f"read fail: {e}")); continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        bad.append((name, f"ORACLE SQL ERROR: {str(e)[:200]}")); continue

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
                df[c] = df[c].apply(lambda v: tuple(v) if v is not None else None)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        bad.append((name, f"COLS spark={list(a.columns)} duck={list(b.columns)}")); continue
    if len(a) != len(b):
        bad.append((name, f"ROWS spark={len(a)} duck={len(b)}")); continue
    try:
        eq = a.astype(str).equals(b.astype(str))
    except Exception as e:
        bad.append((name, f"cmp fail: {e}")); continue
    if eq:
        ok.append((name, len(a)))
    else:
        diffs = (a.astype(str) != b.astype(str))
        ncell = int(diffs.values.sum())
        firstrow = diffs.any(axis=1).idxmax()
        cols = [c for c in a.columns if diffs[c].any()]
        bad.append((name, f"VALUES {ncell} cells differ, cols={cols}, first row {firstrow}: spark={a.iloc[firstrow].to_dict()} duck={b.iloc[firstrow].to_dict()}"))

for n, r in ok: print(f"PASS {n} ({r} rows)")
for n, m in bad: print(f"FAIL {n}: {m}")
print(f"\n{len(ok)} pass / {len(bad)} fail / rows-only: "
      f"{[d for d in os.listdir(out) if os.path.isdir(os.path.join(out,d)) and d not in oracle]}")
sys.exit(1 if bad else 0)
