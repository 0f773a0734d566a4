#!/usr/bin/env python3
"""Deterministic 10x upscale of the sf0.1 test tables -> target/testdata_sf1.

The driver ships sf{0.001,0.01,0.1}; the dual-scale gate runs (sf0.01 AND
sf0.1) caught real cross-engine divergences, so one more decade is cheap
insurance before any 100x claim. Upscaling instead of regenerating keeps the
oracle contract intact: every oracle derives expected values arithmetically
from the keys, so 10 key-shifted copies exercise the same arithmetic over a
10x id range (and flush out any hidden small-id / contiguity assumption).

Copy i (0..9) shifts each table's surrogate keys by i * <table row count>,
preserving referential integrity (orders.o_custkey shifts with customer,
lineitem's three FKs with their parents). region/nation stay 1x (fixed
dimensions, as in TPC-H). Embedding copies get a per-copy deterministic
perturbation of one coordinate so no two vectors are bit-identical (exact
cosine ties across copies would otherwise make top-k order engine-dependent).
Document copies get a per-copy printable-character rotation: verbatim copies
would be shingle-identical, every cross-copy pair becomes an LSH candidate,
and the candidate set grows quadratically in the copy count (measured: 113x
pairs for a 10x corpus — the DuckDB-side jaccard oracle then joins billions
of shingle rows). Rotation keeps each copy's INTERNAL duplicate structure
(identical texts rotate identically) while making copies disjoint in
shingle space, so candidates grow ~linearly like a real corpus.
"""
import duckdb, os, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/testdata_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")

SHIFTS = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": None},  # user_id shift derived below
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}

for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "1x")

max_user = con.execute(
    f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')").fetchone()[0]
dim = con.execute(
    f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1").fetchone()[0]

for t, shifts in SHIFTS.items():
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]

    def rot_alphabet(shift):
        chars = [chr(c) for c in range(32, 127)]
        to = [chr(((c - 32 + shift) % 95) + 32) for c in range(32, 127)]
        esc = lambda s: s.replace("'", "''")
        return esc("".join(chars)), esc("".join(to))

    sel = []
    # docs too short to shingle (length < 8) have EMPTY shingle sets; if
    # their band keys coincide they form one giant LSH clique across all
    # copies, and the oracle's recursive transitive closure over that
    # clique is O(n^3) in the clique size. Pad them with their (unique)
    # doc_id so every short doc has unique shingles — no degenerate clique,
    # in any copy. n_chars is recomputed to stay consistent with the text.
    pad = "CASE WHEN length(text) < 8 THEN text || '#' || cast(doc_id + i * 5000 AS varchar) ELSE text END"
    for c in cols:
        if t == "documents" and c == "text":
            branches = " ".join(
                f"WHEN {i} THEN translate({pad}, '{f}', '{to}')"
                for i in range(1, COPIES)
                for f, to in [rot_alphabet((i * 7) % 95)])
            sel.append(f"CASE i {branches} ELSE {pad} END AS text")
        elif t == "documents" and c == "n_chars":
            sel.append(f"cast(length({pad}) AS bigint) AS n_chars")
        elif t == "events" and c == "user_id":
            sel.append(f"user_id + i * {max_user} AS user_id")
        elif t == "embeddings" and c == "embedding":
            # perturb coordinate (i % dim) by i/1000 in copy i; copy 0 intact
            k = f"(i % {dim}) + 1"
            sel.append(
                f"CAST(CASE WHEN i = 0 THEN embedding ELSE "
                f"embedding[1:{k}-1] || [embedding[{k}] + i * 0.001] || "
                f"embedding[{k}+1:{dim}] END AS FLOAT[]) AS embedding")
        elif c in shifts and shifts[c] is not None:
            sel.append(f"{c} + i * {shifts[c]} AS {c}")
        else:
            sel.append(c)
    q = (f"COPY (SELECT {', '.join(sel)} "
         f"FROM read_parquet('{SRC}/{t}.parquet') CROSS JOIN copies ORDER BY i) "
         f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(t, f"{COPIES}x rows={n}")
print("done ->", DST)
