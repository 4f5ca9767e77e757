#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json on the same sf tables.
Columns sorted by name, rows sorted, exact value compare."""
import json, sys, glob, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# a FRESH connection per oracle: one list-heavy quadratic query can
# fragment/poison a long-lived connection's allocator so every later
# oracle fails "bad allocation" (seen in the sf0.1 sweep) — view setup
# is microseconds, isolation is worth it. Thread pool bounded: the
# sf0.1 iterative-CTE oracles spawn threads per pipeline and the
# default (= all cores) exhausts the VM.
# Queries whose ordered list(...)+list_reduce folds blow DuckDB's
# MULTI-threaded list allocator at sf0.1 ("bad allocation" with free
# RAM to spare) — single-threaded they complete fine (graph_hits:
# 136 s, hash-matches). Forced to one thread regardless of
# DUCKDB_THREADS.
SINGLE_THREADED = {"graph_hits"}

def fresh_con(threads=None):
    c = duckdb.connect()
    c.execute(f"PRAGMA threads={threads or os.environ.get('DUCKDB_THREADS', '8')}")
    c.execute("PRAGMA memory_limit='24GB'")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c

# CHECK_ONLY=name1,name2 restricts the run (resume after a crash)
ONLY = set(x for x in os.environ.get("CHECK_ONLY", "").split(",") if x)

oracles = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

results = {}
for d in sorted(glob.glob(f"{OUT_DIR}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if ONLY and name not in ONLY:
        continue
    try:
        got = pd.read_parquet(d)
    except Exception as e:
        results[name] = f"READ-FAIL {e}"
        continue
    if name not in oracles:
        results[name] = f"rows-only ({len(got)} rows)" + (" EMPTY!" if len(got) == 0 else "")
        continue
    try:
        con = fresh_con(threads=1 if name in SINGLE_THREADED else None)
        want = con.execute(oracles[name]).df()
        con.close()
    except Exception as e:
        results[name] = f"ORACLE-SQL-FAIL {e}"
        continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        results[name] = f"SCHEMA-MISMATCH got={list(g.columns)} want={list(w.columns)}"
        continue
    if len(g) != len(w):
        results[name] = f"ROWCOUNT got={len(g)} want={len(w)}"
        continue
    dtype_diff = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(w[c].dtype)]
    if dtype_diff:
        results[name] = f"DTYPE-DIFF {dtype_diff}"
        continue
    mismatch = None
    for c in g.columns:
        gv, wv = g[c], w[c]
        try:
            if gv.dtype.kind == 'f' or wv.dtype.kind == 'f':
                import numpy as np
                ga, wa = gv.to_numpy(dtype=float), wv.to_numpy(dtype=float)
                neq = ~((ga == wa) | (pd.isna(ga) & pd.isna(wa)))
            else:
                neq = ~((gv.astype(str) == wv.astype(str)) | (gv.isna() & wv.isna()))
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"
            break
        if neq.any():
            i = int(neq.idxmax()) if hasattr(neq, 'idxmax') else int(neq.argmax())
            mismatch = (f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                        f"got={gv.iloc[i]!r} want={wv.iloc[i]!r}")
            break
    results[name] = "OK" if mismatch is None else f"VALUE-MISMATCH {mismatch}"
    print(f"progress: {name} {results[name][:40]}", file=sys.stderr, flush=True)

for name in sorted(set(list(results) +
    [k for k in oracles if k not in results and (not ONLY or k in ONLY)])):
    if name not in results:
        results[name] = "NO-PARQUET-OUTPUT"
    print(f"{name:28s} {results[name]}")

n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
print(f"\n{n_ok}/{len(results)} pass")
