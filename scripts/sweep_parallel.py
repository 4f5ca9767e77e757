#!/usr/bin/env python3
"""Process-per-row parallel driver for check_oracle.py — the robust
full-sweep shape from round 14: ONE DuckDB process per oracle, so a
list-heavy query cannot fragment/poison the allocator for later rows,
and a crash loses one row, not the sweep. 6-way by default
(SWEEP_WORKERS); graph_hits runs single-threaded inside check_oracle
regardless.

Usage: sweep_parallel.py [SF_DIR] [OUT_DIR]
Prints per-row status lines and a final N/M summary; exit 0 iff all
rows pass.
"""
import json, os, re, subprocess, sys
from concurrent.futures import ThreadPoolExecutor

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
WORKERS = int(os.environ.get("SWEEP_WORKERS", "6"))
HERE = os.path.dirname(os.path.abspath(__file__))

names = sorted(json.load(open(f"{OUT}/oracle_sql.json")))

def run(name):
    env = dict(os.environ, CHECK_ONLY=name)
    env.setdefault("DUCKDB_THREADS", "2")
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_oracle.py"), SF, OUT],
        capture_output=True, text=True, env=env)
    # parse the per-row status line, not the summary count — robust to
    # summary wording and to legitimately rows-only rows
    ok = re.search(rf"^{re.escape(name)}\s+(OK|rows-only)", p.stdout,
                   re.M) is not None
    status = "OK" if ok else "FAIL"
    if not ok:
        detail = [l for l in p.stdout.splitlines() if name in l][:1]
        status += " " + (detail[0] if detail else p.stderr.strip()[-200:])
    print(f"{name:30s} {status}", flush=True)
    return name, ok

with ThreadPoolExecutor(max_workers=WORKERS) as ex:
    results = dict(ex.map(run, names))

n_ok = sum(results.values())
print(f"\n{n_ok}/{len(results)} pass")
sys.exit(0 if n_ok == len(results) else 1)
