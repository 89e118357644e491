#!/usr/bin/env python3
"""Oracle memory-stress sweep (r9 verdict item #2, generalizing the r8
addendum-118 sweep to the FULL board every time).

Replays every oracle in <outDir>/oracle_sql.json against DuckDB under a
hard memory_limit (default 500MB) — the simulation of the driver's
long-lived comparator process whose cumulative footprint OOM'd
sim_cosine_topk in r9 (and four other oracles in r7/r8). Any oracle that
cannot complete inside the limit on a COLD connection is a restructure
candidate (MATERIALIZED CTE hints, hoisted selective filters).

Two modes:
  --shared  one connection for the whole sweep (the driver's shape:
            accumulation bugs surface here)
  default   fresh connection per oracle (isolates per-oracle footprint)

Usage: python3 tools/stress_oracles.py <sfDir> <outDir> [--limit 500MB]
           [--shared] [query ...]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir: str, limit: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{limit}'")
    # match the constrained comparator: no unbounded temp spill masking
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    limit = "500MB"
    for f in flags:
        if f.startswith("--limit"):
            limit = f.split("=", 1)[1] if "=" in f else "500MB"
    shared = "--shared" in flags

    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)

    names = sorted(n for n in oracles if not only or n in only)
    con = connect(sf_dir, limit) if shared else None
    failures, slow = [], []
    for i, name in enumerate(names):
        c = con if shared else connect(sf_dir, limit)
        t0 = time.time()
        try:
            c.execute(oracles[name]).fetchall()
            dt = time.time() - t0
            if dt > 4.0:
                slow.append((name, dt))
        except Exception as e:
            failures.append((name, str(e).split("\n")[0]))
            if shared:
                # a poisoned shared connection would cascade; restart it
                con.close()
                con = connect(sf_dir, limit)
        finally:
            if not shared:
                c.close()
        if (i + 1) % 100 == 0:
            print(f"  ... {i + 1}/{len(names)}", flush=True)

    print(f"\nswept {len(names)} oracles under memory_limit={limit} "
          f"({'shared connection' if shared else 'fresh connection each'})")
    for name, err in failures:
        print(f"FAIL {name}: {err}")
    for name, dt in sorted(slow, key=lambda x: -x[1]):
        print(f"slow {name}: {dt:.1f}s")
    if not failures:
        print("all oracles complete under the limit")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
