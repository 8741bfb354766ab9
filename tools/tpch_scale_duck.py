#!/usr/bin/env python3
"""DuckDB twin of graft.tools.TpchScaleBench: times the 22 VERBATIM TPC-H
texts over the SAME materialized fixture parquet the Spark run scanned
(byte-identical tables, both engines at full thread count), min-of-3 warm.

Usage: python3 tools/tpch_scale_duck.py <fixtureRoot> <factor> [outJson]
  fixtureRoot — the `root=` path printed by TpchScaleBench
"""
import glob
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "supplier", "part", "partsupp", "customer",
          "orders", "lineitem"]
QDIR = os.path.join(os.path.dirname(__file__),
                    "../src/main/resources/tpch-verbatim")


def main(root, factor, out_json=None):
    con = duckdb.connect()  # threads = all cores, same as local[32]
    for t in TABLES:
        files = glob.glob(f"{root}/{t}/*.parquet")
        assert files, f"no parquet under {root}/{t}"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{root}/{t}/*.parquet')")
    times = {}
    for i in range(1, 23):
        q = f"q{i}"
        sql = open(f"{QDIR}/{q}.sql").read()
        best, rows = None, None
        for _ in range(3):
            t0 = time.time()
            res = con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            rows = len(res)
        times[q] = best
        print(f"[duck-scale x{factor}] {q:<4} rows={rows:<9} {best:.3f}s",
              flush=True)
    total = sum(times.values())
    line = {"metric": f"tpch_duckdb_x{factor}", "value": round(total, 3),
            "unit": "sec", "factor": int(factor),
            "queries": {q: round(t, 3) for q, t in times.items()}}
    print(json.dumps(line))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(line, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
