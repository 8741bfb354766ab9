#!/usr/bin/env python3
"""DuckDB twin of graft.tools.TpcdsScaleBench: times the VERBATIM TPC-DS
texts over the SAME materialized fixture parquet the Spark run scanned
(byte-identical tables, both engines at full thread count), min-of-3 warm.
The per-query SQL (prefix-free oracle bodies) is written by the Spark tool
under <fixtureRoot>/_duck_sql/.

Usage: python3 tools/tpcds_scale_duck.py <fixtureRoot> <factor> [outJson]
  fixtureRoot — the `root=` path printed by TpcdsScaleBench
"""
import glob
import json
import os
import sys
import time

import duckdb


def main(root, factor, out_json=None):
    con = duckdb.connect()  # threads = all cores, same as local[32]
    tables = [d for d in os.listdir(root)
              if os.path.isdir(os.path.join(root, d))
              and not d.startswith("_")]
    assert tables, f"no fixture tables under {root}"
    for t in tables:
        files = glob.glob(f"{root}/{t}/*.parquet")
        assert files, f"no parquet under {root}/{t}"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{root}/{t}/*.parquet')")
    qfiles = sorted(glob.glob(f"{root}/_duck_sql/*.sql"))
    assert qfiles, f"no _duck_sql under {root} — run TpcdsScaleBench first"
    times = {}
    for qf in qfiles:
        q = os.path.basename(qf)[:-4]
        sql = open(qf).read()
        best, rows = None, None
        for _ in range(3):
            t0 = time.time()
            cur = None
            for stmt in [s for s in sql.split(";") if s.strip()]:
                cur = con.execute(stmt)
            res = cur.fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            rows = len(res)
        times[q] = best
        print(f"[duck-scale x{factor}] {q:<5} rows={rows:<9} {best:.3f}s",
              flush=True)
    total = sum(times.values())
    line = {"metric": f"tpcds_duckdb_x{factor}", "value": round(total, 3),
            "unit": "sec", "factor": int(factor),
            "queries": {q: round(t, 3) for q, t in times.items()}}
    print(json.dumps(line))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(line, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
