#!/usr/bin/env python3
"""Probe helper: builds the TpcdsVerbatim fixture WITH-prefix straight from
the Scala source and runs an ad-hoc SQL tail in DuckDB over a sf dir.
Usage: python3 tools/tpcds_probe.py <sf_dir> "<sql tail (may use fixture views)>"
"""
import re, sys
import duckdb

def prefix():
    src = open("src/main/scala/graft/operators/TpcdsVerbatim.scala").read()
    body = src[src.find("val fixtures"):src.find("/** TPC-H base tables")]
    entries = re.findall(r'"(\w+)" ->\s+"""(.*?)"""', body, re.S)
    parts = ["tpch_%s AS (SELECT * FROM %s)" % (t, t)
             for t in ["orders", "lineitem", "part", "supplier"]]
    parts += ["%s AS (%s)" % (n, q.replace(" AS STRING", " AS VARCHAR"))
              for n, q in entries]
    return "WITH " + ",\n".join(parts) + "\n"

def main(sf, tail):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        con.execute("CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
                    % (t, sf, t))
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    q = prefix() + tail
    for row in con.execute(q).fetchall()[:30]:
        print(row)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
