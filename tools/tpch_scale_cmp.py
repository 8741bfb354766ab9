#!/usr/bin/env python3
"""Merges TpchScaleBench (Spark) and tpch_scale_duck.py (DuckDB) runs at
multiple replication factors into the committed scale-convergence
artifact — the measurement VERDICT r12 prescribed for the TPC-H verbatim
section's fixture-scale 2x gate breach.

Usage:
  python3 tools/tpch_scale_cmp.py <out.txt> <factor:spark.json:duck.json>...
"""
import json
import sys


def main(out, *runs):
    parsed = []
    for spec in runs:
        factor, spark_path, duck_path = spec.split(":")
        s = json.load(open(spark_path))
        d = json.load(open(duck_path))
        parsed.append((int(factor), s["queries"], d["queries"]))
    parsed.sort()

    lines = []
    qs = [f"q{i}" for i in range(1, 23)]
    hdr = f"{'query':<6}" + "".join(
        f"{'x' + str(f) + ' graft':>12}{'x' + str(f) + ' duck':>12}"
        f"{'ratio':>7}" for f, _, _ in parsed)
    lines.append(hdr)
    for q in qs:
        row = f"{q:<6}"
        for _, sq, dq in parsed:
            r = sq[q] / dq[q] if dq[q] else float("inf")
            row += f"{sq[q]:>11.3f}s{dq[q]:>11.3f}s{r:>6.2f}x"
        lines.append(row)
    lines.append("-" * len(hdr))
    row = f"{'TOTAL':<6}"
    ratios = []
    for _, sq, dq in parsed:
        ts, td = sum(sq.values()), sum(dq.values())
        ratios.append(ts / td)
        row += f"{ts:>11.2f}s{td:>11.2f}s{ts / td:>6.2f}x"
    lines.append(row)
    lines.append("")
    lines.append("section ratio by factor: " + "  ".join(
        f"x{f}={r:.2f}x" for (f, _, _), r in zip(parsed, ratios)))
    over = [(q, parsed[-1][1][q] / parsed[-1][2][q]) for q in qs
            if parsed[-1][1][q] / parsed[-1][2][q] > 2.0]
    f_last = parsed[-1][0]
    if over:
        lines.append(f"rows >2.0x at x{f_last}: " + ", ".join(
            f"{q} ({r:.2f}x)" for q, r in sorted(over, key=lambda t: -t[1])))
    else:
        lines.append(f"rows >2.0x at x{f_last}: none")
    text = "\n".join(lines) + "\n"
    print(text)
    with open(out, "w") as f:
        f.write(text)
    print(f"[tpch-scale-cmp] wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
