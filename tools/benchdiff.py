#!/usr/bin/env python3
"""Bench-regression comparator (VERDICT r8 #8).

Diffs two graft.Bench JSON dumps (per-query min times) and prints every
query that moved by more than BOTH thresholds — >30% relative AND >0.3s
absolute — so a round-over-round regression is decomposed in the commit
message, not at judging time. Also prints totals over the SHARED query
set (new/removed queries are listed but excluded from the total, so a
grown registry doesn't read as a regression).

Usage: python3 tools/benchdiff.py <old.json> <new.json> [rel_pct] [abs_s]
"""
import json
import sys


def main(old_path, new_path, rel_pct=30.0, abs_s=0.3):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    pct = 100.0 * (t_new - t_old) / t_old if t_old else 0.0
    print(f"shared {len(shared)} queries: {t_old:.1f}s -> {t_new:.1f}s "
          f"({pct:+.1f}%)")
    if added:
        t_add = sum(new[q] for q in added)
        print(f"added {len(added)} queries (+{t_add:.1f}s): "
              + ", ".join(added[:12]) + (" ..." if len(added) > 12 else ""))
    if removed:
        print(f"removed {len(removed)}: " + ", ".join(removed[:12]))

    movers = []
    for q in shared:
        d = new[q] - old[q]
        r = 100.0 * d / old[q] if old[q] else 0.0
        if abs(d) > abs_s and abs(r) > rel_pct:
            movers.append((d, r, q))
    movers.sort(reverse=True)
    if movers:
        print(f"\nmovers (>±{rel_pct:.0f}% and >±{abs_s}s):")
        for d, r, q in movers:
            print(f"  {q:<36} {old[q]:6.2f}s -> {new[q]:6.2f}s "
                  f"({d:+.2f}s, {r:+.0f}%)")
    else:
        print(f"\nno movers beyond ±{rel_pct:.0f}% and ±{abs_s}s")
    return 0


if __name__ == "__main__":
    a = sys.argv
    sys.exit(main(a[1], a[2],
                  float(a[3]) if len(a) > 3 else 30.0,
                  float(a[4]) if len(a) > 4 else 0.3))
