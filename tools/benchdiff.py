#!/usr/bin/env python3
"""Bench-regression comparator + one-pass BENCHDIFF artifact writer.

History: VERDICT r8 #8 prescribed decomposing round-over-round movers;
VERDICT r12 "what's wrong" #1 found the committed BENCHDIFF's mover table
and its adjudication prose described DIFFERENT runs (the table was
regenerated, the prose wasn't). The cure, prescribed as r13 item 2: ONE
script pass produces both the table and the adjudication from the same
run, and ArtifactConsistencySpec asserts every upward mover in the table
is named in the adjudication section.

Mover classification (r13 item 5): upward movers are auto-adjudicated
against the committed fresh-JVM bands in docs/BENCH_BANDS.json (the
BENCHDIFF_r12 methodology generalized — one query per JVM, 3 JVMs, band
spans the observed fresh-JVM mins ±30%). A full-suite reading inside or
below its band is warm-depth variance by definition, not a regression;
only above-band movers (or movers with no band) need human prose, and
the artifact marks them NEEDS-ADJUDICATION so the spec fails until the
prose names them.

Usage:
  python3 tools/benchdiff.py <old.json> <new.json> [rel_pct] [abs_s]
  python3 tools/benchdiff.py <old.json> <new.json> --artifact <out.txt> \
      --bands docs/BENCH_BANDS.json --title "BENCHDIFF r13 ..." \
      [--note "free-form context appended under the adjudication"]
"""
import json
import sys


def diff(old, new, rel_pct, abs_s):
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    movers = []
    for q in shared:
        d = new[q] - old[q]
        r = 100.0 * d / old[q] if old[q] else 0.0
        if abs(d) > abs_s and abs(r) > rel_pct:
            movers.append((d, r, q))
    movers.sort(reverse=True)
    return shared, added, removed, movers


def classify(q, t_new, bands):
    """Band = observed fresh-JVM [lo, hi]; a full-suite reading up to
    hi*1.3 is inside measurement variance (the BENCHDIFF_r12 rule: >30%
    above the fresh-JVM band = host/contention event or regression)."""
    if q not in bands:
        return ("NEEDS-ADJUDICATION", "no committed fresh-JVM band")
    lo, hi = bands[q]["lo"], bands[q]["hi"]
    if t_new <= hi * 1.3:
        kind = ("below" if t_new < lo else
                "inside" if t_new <= hi else "within +30% of")
        return ("band-ok",
                f"{kind} the committed fresh-JVM band [{lo:.2f}, {hi:.2f}]s "
                "- warm-depth variance, not a regression")
    return ("NEEDS-ADJUDICATION",
            f"ABOVE the committed fresh-JVM band [{lo:.2f}, {hi:.2f}]s "
            "+30% - host/contention event or a real regression; name the "
            "cause")


def main(argv):
    pos, opts = [], {}
    it = iter(argv)
    for a in it:
        if a.startswith("--"):
            opts[a[2:]] = next(it)
        else:
            pos.append(a)
    old_path, new_path = pos[0], pos[1]
    rel_pct = float(pos[2]) if len(pos) > 2 else 30.0
    abs_s = float(pos[3]) if len(pos) > 3 else 0.3

    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    shared, added, removed, movers = diff(old, new, rel_pct, abs_s)

    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    pct = 100.0 * (t_new - t_old) / t_old if t_old else 0.0

    lines = []
    lines.append(f"shared {len(shared)} queries: {t_old:.1f}s -> "
                 f"{t_new:.1f}s ({pct:+.1f}%)")
    if added:
        t_add = sum(new[q] for q in added)
        lines.append(f"added {len(added)} queries (+{t_add:.1f}s): "
                     + ", ".join(added[:12])
                     + (" ..." if len(added) > 12 else ""))
    if removed:
        lines.append(f"removed {len(removed)}: " + ", ".join(removed[:12]))
    lines.append("")
    if movers:
        lines.append(f"movers (>±{rel_pct:.0f}% and >±{abs_s}s):")
        for d, r, q in movers:
            lines.append(f"  {q:<36} {old[q]:6.2f}s -> {new[q]:6.2f}s "
                         f"({d:+.2f}s, {r:+.0f}%)")
    else:
        lines.append(f"no movers beyond ±{rel_pct:.0f}% and ±{abs_s}s")

    bands = {}
    if "bands" in opts:
        bands = json.load(open(opts["bands"]))["bands"]

    # adjudication block: generated from the SAME movers list, same pass
    up = [(d, r, q) for d, r, q in movers if d > 0]
    adj = ["", "# Mover adjudication (generated with the table above, "
               "same run)", ""]
    if not up:
        adj.append("No upward movers beyond the thresholds.")
    for d, r, q in up:
        verdict, why = classify(q, new[q], bands)
        adj.append(f"- {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({d:+.2f}s). "
                   f"[{verdict}] {why}")
    down = [(d, r, q) for d, r, q in movers if d < 0]
    if down:
        adj.append("")
        adj.append(f"Downward movers ({len(down)}): improvements or "
                   "warm-depth; listed in the table, no adjudication "
                   "needed.")

    out = "\n".join(lines + adj) + "\n"
    print(out)

    if "artifact" in opts:
        title = opts.get("title", "BENCHDIFF")
        note = opts.get("note", "")
        with open(opts["artifact"], "w") as f:
            f.write(f"# {title}\n")
            f.write(f"# old = {old_path}\n# new = {new_path}\n")
            f.write(f"# thresholds: movers = >{rel_pct:.0f}% relative AND "
                    f">{abs_s}s absolute\n")
            if bands:
                f.write("# bands  = docs/BENCH_BANDS.json (fresh-JVM "
                        "canonical, see its method field)\n")
            f.write("\n" + out)
            if note:
                f.write("\n# Notes\n\n" + note + "\n")
        print(f"[benchdiff] wrote {opts['artifact']}")
    # exit nonzero if anything needs human adjudication, so CI-ish use
    # can't silently ship an unadjudicated above-band mover
    needs = [q for d, _, q in up
             if classify(q, new[q], bands)[0] == "NEEDS-ADJUDICATION"]
    if needs:
        print(f"[benchdiff] NEEDS-ADJUDICATION: {', '.join(needs)}")
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
