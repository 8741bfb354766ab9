#!/usr/bin/env python3
"""Fresh-JVM canonical band measurement (VERDICT r12 item 5).

For each floor-sensitive query, launches N_JVMS separate JVMs, each
running graft.Bench filtered to that ONE query (min-of-3 inside the
JVM), and records the per-JVM min. The band [lo, hi] spans the observed
fresh-JVM mins; tools/benchdiff.py classifies future full-suite movers
against hi*1.3 automatically (the BENCHDIFF_r12 rule), ending the
per-round mover-adjudication churn on these rows.

The query list is the set that has driven three rounds of adjudication
prose (BENCHDIFF_r09/r11/r12 movers with green plan pins and no code
cause): sub-second join/agg scheduling-floor rows plus the two ex-WATCH
pipeline rows whose r12 bands this generalizes.

Usage: python3 tools/bench_bands.py [outJson]
  (expects `sbt -batch "export Runtime/fullClasspath"` to work; run from
   the repo root; ~15 min serial — do not run concurrently with other
   measurements)
"""
import json
import os
import subprocess
import sys

QUERIES = [
    "q_join_inner_bhj", "q_join_inner_shj", "q_join_inner_smj",
    "q_agg_hll_distinct", "q_agg_bitmap_distinct", "q_agg_typed",
    "q_agg_collect", "q_agg_decimal_sum", "q_agg_kll_rollup",
    "q_profile_histogram", "q_docs_pipeline", "q_dedup_simhash",
]
N_JVMS = 3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def classpath():
    out = subprocess.run(
        ["sbt", "-batch", "export Runtime/fullClasspath"],
        capture_output=True, text=True, cwd=REPO, check=True).stdout
    lines = [l for l in out.splitlines() if "/" in l and ":" in l
             and not l.startswith("[")]
    assert lines, "no classpath line in sbt output"
    return lines[-1].strip()


def main(out_json="docs/BENCH_BANDS.json"):
    cp = classpath()
    bands = {}
    for q in QUERIES:
        mins = []
        for i in range(N_JVMS):
            env = dict(os.environ,
                       SPARK_GRAFT_BENCH_ONLY=q,
                       SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
            subprocess.run(
                ["java", "-Xmx8g", "--add-opens=java.base/java.nio=ALL-UNNAMED",
                 "--add-opens=java.base/java.util=ALL-UNNAMED",
                 "--add-opens=java.base/java.lang=ALL-UNNAMED",
                 "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
                 "--add-opens=java.base/jdk.internal.misc=ALL-UNNAMED",
                 "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
                 "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
                 "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
                 "-cp", cp, "graft.Bench"],
                env=env, cwd=REPO, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            t = json.load(open("/tmp/graft_bench.json"))["queries"][q]
            mins.append(round(t, 3))
            print(f"[bands] {q} jvm{i + 1}/{N_JVMS}: {t:.3f}s", flush=True)
        bands[q] = {"mins": mins, "lo": min(mins), "hi": max(mins)}
    doc = {
        "method": (f"one query per JVM, {N_JVMS} JVMs each, min-of-3 "
                   "graft.Bench iterations inside the JVM, sf0.1, idle "
                   "host; band spans the per-JVM mins; benchdiff.py "
                   "allows hi*1.3 before flagging (BENCHDIFF_r12 rule)"),
        "bands": bands,
    }
    with open(os.path.join(REPO, out_json), "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"[bands] wrote {out_json}")


if __name__ == "__main__":
    main(*sys.argv[1:])
