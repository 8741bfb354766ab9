#!/usr/bin/env python3
"""PySpark smoke for the graft extension mount (VERDICT r4 #6).

Demonstrates the one capability slice a Scala library cannot exercise from
Scala: a PYTHON user mounting graft via spark.sql.extensions and running

  1. a graft SQL kernel (cosine_sim, a codegen'd Catalyst expression
     injected by GraftExtensions.injectFunction) from plain SQL, and
  2. a pandas_udf (Arrow-batched Python execution -- the capability the
     reference implements as ColumnarArrowEvalPythonExec.scala:51; vanilla
     Spark runs it via ArrowEvalPythonExec, which is what a graft user
     gets, with graft kernels composing in the same query),

both over the committed parquet fixtures.

Run (from /root/repo, after `sbt package`):

    python3 tools/pyspark_smoke.py

Exits 0 with PASS lines, 1 on any mismatch.
"""
import glob
import math
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

jars = glob.glob(os.path.join(REPO, "target", "scala-2.13", "*.jar"))
if not jars:
    sys.exit("no jar under target/scala-2.13 -- run `sbt package` first")

spark = (
    SparkSession.builder.master("local[4]")
    .appName("graft-pyspark-smoke")
    .config("spark.jars", ",".join(jars))
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

failures = []

# 1. graft SQL kernel through the extension mount: cosine_sim(v, v) == 1.0
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
emb.createOrReplaceTempView("embeddings")
rows = spark.sql(
    "SELECT vec_id, cosine_sim(embedding, embedding) AS self_cos "
    "FROM embeddings ORDER BY vec_id LIMIT 8"
).collect()
if not rows:
    failures.append("cosine_sim returned no rows")
for r in rows:
    if abs(r.self_cos - 1.0) > 1e-9:
        failures.append(f"cosine_sim(v, v) != 1.0 for vec {r.vec_id}: {r.self_cos}")
print(f"[smoke] graft kernel via SQL: {len(rows)} rows, self-cosine == 1.0: "
      f"{'PASS' if not any('cosine' in f for f in failures) else 'FAIL'}")

# 2. pandas_udf (Arrow-batched Python) composing with a graft kernel in one
#    query: quality-score tokens counted in Python, kernel hash in SQL.
@pandas_udf("long")
def py_token_count(text):  # vectorized: pandas.Series -> pandas.Series
    return text.str.split(" ").str.len()

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
got = (
    docs.select(
        "doc_id",
        py_token_count(F.col("text")).alias("py_toks"),
        F.expr("size(split(text, ' '))").cast("long").alias("jvm_toks"),
        F.expr("len_poly_hash(split(text, ' '))").alias("kernel_hash"),
    )
    .where(F.col("py_toks") != F.col("jvm_toks"))
    .count()
)
if got != 0:
    failures.append(f"pandas_udf token counts disagree with JVM on {got} docs")
print(f"[smoke] pandas_udf vs JVM token count: "
      f"{'PASS' if got == 0 else f'FAIL ({got} mismatches)'}")

# 3. the Arrow-batch plan is really ArrowEvalPython (not a pickled fallback)
plan = (
    docs.select(py_token_count(F.col("text")).alias("t"))
    ._jdf.queryExecution().executedPlan().toString()
)
if "ArrowEvalPython" not in plan:
    failures.append("pandas_udf did not plan as ArrowEvalPython:\n" + plan)
print(f"[smoke] pandas_udf plans as ArrowEvalPython: "
      f"{'PASS' if 'ArrowEvalPython' in plan else 'FAIL'}")

# 4. custom operator strategy also mounted: topKPerGroup SQL-free path is
#    Scala-only, but the injected freq_sketch UDAF is SQL-visible -- prove a
#    second injected function class (TypedImperativeAggregate) from Python.
top = spark.sql(
    "SELECT explode(freq_sketch(lang, 4)) AS (token, est) "
    "FROM (SELECT lang FROM parquet.`" + SF_DIR + "/documents.parquet`)"
).collect()
if not top:
    failures.append("freq_sketch returned no rows from Python SQL")
print(f"[smoke] injected UDAF (freq_sketch) via SQL: "
      f"{'PASS' if top else 'FAIL'} ({len(top)} heavy hitters)")

# 5. round-5b set-algebra scalars: kmv_state -> kmv_jaccard from Python SQL
jac = spark.sql(
    "WITH sk AS (SELECT source, kmv_state(text) AS st "
    "            FROM parquet.`" + SF_DIR + "/documents.parquet` "
    "            WHERE source IN ('src1', 'src2') GROUP BY source) "
    "SELECT kmv_jaccard(a.st, b.st) AS j, kmv_intersect(a.st, b.st) AS i "
    "FROM sk a JOIN sk b ON a.source < b.source"
).collect()
ok5 = len(jac) == 1 and 0.0 <= jac[0]["j"] <= 1.0 and jac[0]["i"] >= 0
if not ok5:
    failures.append(f"kmv set algebra from Python SQL broken: {jac}")
print(f"[smoke] injected set-algebra scalars (kmv_jaccard/intersect): "
      f"{'PASS' if ok5 else 'FAIL'}")

# 6. grouped-map pandas UDF (applyInPandas) with a JVM-oracle twin: the
#    reference's flagship Python path is columnar grouped execution
#    (ColumnarArrowEvalPythonExec); vanilla Spark plans applyInPandas as
#    FlatMapGroupsInPandas. Integer algebra only (dev = n*count - sum),
#    so pandas and the JVM window agree bit-for-bit.
def per_lang_dev(pdf):
    return pdf.assign(dev=pdf.n_chars * len(pdf) - pdf.n_chars.sum())[
        ["doc_id", "lang", "dev"]]

grouped = (
    docs.select("doc_id", "lang", "n_chars")
    .groupBy("lang")
    .applyInPandas(per_lang_dev, "doc_id long, lang string, dev long")
)
from pyspark.sql import Window
w = Window.partitionBy("lang")
jvm_dev = docs.select(
    "doc_id",
    (F.col("n_chars") * F.count("*").over(w)
     - F.sum("n_chars").over(w)).alias("jvm_dev"))
bad6 = (grouped.join(jvm_dev, "doc_id")
        .where(F.col("dev") != F.col("jvm_dev")).count())
n6 = grouped.count()
plan6 = grouped._jdf.queryExecution().executedPlan().toString()
ok6 = bad6 == 0 and n6 == docs.count() and "FlatMapGroupsInPandas" in plan6
if not ok6:
    failures.append(
        f"applyInPandas grouped map: {bad6} mismatches / {n6} rows, "
        f"FlatMapGroupsInPandas in plan: {'FlatMapGroupsInPandas' in plan6}")
print(f"[smoke] grouped-map applyInPandas vs JVM window oracle: "
      f"{'PASS' if ok6 else 'FAIL'} ({n6} rows, {bad6} mismatches)")

# 7. cogrouped pandas UDF: per-lang cogroup of documents with an
#    events-derived frame, merged in Python; JVM twin is a join of the
#    two per-key counts. Counts only -- exact by construction.
src = docs.select("doc_id", "lang")
aux = docs.select("lang", "n_chars").where(F.col("n_chars") % 2 == 0)

def merge_counts(left, right):
    import pandas as pd
    lang = (left["lang"].iloc[0] if len(left) else right["lang"].iloc[0])
    return pd.DataFrame(
        {"lang": [lang], "n_left": [len(left)], "n_right": [len(right)]})

cg = (src.groupby("lang").cogroup(aux.groupby("lang"))
      .applyInPandas(merge_counts, "lang string, n_left long, n_right long"))
jvm_l = src.groupBy("lang").agg(F.count("*").alias("jl"))
jvm_r = aux.groupBy("lang").agg(F.count("*").alias("jr"))
bad7 = (cg.join(jvm_l, "lang", "full")
        .join(jvm_r, "lang", "full")
        .where((F.col("n_left") != F.coalesce(F.col("jl"), F.lit(0)))
               | (F.col("n_right") != F.coalesce(F.col("jr"), F.lit(0))))
        .count())
plan7 = cg._jdf.queryExecution().executedPlan().toString()
ok7 = bad7 == 0 and "FlatMapCoGroupsInPandas" in plan7
if not ok7:
    failures.append(
        f"cogrouped applyInPandas: {bad7} mismatched langs, "
        f"FlatMapCoGroupsInPandas in plan: "
        f"{'FlatMapCoGroupsInPandas' in plan7}")
print(f"[smoke] cogrouped applyInPandas vs JVM join oracle: "
      f"{'PASS' if ok7 else 'FAIL'} ({bad7} mismatched langs)")

spark.stop()
if failures:
    print("FAILURES:")
    for f in failures:
        print(" -", f)
    sys.exit(1)
print("ALL PASS")
