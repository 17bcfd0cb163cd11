#!/usr/bin/env python
"""Measure dqps.TrimIdempotenceRule on a composed text-cleaning
pipeline (trim(trim(text)) over the sf1 scratch documents (500k docs; sf0.1 is noise-dominated at ~0.2 s) — the shape that
arises when every stage of a cleaning pipeline defensively trims
its already-trimmed input). Two fresh JVMs (the extension must be
on the classpath before JVM start): one with the rule, one without.
Writes artifacts/CATALYST_RULE_BENCH.json.
Usage: PYTHONPATH=/root/repo python artifacts/bench_catalyst_rule.py
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from database_query_processor_spark.session import get_spark

with_rule = sys.argv[1] == "with"
extra = {"spark.ui.showConsoleProgress": "false"}
if with_rule:
    from database_query_processor_spark.plans.catalyst_ext import extension_confs
    extra.update(extension_confs())
spark = get_spark(app_name=f"catalyst-rule-{sys.argv[1]}", extra_conf=extra)
from database_query_processor_spark.catalog import load_table
docs = load_table(spark, "/tmp/dqps_sf1", "documents")

def pipeline():
    # composed cleaning: upstream normalizer (upper) + downstream
    # lowercase tokenity prep; consumer forces full evaluation
    return docs.select(F.trim(F.trim(F.col("text"))).alias("t")).agg(
        F.sum(F.length("t")).alias("n")
    )

plan = pipeline()._jdf.queryExecution().optimizedPlan().toString()
n_trims = plan.lower().count("trim(")
assert n_trims == (1 if with_rule else 2), plan  # rule fired iff enabled
pipeline().collect()  # warm
ts = []
for _ in range(7):
    t0 = time.perf_counter(); pipeline().collect(); ts.append(time.perf_counter() - t0)
print("RESULT", sys.argv[1], min(ts), sorted(ts)[len(ts)//2])
"""

out = {}
for mode in ("without", "with"):
    p = subprocess.run([sys.executable, "-c", CHILD, mode],
                       capture_output=True, text=True, cwd="/root/repo")
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
    if not line:
        print(p.stdout[-2000:], p.stderr[-2000:])
        raise SystemExit(f"child {mode} failed")
    _, m, mn, md = line[0].split()
    out[m] = {"min_s": round(float(mn), 3), "median_s": round(float(md), 3)}

out["speedup_min"] = round(out["without"]["min_s"] / out["with"]["min_s"], 3)
with open("artifacts/CATALYST_RULE_BENCH.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
