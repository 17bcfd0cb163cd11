#!/usr/bin/env python
"""Round-8 100x scale probe (refresh of the r4 artifact on round-8 code) (SCALE.md): third scaling point for the
pair-space-risk family — sf0.1 (≈5k docs) → 10x (50k) → 100x (500k
docs / 100k vectors, artifacts/gen_probe100x.py). Cluster-size-held
scaling (see the generator): the TRUE near-dup output grows linearly,
so a guard that works shows ≈linear wall-clock growth per decade.

Embedding family runs at the SIZING-rule resolution for its corpus
(bits/band ≈ log2(n/target_bucket): 100k vecs → 27 planes / 3 bands;
SemDeDup cells ≈ sqrt(n) = 316) — the knobs the 10x probe added.

min of 2 after 1 warm for the fast ops; the two heaviest (x04/x60,
whose candidate index is output-bound) use a single timed run,
labeled as such. Writes artifacts/PROBE100X_r08.json. Run:
  PYTHONPATH=/root/repo python -u artifacts/run_probe100x.py
"""

from __future__ import annotations

import json
import os
import time

from database_query_processor_spark.session import get_spark
from database_query_processor_spark.workload import all_specs

FAST_OPS = ["x02_dedup_minhash", "x55_substring_dedup"]
HEAVY_OPS = ["x04_dedup_ngram_jaccard", "x60_dedup_containment"]
# x62's FULL %97 form is measured only through 10x (PROBE10X_r08): at
# 100x it is 5155 queries x 500k docs over a 36-word vocabulary — a
# ~26B-row dense term fan-out, quadratic BY SPEC when query count and
# corpus BOTH scale (the r7 verdict's "pair space x100" note). The
# 100x row instead holds the query load FIXED (the 52 queries with
# doc_id < 5000, present at every scale) so the decade measures
# corpus growth alone — the scaling question a production miner
# actually faces (benchmark suites don't grow with the crawl).
SF01 = "/root/testdata/sf0.1"
P10 = os.path.join(os.path.dirname(__file__), "probe10x")
P100 = os.path.join(os.path.dirname(__file__), "probe100x")
OUT = os.path.join(os.path.dirname(__file__), "PROBE100X_r08.json")


def timed(spark, build, runs=2, warm=True):
    if warm:
        build().write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        # drain pause: that gc triggers ContextCleaner's ASYNC
        # shuffle-file deletes — let them land outside the timed
        # window (see artifacts/BENCH_BARRIER_AB_r08.json).
        # NOTE: the committed PROBE100X_r08.json PREDATES this pause
        # (measured on the stable second host without it); re-running
        # this script reproduces the numbers' intent, not the exact
        # r08 methodology.
        time.sleep(0.25)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def main() -> None:
    spark = get_spark(app_name="probe100x", driver_memory="64g")
    out: dict[str, dict] = {}
    prior = json.load(
        open(os.path.join(os.path.dirname(__file__), "PROBE10X_r08.json"))
    )

    specs = {s.name: s for s in all_specs() if s.name in FAST_OPS + HEAVY_OPS}
    for name in FAST_OPS:
        row = {
            "sf0.1": prior[name]["sf0.1"],
            "10x": prior[name]["10x"],
            "100x": timed(spark, lambda: specs[name].build(spark, P100)),
        }
        row["ratio_10x_100x"] = round(row["100x"] / row["10x"], 1)
        out[name] = row
        print(name, row, flush=True)
    for name in HEAVY_OPS:
        row = {
            "sf0.1": prior[name]["sf0.1"],
            "10x": prior[name]["10x"],
            "100x_single_run": timed(
                spark, lambda: specs[name].build(spark, P100), runs=1, warm=False
            ),
        }
        row["ratio_10x_100x"] = round(row["100x_single_run"] / row["10x"], 1)
        out[name] = row
        print(name, row, flush=True)

    # x62 fixed-query corpus decade (see X62_FIXED_PRED_SQL note above)
    from pyspark.sql import functions as F

    from database_query_processor_spark.operators import retrieval as RT

    pred = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 5000)

    def x62_fixed(path):
        docs = spark.read.parquet(f"{path}/documents.parquet")
        return RT.bm25_hard_negatives(docs, "doc_id", "text", pred, k=3)

    x62 = {
        "note": "52 fixed queries (doc_id%97==0 AND doc_id<5000) at every "
        "scale — corpus-growth decade at constant query load; the full "
        "%97 form (queries AND corpus both x10) is the 10x row in "
        "PROBE10X_r08.json and is quadratic by spec at 100x (~26B-row "
        "dense term fan-out on this 36-word-vocabulary corpus): not run.",
        "10x_fixed52": timed(spark, lambda: x62_fixed(P10)),
        "100x_fixed52_single_run": timed(
            spark, lambda: x62_fixed(P100), runs=1, warm=False
        ),
    }
    x62["ratio_10x_100x"] = round(
        x62["100x_fixed52_single_run"] / x62["10x_fixed52"], 1
    )
    out["x62_hard_negatives"] = x62
    print("x62_hard_negatives", x62, flush=True)

    from database_query_processor_spark.operators.similarity import (
        embedding_dup_pairs,
        semantic_dedup,
    )

    emb100 = spark.read.parquet(f"{P100}/embeddings.parquet")
    x05 = {
        "20k_scaled(24p/3b)": prior["x05_embedding_dup"]["20k_scaled(24p/3b)"],
        "100k_scaled(27p/3b)": timed(
            spark,
            lambda: embedding_dup_pairs(
                emb100, "vec_id", "embedding", threshold=0.9,
                num_planes=27, bands=3,
            ),
        ),
    }
    x05["ratio_20k_100k"] = round(
        x05["100k_scaled(27p/3b)"] / x05["20k_scaled(24p/3b)"], 1
    )
    out["x05_embedding_dup"] = x05
    print("x05_embedding_dup", x05, flush=True)

    # NOTE: requires the vectorized _assign_cells path (similarity.py)
    # — the literal-argmax assignment at cells=316 stalls planning/
    # codegen indefinitely (the cliff this probe found; recorded in
    # SCALE.md and PROBE100X_r07.json's note field)
    x49 = {
        "20k_cells141": prior["x49_semantic_dedup"]["20k_cells141"],
        "100k_cells316_vectorized_assign": timed(
            spark,
            lambda: semantic_dedup(
                emb100, "vec_id", "embedding", cells=316, codebook="kmeans"
            ),
            runs=1,
        ),
    }
    x49["ratio_20k_100k"] = round(
        x49["100k_cells316_vectorized_assign"] / x49["20k_cells141"], 1
    )
    out["x49_semantic_dedup"] = x49
    print("x49_semantic_dedup", x49, flush=True)

    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
