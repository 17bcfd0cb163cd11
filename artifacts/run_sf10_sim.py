#!/usr/bin/env python
"""Round-9 third-decade correctness spot-check for the SIMILARITY
family: x06 (brute-force cosine top-k, the family's verification
baseline) and x28 (exact batch k-NN join — REWORKED this round to a
scale-bounded demo query batch, stride 20 per 1000 corpus vectors)
at sf10 (200k vectors, /tmp/dqps_sf10/embeddings.parquet from
artifacts/gen_embeddings_sf10.py), each against its REAL DuckDB
oracle via the in-engine order-insensitive hash compare.

At 200k vectors x28's modulus is 4000 -> 50 queries, so the exact
form's check stays linear in the corpus (50 x 200k = 10M cosines in
both engines) — exactly the property the round-9 rework was for; this
row is that property's measurement at a scale the old fixed %20 batch
(10k queries -> 2e9 cosines) could never have run.

APPENDS rows to artifacts/SWEEP_SF10_SIM_r09.txt.
Usage: PYTHONPATH=/root/repo python -u artifacts/run_sf10_sim.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("DUCKDB_MEMLIMIT", "48GB")
sys.path.insert(0, "/root/repo")

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402
from tests.oracle import hashed_compare  # noqa: E402

SF10 = "/tmp/dqps_sf10"
OUT = os.path.join(os.path.dirname(__file__), "SWEEP_SF10_SIM_r09.txt")
ROWS = ["x06_sim_cosine_topk", "x28_sim_knn_join"]


def main() -> int:
    spark = get_spark(
        app_name="sf10-sim", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = {s.name: s for s in all_specs()}
    lines: list[str] = []
    ok = True
    for name in ROWS:
        spec = specs[name]
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            probs = hashed_compare(spec.build(spark, SF10), spec.oracle, SF10)
        except Exception as ex:
            probs = [f"ERROR {type(ex).__name__}: {ex}"]
        line = (
            f"{time.time() - t0:8.2f}s {name} "
            + ("MATCH-HASHED" if not probs else
               "MISMATCH: " + "; ".join(str(p) for p in probs))
        )
        print(line, flush=True)
        lines.append(line)
        ok &= not probs
    with open(OUT, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended", OUT, flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
