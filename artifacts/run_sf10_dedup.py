#!/usr/bin/env python
"""Round-8 fourth-decade correctness spot-check (VERDICT r7 item 8):
the five dedup pair-space rows at sf10 (500k docs, /tmp/dqps_sf10,
artifacts/gen_sf10.py), each against the strongest check that is
actually FEASIBLE at this scale — named per row in the artifact:

  * x04 / x60 / x62(sampled %9700): the REAL DuckDB oracle via the
    in-engine order-insensitive hash compare (tests/oracle.py
    hashed_compare — only two scalars cross the harness boundary).
    These oracles are df-capped / query-sliced, so they stay
    polynomial at 500k docs; DUCKDB_MEMLIMIT guards the box.
  * x02: the quadratic exact-Jaccard DuckDB oracle is infeasible at
    500k docs, so the check is an INDEPENDENT in-engine mechanism:
    the uncapped inverted-index exact-Jaccard pair set
    (operators/dedup.ngram_jaccard_pairs, df_cap=None — feasible
    because sum(df^2) is bounded by dup-cluster sizes + the exempt
    shingle tail) must EQUAL the MinHash-LSH verified pair set, row
    for row including the jaccard value (both sides reduce to the
    same shared/(na+nb-shared) IEEE divide). LSH-vs-inverted-index is
    a genuinely different pair-generation mechanism, so agreement is
    evidence, not tautology.
  * x55: exact copy-isomorphism PASS rows — gen_sf10 guarantees zero
    all-exempt 8-grams, so the sf10 k-gram universe is copy-pure and
    the sf10 result must be EXACTLY 10 id-shifted images of the sf1
    result (which the r7/r8 sweeps verified against DuckDB at sf1).
    Checked per copy with exceptAll in both directions.

APPENDS rows to artifacts/SWEEP_SF10_DEDUP_r08.txt. Run ONE SECTION
PER PROCESS (SF10_SECTIONS=x04 / x60 / x62 / x02 / x55): at 500k docs
the long-lived Spark context's shuffle files plus the DuckDB oracle's
spill overran this box's 80 GB free disk when sections shared a
process.
Usage: SF10_SECTIONS=x62 PYTHONPATH=/root/repo python -u artifacts/run_sf10_dedup.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("DUCKDB_MEMLIMIT", "48GB")
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from database_query_processor_spark.catalog import load_table  # noqa: E402
from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402
from tests.oracle import hashed_compare  # noqa: E402

SF1 = "/tmp/dqps_sf1"
SF10 = "/tmp/dqps_sf10"
SPAN = 50_000  # sf1 doc_id span (asserted by gen_sf10's output print)
COPIES = 10
OUT = os.path.join(os.path.dirname(__file__), "SWEEP_SF10_DEDUP_r08.txt")
# SF10_SECTIONS: comma list of section prefixes (x04,x60,x62,x02,x55)
# to run IN THIS PROCESS; rows append to OUT. At 500k docs a single
# process accumulates Spark shuffle files (the long-lived context's
# ContextCleaner only drops them on driver GC) NEXT TO the DuckDB
# oracle's own spill — running x04+x60 then x62's oracle in one
# process overran this box's 80 GB free disk. One section per process
# keeps peak scratch = that section's own.
SECTIONS = {
    p for p in os.environ.get("SF10_SECTIONS", "x04,x60,x62,x02,x55").split(",") if p
}


def main() -> int:
    spark = get_spark(
        app_name="sf10-dedup", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = {s.name: s for s in all_specs()}
    lines: list[str] = []
    ok = True

    def emit(t0, name, probs, tag):
        nonlocal ok
        line = (
            f"{time.time() - t0:8.2f}s {name} "
            + (tag if not probs else "MISMATCH: " + "; ".join(str(p) for p in probs))
        )
        print(line, flush=True)
        lines.append(line)
        ok &= not probs

    # --- x04 / x60: real DuckDB oracle, hashed compare ---
    for name in ("x04_dedup_ngram_jaccard", "x60_dedup_containment"):
        if name[:3] not in SECTIONS:
            continue
        spec = specs[name]
        spark.catalog.clearCache()
        t0 = time.time()
        probs = hashed_compare(spec.build(spark, SF10), spec.oracle, SF10)
        emit(t0, name, probs, "MATCH-HASHED")

    d10 = load_table(spark, SF10, "documents")

    # --- x62 sampled slice (%9700 -> ~52 queries at 500k docs) ---
    if "x62" in SECTIONS:
        from database_query_processor_spark.operators import retrieval as RT
        from database_query_processor_spark.workload.extensions import _hardneg_oracle

        spark.catalog.clearCache()
        t0 = time.time()
        sampled = _hardneg_oracle().replace("% 97 = 0", "% 9700 = 0")
        assert sampled.count("% 9700 = 0") == 2
        df62 = RT.bm25_hard_negatives(
            d10, "doc_id", "text", F.col("doc_id") % 9700 == 0, k=3
        )
        n62 = df62.count()
        probs = hashed_compare(df62, sampled, SF10) + (
            [] if n62 > 0 else ["vacuous: 0 rows"]
        )
        emit(t0, f"x62_hard_negatives[sampled-9700, {n62} rows]", probs, "MATCH-HASHED")

    # --- x02: LSH output == independent exact inverted-index Jaccard ---
    if "x02" in SECTIONS:
        from database_query_processor_spark.operators.dedup import (
            minhash_dedup_pairs,
            ngram_jaccard_pairs,
        )

        spark.catalog.clearCache()
        t0 = time.time()
        lsh = minhash_dedup_pairs(d10, "doc_id", "text", threshold=0.5)
        exact = ngram_jaccard_pairs(d10, "doc_id", "text", threshold=0.5, df_cap=None)
        n_lsh = lsh.count()
        missing = exact.exceptAll(lsh).count()
        extra = lsh.exceptAll(exact).count()
        probs = []
        if n_lsh == 0:
            probs.append("vacuous: 0 pairs")
        if missing or extra:
            probs.append(
                f"LSH vs exact inverted-index: missing={missing} extra={extra}"
            )
        emit(t0, f"x02_dedup_minhash[vs exact inverted-index, {n_lsh} pairs]", probs,
             "PASS-EXACT-ALT-MECHANISM")

    # --- x55: exact copy-isomorphism vs the sf1 (DuckDB-verified) result ---
    if "x55" in SECTIONS:
        from database_query_processor_spark.operators.dedup import substring_dup_spans

        spark.catalog.clearCache()
        t0 = time.time()
        d1 = load_table(spark, SF1, "documents")
        ref = substring_dup_spans(d1, "doc_id", "text").persist()
        n_ref = ref.count()
        got = (
            substring_dup_spans(d10, "doc_id", "text")
            .withColumn("_copy", (F.col("doc_id") / SPAN).cast("long"))
            .withColumn("doc_id", F.col("doc_id") % SPAN)
            .persist()
        )
        n_got = got.count()
        probs = []
        if n_ref == 0:
            probs.append("vacuous: sf1 reference empty")
        if n_got != COPIES * n_ref:
            probs.append(f"count: {n_got} != {COPIES} * {n_ref}")
        for j in range(COPIES):
            cj = got.filter(F.col("_copy") == j).drop("_copy")
            diff = cj.exceptAll(ref).count() + ref.exceptAll(cj).count()
            if diff:
                probs.append(f"copy {j}: {diff} row diffs vs sf1")
        emit(t0, f"x55_substring_dedup[copy-isomorphism x{COPIES}, {n_got} rows]",
             probs, "PASS-EXACT-INVARIANT")

    with open(OUT, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended", OUT, flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
