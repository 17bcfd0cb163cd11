#!/usr/bin/env python
"""sf1 verification for the ONE x-query whose DuckDB oracle is
infeasible at sf1 (x62: the full hard-negative oracle OOMs at 48 GB
after ~5 min — SF1_ORACLE_PROBE.json), plus the x05 scale-sized
banding demonstration.

x62 sampled-slice: SAME operator, query predicate narrowed from
doc_id % 97 == 0 to doc_id % 970 == 0 (a 1-in-10 deterministic
subsample of the benchmark slice; ~50 queries at sf1) on BOTH the
Spark side and the oracle — corpus statistics shift identically on
both sides, so the compare stays exact. Validity is pinned by running
the same sampled form at sf0.1 first (must MATCH like the full form
does).

x05 scale-sized: embedding_dup_pairs at the sizing its docstring
prescribes for 10x+ corpora (30 planes / 3 bands ≈ log2(n/bucket)),
mirrored exactly in the oracle via the planes override — proves the
production-resolution knob is cross-engine verifiable, alongside the
sweep's default-banding x05 row (oracle feasible at sf1, 344 s).

Writes artifacts/SF1_X_SPECIALS_<round>.txt (SPECIALS_ROUND env,
default r08); SPECIALS_ONLY selects sections. Run:
  PYTHONPATH=/root/repo python -u artifacts/run_sf1_x_specials.py
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
from tests.oracle import compare, duckdb_run  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/dqps_sf1"
OUT = os.path.join(
    os.path.dirname(__file__),
    f"SF1_X_SPECIALS_{os.environ.get('SPECIALS_ROUND', 'r08')}.txt",
)
# SPECIALS_ONLY: comma list of section prefixes (x62,x05,x49) to run —
# a round that changed only one special re-verifies that one without
# paying for the others (their prior-round artifacts stand)
ONLY = {p for p in os.environ.get("SPECIALS_ONLY", "x62,x05,x49").split(",") if p}


def main() -> int:
    from database_query_processor_spark.operators import retrieval as RT
    from database_query_processor_spark.operators import similarity as SIM
    from database_query_processor_spark.workload.extensions import _hardneg_oracle

    spark = get_spark(
        app_name="sf1-x-specials", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    lines = []

    def check(name, df, sql, sf_dir):
        t0 = time.time()
        probs = compare(df, duckdb_run(sql, sf_dir))
        line = (f"{time.time() - t0:7.2f}s {name} "
                + ("MATCH" if not probs else "MISMATCH: " + "; ".join(probs)))
        print(line, flush=True)
        lines.append(line)
        return not probs

    ok = True

    # --- x62 sampled slice (predicate % 970 both sides) ---
    if "x62" in ONLY:
        sampled_oracle = _hardneg_oracle().replace("% 97 = 0", "% 970 = 0")
        assert sampled_oracle.count("% 970 = 0") == 2  # is_q + decontam slice
        for sf_dir, tag in ((SF01, "sf0.1-validity"), (SF1, "sf1")):
            spark.catalog.clearCache()
            d = load_table(spark, sf_dir, "documents")
            df = RT.bm25_hard_negatives(
                d, "doc_id", "text", F.col("doc_id") % 970 == 0, k=3
            )
            ok &= check(
                f"x62_hard_negatives[sampled-970@{tag}]", df, sampled_oracle, sf_dir
            )
    # --- x05 at the docstring's 10x+ sizing (30 planes / 3 bands) ---
    NP, BANDS = 30, 3
    BITS = NP // BANDS
    planes = SIM._hyperplanes(num=NP)
    oracle = f"""
WITH b AS (SELECT vec_id, embedding,
                  sqrt({SIM.sql_dot('embedding', 'embedding')}) AS nrm,
                  {SIM.sql_hyperplane_bucket('embedding', planes)} AS bucket
           FROM embeddings),
bands AS (SELECT vec_id, embedding, nrm, band, (bucket >> ({BITS} * band)) & {(1 << BITS) - 1} AS bval
          FROM b, (SELECT unnest([0, 1, 2]) AS band) t)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       {SIM.sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cos
FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
WHERE {SIM.sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= 0.5
"""
    emb = load_table(spark, SF1, "embeddings")
    if "x05" in ONLY:
        df = SIM.embedding_dup_pairs(
            emb, "vec_id", "embedding", num_planes=NP, bands=BANDS
        )
        ok &= check("x05_dedup_embedding[30planes@sf1]", df, oracle, SF1)

    # --- x49 SemDeDup at the √n cell sizing (production knob) ---
    # cells=8 is the oracle-parity demo sizing; its cell size grows
    # linearly with the corpus, so the within-cell pair join is the
    # slowest sf1 query (~17 min in the sweep — still MATCH). The
    # docstring's production rule is cells ≈ √n: verify THAT sizing
    # cross-engine at sf1 too (ids codebook stays deterministic, the
    # oracle just changes its LIMIT).
    from database_query_processor_spark.workload.extensions import SEMDEDUP_SQL

    cells = 141  # ≈ √20k
    if "x49" in ONLY:
        sem_oracle = SEMDEDUP_SQL.replace(f"LIMIT {SIM.SEM_CELLS}", f"LIMIT {cells}")
        assert f"LIMIT {cells}" in sem_oracle
        df = SIM.semantic_dedup(emb, "vec_id", "embedding", cells=cells)
        ok &= check(f"x49_dedup_semantic[cells{cells}@sf1]", df, sem_oracle, SF1)

    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
