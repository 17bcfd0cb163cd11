#!/usr/bin/env python
"""Regenerate PLANS.md: actual physical plans for the flagship
queries, plus the machine-checked plan properties (exchange counts,
pushdown, broadcast choice, Python-free hot paths) the test gates in
tests/test_plans.py assert. Run from the repo root:

    python genplans.py [sf_dir]    # default /root/testdata/sf0.01
"""

from __future__ import annotations

import sys

from database_query_processor_spark.plans.inspect import (
    audit,
    count_exchanges,
    explain_str,
    join_strategies,
    uses_python,
)
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.workload import all_specs

# (query id, why this plan matters at 100 TB)
SHOWCASE = [
    ("c02_tpch_q1", "scan-heavy aggregation: filter + projection pushed to "
     "the parquet scan, map-side partial aggregate before the single "
     "shuffle, whole-stage codegen end to end"),
    ("c23_tpch_q5", "6-table join: small dims broadcast, the two large "
     "fact-side joins shuffle on their keys, AQE re-plans at runtime"),
    ("c29_tpch_q6", "pushdown-only query: every predicate reaches "
     "PushedFilters; the scan reads 4 of 16 lineitem columns"),
    ("p11_join4_band", "multi-way equi-join with a range band: dims "
     "broadcast, band filter evaluated pre-join at the scan"),
    ("c40_tpch_q18", "Q18 single-pass rewrite: the HAVING aggregate IS "
     "the reporting measure (o_orderkey unique in orders), so lineitem "
     "is scanned and aggregated ONCE — one shuffle total"),
    ("t01_asof_join", "as-of join as union-merge: ONE key exchange; the "
     "right side's (key,ts)->max dedup folded into the window sort "
     "order (right_tiebreak), no pre-aggregation shuffle"),
    ("p18_salted_join", "skew-salted equi-join: deterministic salt "
     "spread + 8x dim replication — a pathological hot key fans out "
     "across 8 reducers instead of pinning one"),
    ("x64_rerank_cross_encoder", "retrieve-then-rerank: interaction "
     "scoring broadcast-bounded by the constant candidate pool; corpus "
     "cost stays the first-stage rankers'"),
    ("t03_sessionize", "windowed sessionization: both window functions "
     "and the rollup share ONE user_id exchange"),
    ("t04_compact_changelog", "changelog compaction: one shuffle, "
     "streaming row_number within sorted partitions"),
    ("t05_rollup_gapfill", "hypertable rollup + gap-fill: raw events "
     "scanned and shuffled ONCE (bucket rollup); densification is a "
     "lag window + sequence+inline over bucket-level rows — no spine "
     "join, no second aggregation of the input"),
    ("x33_boilerplate_ngrams", "cross-doc boilerplate: explode rides the "
     "scan stage, gram frequencies partial-agg map-side, broadcast "
     "join-back — no quadratic doc-pair space"),
    ("x32_text_repetition", "single-scan text stats: tokenize computed "
     "once, per-doc stats carried through the agg chain (no join-back)"),
    ("x02_dedup_minhash", "MinHash-LSH dedup: shingle once, "
     "bucket-then-pair candidate generation (no quadratic self-join)"),
    ("x24_pipeline_clean_corpus", "fused cleaning pipeline: four quality "
     "gates share one tokenize behind an optimizer fence, single shuffle"),
    ("x04_dedup_ngram_jaccard", "df-capped inverted-index join: "
     "stop-shingles above the document-frequency cap never generate "
     "candidates, bounding bucket size under corpus skew; exact-Jaccard "
     "verify touches candidate pairs only"),
    ("x05_dedup_embedding", "embedding near-dup via banded hyperplane "
     "LSH: candidates equi-join on (band, band_bits) — no all-pairs "
     "inequality join anywhere in the plan"),
    ("x37_passage_dedup", "passage-level dedup: windowed passage split "
     "rides the scan, fingerprint groupBy is the only full shuffle"),
    ("c64_triangle_count", "degree-ordered triangle counting: the wedge "
     "self-join and closure check stay equi/semi joins (no cartesian), "
     "out-degree capped at O(sqrt m) by the orientation"),
    ("x52_fuzzy_decontaminate", "cross-corpus exact Jaccard: the "
     "benchmark's exploded gram index broadcasts, the training side "
     "joins without shuffling; pair aggregation is output-sensitive"),
    ("t14_ewma_smooth", "sequential recurrence as ONE hash aggregate: "
     "sort_array(collect_list) + JVM fold, no Window, no Python"),
    ("x55_substring_dedup", "suffix-array-style repeated-substring spans: "
     "duplicated-gram COUNT window + run chaining — two exchanges, no "
     "join, no pair space, linear in corpus tokens"),
    ("x58_bpe_merges", "BPE merge learning as ONE lazy DAG: per-round "
     "TakeOrdered arg-max broadcast back onto word TYPES, greedy merge "
     "as an ordered JVM fold — no driver loop state, no Python"),
    ("t17_nearest_asof", "nearest as-of join: backward and forward "
     "candidate scans share ONE Window operator on ONE key exchange; "
     "the within-tolerance pick is a scan-side CASE"),
    ("t18_value_bars", "global ordered prefix sum, distributed: range "
     "repartition + broadcast exclusive offsets + within-partition "
     "window — no Exchange SinglePartition anywhere"),
    ("x62_hard_negatives", "batch BM25 hard negatives: corpus term "
     "shuffle prefiltered to the query vocabulary (semi-join), "
     "stats broadcast, near-dup screen is a broadcast anti-join"),
    ("x40_bm25_search", "BM25 top-k (bench headline since r6): the "
     "(doc,term) shuffle is prefiltered to the query terms at the "
     "scan, df/corpus stats ride a broadcast, TakeOrderedAndProject "
     "caps the result driver-side"),
    # round-9 plan changes/pins the r9 verdict asked to showcase (item 6):
    ("x28_sim_knn_join", "exact batch k-NN join (verification baseline): "
     "the scale-bounded query batch (stride 20 per 1000 corpus vectors) "
     "broadcasts, dots are JVM higher-order functions, per-query top-k "
     "is a WindowGroupLimit — corpus scanned once, no pair materialization"),
    ("x29_sim_knn_join_lsh", "both-sides-large k-NN (the 100 TB path): "
     "hyperplane-LSH buckets equi-join queries to candidates, so the "
     "pair space is bucket-bounded instead of |Q|x|C|"),
    ("src09_compaction", "small-file compaction WRITE plan (bench-gated "
     "since r9; the spec returns the post-write verification read, so "
     "the rewrite frame is shown here): one range exchange to the "
     "target file count + within-partition sort — disjoint file ranges "
     "double as coarse clustering, no aggregation anywhere"),
    ("src11_merge_upsert", "MERGE upsert WRITE plan (bench-gated since "
     "r9; rewrite frame shown, the spec returns the re-read): one "
     "full-outer key join classifies matched/target-only/source-only "
     "rows; update/delete/insert are scan-side CASEs over that single "
     "join — the base table is touched once"),
]

# Specs whose RETURNED frame is a post-write verification read (the
# interesting plan executes eagerly inside the builder): showcase the
# pre-write rewrite frame instead.


def _compaction_write_frame(spark, sf_dir):
    from database_query_processor_spark.workload.sources_ops import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    # the exact rewrite sources/layout.py:compact performs (target_files=4)
    return e.repartitionByRange(4, "ts").sortWithinPartitions("ts")


def _merge_write_frame(spark, sf_dir):
    from pyspark.sql import functions as F

    from database_query_processor_spark.operators.relational import merge_into
    from database_query_processor_spark.workload.sources_ops import (
        load_table,
        orders_changelog,
    )

    target = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return merge_into(
        target,
        orders_changelog(target),
        key="o_orderkey",
        matched_update={
            "o_orderstatus": F.col("s.o_orderstatus"),
            "o_totalprice": F.col("s.o_totalprice"),
        },
        matched_delete=F.col("s.is_delete"),
    )


WRITE_FRAMES = {
    "src09_compaction": _compaction_write_frame,
    "src11_merge_upsert": _merge_write_frame,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="dqps-genplans")
    specs = {s.name: s for s in all_specs()}

    out = [
        "# PLANS — physical plans of the flagship queries",
        "",
        f"Generated by `python genplans.py {sf_dir}` (Spark "
        f"{spark.version}, AQE on). Every property quoted below is also "
        "asserted by a gate in `tests/test_plans.py`, so regressions "
        "fail the suite rather than becoming scale cliffs.",
        "",
    ]
    for name, why in SHOWCASE:
        build = WRITE_FRAMES.get(name) or specs[name].build
        df = build(spark, sf_dir)
        a = audit(df)  # one audit supplies every property (each extra
        # helper call re-runs a JVM explain; ~4 redundant per query)
        out += [
            f"## {name}",
            "",
            f"**Why this plan:** {why}",
            "",
            f"- shuffle exchanges: {a['exchanges']}",
            f"- join strategies: {a['join_strategies'] or 'none'}",
            f"- pushed filters: {a['pushed_filters'] or 'none'}",
            f"- python in plan: {a['uses_python']}",
            "",
            "```",
            explain_str(df, "simple").strip(),
            "```",
            "",
        ]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written: {len(SHOWCASE)} plans at {sf_dir}")


if __name__ == "__main__":
    main()
