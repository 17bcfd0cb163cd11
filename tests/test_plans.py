"""Plan-quality gates: the properties that make queries survive a
100× scale-up, asserted on the actual physical plans via
plans/inspect.py.

The reference's optimizer guarantees (predicate placement above scans,
join-algorithm choice — src/qp/optimizer/RandomInitialPlan.java:49-62,
RandomOptimizer.java:45-98) are Catalyst's job here; these tests pin
that we actually GET them — a regression (e.g. a cast blocking
pushdown, a UDF sneaking into a hot path, a join falling off
broadcast) fails loudly instead of becoming a 10× slowdown at scale.
"""

from __future__ import annotations

import pytest

from database_query_processor_spark.plans.inspect import (
    audit,
    count_exchanges,
    explain_str,
    join_strategies,
    pushed_filters,
    read_schemas,
    uses_python,
)
from database_query_processor_spark.workload import all_specs

SF = "/root/testdata/sf0.001"

# Specs whose plans legitimately run Python (Arrow-batched pandas
# paths: multimodal decode/resize/frames/features). Everything else
# must stay JVM-side.
PANDAS_OK = {
    "x12_multimodal_decode",
    "x14_multimodal_resize",
    "x15_multimodal_frames",
    "x16_multimodal_features",
    # non-splittable foreign format: whole-file decode is necessarily
    # Python (pure-Python Java-deserialization), Arrow-batched per file
    "src06_javaser_native_read",
    # inverse path: per-partition Java-serialization ENCODE
    # (javaser_writer via mapInPandas) + the decode read-back
    "src18_javaser_write_roundtrip",
    # r12: within-bucket embedding pair verify is a deliberate
    # Arrow-batched numpy kernel (guide §4.3 vectorizable numeric
    # batch) — the JVM fold dot is CodegenFallback and measured 13 s
    # of x05's 16 s at sf0.1 (artifacts/DOT_SHAPE_AB_r12.json);
    # bit-equality with the fold pinned by the oracle + recall tests
    "x05_dedup_embedding",
    "x49_dedup_semantic",
    # r12: PQ encode is the same kernel class — m*ncodes interpreted
    # L2 folds per row (~8 of x66's 9 s) become one vectorized numpy
    # pass; bit-equality argument in ann_pq_rerank's encode comment
    "x66_ann_pq_rerank",
}
# Streaming specs execute during build (memory-sink result table);
# their returned plan is the sink read, not the streaming topology.
STREAMING = {
    "s01_stream_tumbling",
    "s04_stream_stateful_profiles",
    "s05_stream_stream_join",
    "s06_stream_dedup",
}


def _specs():
    return {s.name: s for s in all_specs()}


def test_filter_pushdown_reaches_scan(spark):
    """A range filter must land in the parquet scan's PushedFilters,
    not evaluate post-scan only."""
    df = _specs()["p04_filter_band"].build(spark, SF)
    pushed = pushed_filters(df)
    assert any(("GreaterThan" in p or "LessThan" in p) for p in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must read a 2-column schema."""
    df = _specs()["p02_project"].build(spark, SF)
    schemas = read_schemas(df)
    assert schemas, "no ReadSchema found"
    assert schemas[0].count(":") <= len(df.columns) + 1, schemas[0]


def test_small_dim_join_broadcasts(spark):
    """customer⋈orders⋈lineitem at test scale: the small side must
    come in as a broadcast, not force a full shuffle of the fact
    table."""
    df = _specs()["p10_join3"].build(spark, SF)
    assert "BroadcastHashJoin" in join_strategies(df)


def test_tpch_q5_join_plan(spark):
    """Q5's three dims + fact chain: every join hash-based, at least
    the dim joins broadcast."""
    df = _specs()["c23_tpch_q5"].build(spark, SF)
    strategies = join_strategies(df)
    assert len(strategies) == 5, strategies
    assert strategies.count("BroadcastHashJoin") >= 3, strategies


def test_whole_stage_codegen_covers_agg(spark):
    """TPC-H Q1's scan→filter→partial-agg pipeline must be inside
    WholeStageCodegen (the '*' spans)."""
    df = _specs()["c02_tpch_q1"].build(spark, SF)
    # "simple" mode shows the unexecuted AQE wrapper; "codegen" mode
    # compiles and reports the actual WholeStageCodegen subtrees.
    plan = explain_str(df, "codegen")
    assert "WholeStageCodegen" in plan, plan[:500]


def test_partial_aggregation_before_shuffle(spark):
    """groupBy must map-side combine (HashAggregate below the
    exchange), not ship raw rows."""
    df = _specs()["c02_tpch_q1"].build(spark, SF)
    plan = explain_str(df, "simple")
    ex = plan.find("Exchange")
    assert ex != -1
    assert "HashAggregate" in plan[ex:], plan


def test_single_shuffle_for_group_agg(spark):
    """One groupBy = exactly one shuffle (plus the orderBy range
    exchange) — no accidental re-partitioning."""
    df = _specs()["c02_tpch_q1"].build(spark, SF)
    assert count_exchanges(df) <= 2, explain_str(df, "simple")


@pytest.mark.parametrize(
    "name",
    [s.name for s in all_specs() if s.name not in PANDAS_OK | STREAMING],
)
def test_no_python_in_hot_path(spark, name):
    """Declared queries run JVM-side: no row-at-a-time Python UDFs,
    no pandas fallbacks outside the explicitly-pandas operators."""
    df = _specs()[name].build(spark, SF)
    assert not uses_python(df), f"{name}: Python evaluation found in plan"


def test_multimodal_is_arrow_batched(spark):
    """The multimodal decode path must be the Arrow-batched pandas
    form (mapInPandas), never row-at-a-time Python."""
    df = _specs()["x12_multimodal_decode"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_audit_shape(spark):
    """audit() returns the full summary dict for any plan."""
    df = _specs()["p04_filter_band"].build(spark, SF)
    a = audit(df)
    assert set(a) == {"exchanges", "pushed_filters", "read_schemas",
                      "join_strategies", "uses_python"}
    assert a["uses_python"] is False
    assert a["pushed_filters"]


def test_tpch_q6_pushdown_only_scan(spark):
    """Q6 is the pushdown benchmark: date + discount + quantity
    predicates must all reach the parquet scan, and the read schema
    must carry only the 4 referenced columns."""
    df = _specs()["c29_tpch_q6"].build(spark, SF)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    schemas = read_schemas(df)
    assert schemas and schemas[0].count(":") <= 5, schemas


def test_tpch_exists_becomes_semi_join(spark):
    """Q4's EXISTS must plan as a LeftSemi hash join (decorrelated),
    never a per-row subquery or nested loop."""
    plan = explain_str(_specs()["c28_tpch_q4"].build(spark, SF), "simple")
    assert "LeftSemi" in plan, plan


def test_tpch_not_exists_becomes_anti_join(spark):
    """Q21's NOT EXISTS must plan as a LeftAnti join with the
    non-equi lateness residual attached to the hash join."""
    plan = explain_str(_specs()["c43_tpch_q21"].build(spark, SF), "simple")
    assert "LeftAnti" in plan, plan
    assert "LeftSemi" in plan, plan


@pytest.mark.parametrize(
    "name", [s.name for s in all_specs() if "_tpch_" in s.name],
)
def test_tpch_no_cartesian_products(spark, name):
    """No TPC-H shape may degenerate into a cartesian/nested-loop
    product (the scalar 1-row broadcasts in Q11/Q15/Q22 are
    BroadcastNestedLoopJoin over a single row — allowed; a
    CartesianProduct exchange is not)."""
    plan = explain_str(_specs()[name].build(spark, SF), "simple")
    assert "CartesianProduct" not in plan, f"{name}: {plan[:400]}"


def test_runtime_bloom_filter_injection(spark):
    """Runtime row-level filtering: a selective filter on the build
    side of a shuffle join must inject a bloom filter onto the probe
    (fact) side — at 100 TB this prunes fact rows BEFORE the shuffle.
    Thresholds lowered so the rewrite triggers at test scale; restored
    after."""
    from database_query_processor_spark.catalog import load_table
    from pyspark.sql import functions as F

    conf = spark.conf
    old_bcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sf = "/root/testdata/sf0.01"
        o = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 450000.0)
        li = load_table(spark, sf, "lineitem")
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in opt or "might_contain" in opt, opt[:800]
    finally:
        conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)


def test_sessionize_single_exchange(spark):
    """t03: the lag window, the running-sum window, and the session
    rollup all hash-partition on user_id — Catalyst must plan exactly
    ONE shuffle (SCALE.md's asserted shape), or 100 TB of events move
    twice."""
    df = _specs()["t03_sessionize"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 1, plan
    assert plan.count("Window") == 2, plan


def test_repetition_stats_single_scan_no_join(spark):
    """x32: every repetition signal is a per-row function of the
    document's own token array, so the r11 shape is ONE FileScan with
    the tokenize computed once and ZERO exchanges — the max-bigram
    count is a sorted-array run-length fold (higher-order aggregate),
    not an explode + two doc-keyed shuffles (the pre-r11 shape)."""
    df = _specs()["x32_text_repetition"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan") == 1, plan
    assert plan.count("split(lower(text") == 1, plan
    assert count_exchanges(df) == 0, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan  # no explode: bigrams never become rows
    assert "aggregate(array_sort" in plan, plan  # the run-length fold


def test_pipeline_clean_corpus_light_shuffle(spark):
    """x24 (r11): the dedup exchange carries (fingerprint, doc_id,
    n_chars, n_tokens) — the survivor stats are computed scan-side and
    the full scrubbed document text never crosses the shuffle. One
    exchange, min(struct) aggregation with a map-side partial, no
    window/sort (the pre-r11 row_number() formulation shuffled
    clean_text and sorted on both sides of the exchange)."""
    df = _specs()["x24_pipeline_clean_corpus"].build(spark, SF)
    plan = explain_str(df, "formatted")
    assert count_exchanges(df) == 1, plan
    assert "Window" not in plan and "Sort" not in plan, plan
    assert "partial_min_by" in plan, plan  # map-side partial, HashAggregate
    assert "SortAggregate" not in plan, plan  # min_by keeps the hash form
    # the exchange moves the packed stats struct, not the text
    import re

    m = re.search(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m, plan
    assert "clean_text" not in m.group(1), m.group(1)


def test_rollup_gapfill_plan(spark):
    """t05: hypertable rollup = ONE full-data shuffle (the bucket
    rollup, partial-agg'd map-side); densification is a lag window +
    sequence-explode over bucket-level rows — NO join at all (the
    old spine⋈rollup formulation aggregated the input twice), so at
    100 TB the raw events move exactly once."""
    df = _specs()["t05_rollup_gapfill"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) <= 2, plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") <= 2, plan  # one partial+final pair
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_gapfill_interpolate_plan(spark):
    """t06: same single-pass contract as t05 — one FileScan, one
    full-data shuffle into the bucket rollup, lag window +
    sequence+inline densification, no join, no second aggregation of
    the input."""
    df = _specs()["t06_gapfill_interpolate"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") <= 2, plan
    assert count_exchanges(df) <= 2, plan


def test_boilerplate_ngrams_plan(spark):
    """x33: cross-doc boilerplate = explode as a scan-stage generator
    computed exactly ONCE (fenced tokenize), (doc, gram) pre-agg,
    document-frequency window on the gram partition, per-doc agg —
    three exchanges, no join, no pair space."""
    df = _specs()["x33_boilerplate_ngrams"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) <= 3, plan
    assert plan.count("Generate explode") == 1, plan
    assert "Join" not in plan, plan


def test_ngram_jaccard_is_index_join(spark):
    """x04: the df-capped Jaccard must be pure equi-joins over the
    inverted index — no cartesian, no nested-loop pair join, and no
    array-typed columns crossing an exchange (similarity comes from
    per-pair match counts, not array_intersect)."""
    df = _specs()["x04_dedup_ngram_jaccard"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "array_intersect" not in plan, plan


def test_bm25_topk_plan(spark):
    """x40: the top-k must be TakeOrderedAndProject (per-partition
    heaps, k-row driver merge — never a global sort), and the only
    nested-loop joins are single-row broadcast stat frames (no
    CartesianProduct exchange)."""
    df = _specs()["x40_bm25_search"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_embedding_dedup_is_blocked_equi_join(spark):
    """x05: near-dup pair generation must be BLOCKED on the
    (band, bval) LSH key — never an inequality-only pair join
    (CartesianProduct / BroadcastNestedLoopJoin), which is O(n²) and
    dies at scale. Since r12 the within-bucket verify is an
    Arrow-batched numpy kernel, so the blocking shows up as a
    (band, bval)-keyed FlatMapGroupsInPandas instead of a self-join —
    same Σ|bucket|² pair space, one shuffle on the real key."""
    df = _specs()["x05_dedup_embedding"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "hashpartitioning(band" in plan, plan


def test_lateral_topk_decorrelated(spark):
    """c55: the correlated LATERAL subquery must decorrelate into a
    WindowGroupLimit (partial top-k below the exchange) + one join —
    never a per-outer-row re-execution or a cartesian."""
    df = _specs()["c55_lateral_topk"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_window_topk_group_limit(spark):
    """c11 (the one r7 driver-bench plan suspect — adjudicated as
    scheduling noise, formally pinned here): rn = row_number() <= 3
    must plan as WindowGroupLimit PARTIAL below the exchange and
    FINAL above it, so each map task prunes to <=3 rows per nation
    before anything ships, and the whole query is ONE exchange. If
    this gate holds, the canonical top-k-per-group plan is intact and
    any bench flag on c11 is host noise, not a plan change."""
    df = _specs()["c11_window_topk_per_group"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("WindowGroupLimit") == 2, plan
    assert "Partial" in plan and "Final" in plan, plan
    assert count_exchanges(df) == 1, plan


def test_join4_band_plan_pinned(spark):
    """p11 (flagged by the r8 driver bench alongside p16 — adjudicated
    as host shuffle/sort drift, formally pinned here): the 4-way join
    must stay all-hash (never nested-loop/cartesian), the dim sides
    must broadcast, and the o_totalprice band — written AFTER the
    joins in the builder — must be pushed by Catalyst through three
    joins down into the orders SCAN. If this gate holds, a bench flag
    on p11 is host noise, not a plan change."""
    df = _specs()["p11_join4_band"].build(spark, SF)
    strategies = join_strategies(df)
    assert len(strategies) == 3, strategies
    assert "CartesianProduct" not in strategies, strategies
    assert "BroadcastNestedLoopJoin" not in strategies, strategies
    assert strategies.count("BroadcastHashJoin") >= 2, strategies
    pushed = " ".join(pushed_filters(df))
    assert "o_totalprice" in pushed, pushed
    assert not uses_python(df)


def test_orderby_global_sort_plan(spark):
    """p16 (flagged with p11): a global ORDER BY must be EXACTLY one
    range-partitioning exchange feeding a global Sort over a scan
    pruned to the three projected columns — no extra shuffle, no
    single-partition collapse, nothing in Python. This is the
    memory-bandwidth-bound shape that moves most with host drift, so
    the plan gate is what separates 'slow VM' from 'changed plan'."""
    df = _specs()["p16_orderby"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 1, plan
    assert "rangepartitioning" in plan, plan
    assert ", true, " in plan or "global=true" in plan or "Sort [" in plan, plan
    schemas = read_schemas(df)
    assert schemas and schemas[0].count(",") <= 2, schemas
    assert not uses_python(df)


def test_hard_negatives_pool_group_limit(spark):
    """x62 (the r7 sf1 tail, exponent 0.99): the per-query top-m pool
    cut must plan as WindowGroupLimit so map tasks prune the (query ×
    doc) score matrix to ≤m rows per query BEFORE the window
    exchange, the score aggregation must be a plain hash aggregate
    over integer nano-units (never a sort_array/collect_list ordered
    fold — the r7 shape whose per-group array buffers dominated the
    sf1 tail), and nothing drops to Python."""
    df = _specs()["x62_hard_negatives"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "WindowGroupLimit" in plan, plan[:1200]
    assert "collect_list" not in plan, plan[:1200]
    assert "partial_sum" in plan, plan[:1200]
    assert "pythonUDF" not in plan.lower(), plan[:1200]


def test_ohlc_single_shuffle_partial_agg(spark):
    """t07: OHLC bars must be ONE exchange with a map-side partial
    aggregate below it, and a true HashAggregate — open/close ride
    MIN_BY/MAX_BY over a packed decimal (ts, id) key (decimal buffers
    are hash-aggregable; struct MIN/MAX would force SortAggregate) —
    not a window sort over whole partitions."""
    df = _specs()["t07_ohlc_bars"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 1, plan
    ex = plan.find("Exchange")
    assert "partial_min_by" in plan[ex:], plan
    assert "SortAggregate" not in plan, plan
    assert "Window" not in plan, plan


def test_partitioned_read_prunes(spark):
    """src04: the lang filter must prune at the partition (file)
    level — PartitionFilters non-empty, and the data filter must NOT
    appear as a post-scan row filter on lang."""
    df = _specs()["src04_partitioned_pruned_read"].build(spark, SF)
    plan = explain_str(df, "formatted")
    assert "PartitionFilters: [isnotnull(lang" in plan or "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters:")[1][:120], plan[:2000]


def test_funnel_single_exchange(spark):
    """t10: all three chained conditional-MIN windows partition on
    user_id, and so does the per-user dedup — Catalyst must reuse ONE
    hash exchange for the whole funnel (the final single-row rollup
    adds its own tiny single-partition exchange)."""
    df = _specs()["t10_funnel_conversion"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("hashpartitioning(user_id") <= 1, plan
    assert plan.count("Window") == 3, plan


def test_passage_dedup_window_group_limit(spark):
    """x37: the global first-occurrence filter must plan as a
    WindowGroupLimit (partial + final) so each map task prunes to one
    row per passage hash BEFORE the exchange — without it, every
    duplicate passage ships."""
    df = _specs()["x37_passage_dedup"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("FileScan") <= 2, plan


def test_twa_single_exchange(spark):
    """t09: the lead() window and the per-key aggregate share the
    event_type hash partitioning — one full-data exchange."""
    df = _specs()["t09_time_weighted_avg"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("hashpartitioning(event_type") <= 1, plan


def test_weighted_reservoir_topk_plan(spark):
    """x51: the exact-size reservoir cut must compile to
    TakeOrderedAndProject (per-partition heaps, O(k*P) driver merge)
    — never a global sort exchange — and the key math must stay
    JVM-side (no Python)."""
    df = _specs()["x51_weighted_reservoir"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan or "TakeOrdered" in plan, plan


def test_ewma_single_aggregate_no_window(spark):
    """t14: the recurrence must plan as ONE keyed hash aggregate
    (sort_array(collect_list) + fold in the result projection) — no
    Window operator, no Python, one exchange."""
    df = _specs()["t14_ewma_smooth"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "Window" not in plan, plan
    assert count_exchanges(df) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_zscore_single_window_exchange(spark):
    """t15: COUNT/SUM/SUMSQ must share ONE Window operator on ONE
    key exchange — three separate frames would triple the sort."""
    df = _specs()["t15_anomaly_zscore"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 1, plan
    assert plan.count("Window") == 1, plan


def test_triangle_count_no_cartesian(spark):
    """c64: the wedge join and closure check must stay equi/semi
    joins — any CartesianProduct means the orientation rewrite
    failed."""
    df = _specs()["c64_triangle_count"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "LeftSemi" in plan, plan


def test_substring_dedup_no_join_two_exchanges(spark):
    """x55: suffix-array-style span detection must be window-based —
    no join anywhere (the dup marking is a COUNT window on the gram
    partition, the run chaining rides ONE doc exchange that the final
    (doc, run) aggregate reuses)."""
    df = _specs()["x55_substring_dedup"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert count_exchanges(df) == 2, plan


def test_dsir_select_broadcast_model_topk(spark):
    """x56: the 256-bucket model must broadcast back onto the token
    stream (no big-side shuffle join) and the cut must be
    TakeOrderedAndProject, never a global sort."""
    df = _specs()["x56_dsir_select"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_nb_classifier_broadcast_model(spark):
    """x57: the NB vocabulary join must broadcast (LeftOuter so
    unseen test tokens keep smoothed zero counts) — the test token
    stream never shuffles for the model join."""
    df = _specs()["x57_nb_quality_classifier"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bpe_argmax_is_take_ordered(spark):
    """x58: each round's arg-max must be TakeOrderedAndProject (1-row
    limit), the 1-row winner must broadcast back onto the types frame
    (no shuffle join), and the whole learner stays JVM-side."""
    df = _specs()["x58_bpe_merges"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_nearest_asof_one_window_one_sort(spark):
    """t17: both direction scans must share ONE Window operator and
    ONE sort on the key exchange — a second exchange/sort for the
    forward frame would double the cost of the union-merge."""
    df = _specs()["t17_nearest_asof"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("Window [") == 1, plan
    assert "Join" not in plan, plan


def test_value_bars_no_single_partition_window(spark):
    """t18: the global cumsum must be the two-pass range-partitioned
    form — no Exchange SinglePartition anywhere (the naive global
    ORDER BY window would collapse the stream onto one task)."""
    df = _specs()["t18_value_bars"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "SinglePartition" not in plan, plan
    # The pid-stamped frame is localCheckpoint()ed (retry-determinism:
    # the same materialized range partitioning feeds both the offsets
    # collect and the final join), so the visible plan reads the
    # checkpointed RDD; the range-repartition ran eagerly inside it.
    assert "rangepartitioning" in plan or "Scan ExistingRDD" in plan, plan


def test_sliding_distinct_no_window_operator(spark):
    """c65: sliding COUNT(DISTINCT) must compile to the explode +
    groupBy rewrite — no Window operator (a collect_set frame would
    buffer every user of every frame)."""
    df = _specs()["c65_sliding_distinct"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "Window" not in plan, plan


def test_tpch_q18_plan_pinned(spark):
    """Q18 (large-volume customers) is the one query whose bench time
    rose across rounds — pin today's good shape so a plan regression
    can't hide behind host variance. Since the r5 rewrite the HAVING
    aggregate IS the reporting measure (o_orderkey is unique in
    orders), so the gate is: lineitem is scanned exactly ONCE (no
    semi-join + second scan + re-aggregation), the LIMIT compiles to
    TakeOrderedAndProject (no global sort exchange), and the whole
    query needs exactly one shuffle (the per-order lineitem
    aggregate)."""
    df = _specs()["c40_tpch_q18"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("lineitem.parquet") == 1, plan[:800]
    assert "TakeOrderedAndProject" in plan, plan[:600]
    assert count_exchanges(df) <= 1, plan[:600]
    # the reporting joins stay hash-based; at test scale broadcastable
    strategies = join_strategies(df)
    assert all("HashJoin" in s for s in strategies), strategies


def test_salted_join_plan_shape(spark):
    """p18: the salted join must actually salt — the physical join key
    includes __salt on BOTH sides, the dim side replicates via an
    explode (Generate), and the result is STILL one hash-keyed
    aggregate after the join (no extra exchange beyond join + agg)."""
    df = _specs()["p18_salted_join"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "__salt" in plan, plan[:800]
    assert "Generate explode" in plan, plan[:800]
    # one aggregate shuffle only — salting must not add exchanges
    # (the replicated dim side still broadcasts at test scale)
    assert count_exchanges(df) <= 1, plan


def test_x02_minhash_plan_shape(spark):
    """r7 x02 shape: the tokenize+shingle pipeline materializes ONCE
    (InMemoryRelation feeds the signature branch and both verify
    sides — previously 3 full corpus passes, the sf1 scaling tail),
    LSH band keys are single xxhash64 longs (no per-band string
    concat in the plan), the empty-shingle mega-bucket guard filters
    the null-input seed key (42), in-bucket pairing is capped via
    a bounded-frame collect_list window (r8: never a collect_list
    bucket AGGREGATE array — the 2 GB-single-row mega-bucket risk),
    and nothing drops to Python."""
    df = _specs()["x02_dedup_minhash"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "InMemoryRelation" in plan, plan[:800]
    assert "concat_ws" not in plan.split("InMemoryRelation")[0], plan[:800]
    assert "= 42" in plan, plan[:800]
    # capped pairing = ONE bounded-frame collect_list WINDOW (rows
    # 1..cap following) — no bucket ever materializes as one
    # aggregation-buffer array (grep: collect_list appears only as a
    # window function, never inside an Aggregate)
    assert "windowspecdefinition" in plan and "collect_list" in plan, plan[:800]
    assert "HashAggregate(keys=[band" not in plan, plan[:800]
    assert "ObjectHashAggregate" not in plan, plan[:800]
    assert "pythonUDF" not in plan.lower(), plan[:800]


def test_minhash_signature_fused_fold_matches_reference(spark):
    """r11: the 64 permutation mins come from ONE aggregate() pass
    over the hash array. Pin bit-equality against the definitional
    per-permutation array_min(transform(...)) formulation, including
    the empty-shingle case (all-NULL signature)."""
    from pyspark.sql import functions as F

    from database_query_processor_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely different text with other words entirely here now"),
            (3, "the quick brown fox jumps over the lazy dog again and agaim"),
            (4, ""),  # empty → no shingles → sig of 64 NULLs
            (5, "xy"),  # < n tokens → no shingles
        ],
        ["doc_id", "text"],
    )
    grams = D.doc_shingles(docs, "doc_id", "text")
    fused = D._signature_from_shingles(grams)
    ref_sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("hs"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(D.MERSENNE_P)
                )
            )
            for (a, b) in D.PERMS
        ]
    )
    ref = grams.select(
        "doc_id",
        F.transform(
            "grams", lambda g: F.xxhash64(g).bitwiseAND(F.lit(0xFFFFFFFF))
        ).alias("hs"),
    ).select("doc_id", ref_sig.alias("sig"))
    j = fused.alias("a").join(ref.alias("b"), "doc_id")
    assert j.count() == 5
    mism = j.filter(~F.col("a.sig").eqNullSafe(F.col("b.sig"))).count()
    assert mism == 0
    empty = fused.filter(F.col("doc_id").isin(4, 5)).select(F.col("sig")[0]).collect()
    assert all(r[0] is None for r in empty)


def test_bnlj_build_sides_bounded_x61(spark):
    """x61 has the workload's highest BroadcastNestedLoopJoin count
    (14: per-BPE-iteration 1-row crossJoins). Every BNLJ's build side
    must be PROVABLY bounded from plan shape — a no-key aggregate, a
    limit, a static range, or a product of such — so the nested-loop
    join is a scalar broadcast, never a corpus-sized loop (the r11
    audit counted BNLJ nodes without checking this; the r12 audit
    classifier in artifacts/plan_audit_r12.py is the one
    implementation, reused here as the gate)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts", "plan_audit_r12.py")
    spec = importlib.util.spec_from_file_location("plan_audit_r12", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    df = _specs()["x61_bpe_tokenize"].build(spark, SF)
    builds: list = []
    mod._walk_bnlj(df._jdf.queryExecution().sparkPlan(), builds)
    assert len(builds) >= 1, "expected BNLJ nodes in x61's iterative plan"
    unbounded = [b for b in builds if b["bound"] is None]
    assert not unbounded, f"unbounded BNLJ build sides: {unbounded}"
    assert all(b["bound"] == 1 for b in builds), builds


def test_generate_input_not_duplicated_into_filter(spark):
    """r12: InferFiltersFromGenerate is excluded session-wide. The
    rule copies the generator's input expression into an inferred
    `size(e) > 0 AND isnotnull(e)` filter; every exploded array here
    is a computed higher-order-function pipeline (CodegenFallback, no
    subexpression reuse), so the "filter" costs two more full
    evaluations per row than the explode itself — measured 18x on the
    x04 shingle pipeline (29.8 s -> 1.7 s at sf0.1,
    artifacts/X04_DECOMP_r12.json). Pin both the session conf and the
    plan consequence: nothing sits below the Generate but the
    projected input."""
    from pyspark.sql import functions as F

    from database_query_processor_spark.operators import dedup as D

    assert "InferFiltersFromGenerate" in (
        spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it")], ["doc_id", "text"]
    )
    df = D.doc_shingles(docs, "doc_id", "text").select(
        "doc_id", F.explode("grams").alias("g")
    )
    plan = explain_str(df, "simple")
    assert "Generate" in plan, plan[:800]
    # no inferred Filter re-evaluating the shingle pipeline anywhere
    assert "Filter" not in plan, plan[:800]


def test_x04_ngram_index_hashed_and_persisted(spark):
    """r12 x04/x60 shape: the inverted shingle index materializes
    ONCE as (doc_id, xxhash64 long) — an InMemoryRelation feeds the
    df-cap count, both self-join sides and the per-doc sizes (before:
    four recomputations of the tokenize+shingle corpus pass), and the
    self-join key is a LONG, so no gram string reaches any exchange
    (guide §2.3). The pair metrics are unchanged under hash identity
    (injective on all test corpora, artifacts/COLLISION_CHECK_r12)."""
    df = _specs()["x04_dedup_ngram_jaccard"].build(spark, SF)
    plan = explain_str(df, "simple")
    assert "InMemoryRelation" in plan, plan[:800]
    assert "xxhash64" in plan, plan[:800]
    # the join/aggregate region above the cache carries no tokenize
    # pipeline — the expensive map lives only in the cached build
    above_cache = plan.split("InMemoryRelation")[0]
    assert "split(lower" not in above_cache, above_cache[-800:]


def test_tokenize_evaluated_once_in_shingle_map(spark):
    """r12: word_ngrams' element_at lookups live inside a transform
    lambda; an INLINED tokenize expression is re-evaluated once per
    lookup (CodegenFallback, no cross-lambda subexpression reuse) —
    O(n·grams) tokenizes per document, measured 16x on the n=3
    shingle map (artifacts/NGRAM_SHAPE_AB_r12.json). doc_shingles /
    doc_shingle_hashes / decontaminate materialize tokens in their
    own projection; pin that the optimized plan carries exactly ONE
    tokenize per pipeline (CollapseProject must keep the boundary)."""
    from pyspark.sql import functions as F

    from database_query_processor_spark.operators import dedup as D
    from database_query_processor_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    for df in (
        D.doc_shingles(docs, "doc_id", "text"),
        D.doc_shingle_hashes(docs, "doc_id", "text"),
        C.decontaminate(docs, "doc_id", "text", F.col("doc_id") % 97 == 0)
        .limit(0),
    ):
        plan = explain_str(df, "simple")
        n_tokenize = plan.count("split(lower")
        assert n_tokenize <= 2, f"tokenize inlined {n_tokenize}x:\n{plan[:1500]}"
