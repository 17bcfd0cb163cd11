"""Plan-quality gates: the properties that make queries survive a
100× scale-up, asserted on the actual physical plans.

The reference's optimizer guarantees (predicate placement above scans,
join-algorithm choice — src/qp/optimizer/RandomInitialPlan.java:49-62,
RandomOptimizer.java:45-98) are Catalyst's job here; these tests pin
that we actually GET them — a regression (e.g. a cast blocking
pushdown, a UDF sneaking into a hot path, a join falling off
broadcast) fails loudly instead of becoming a 10× slowdown at scale.
"""

from __future__ import annotations

import pytest

from database_query_processor_spark.workload import all_specs

SF = "/root/testdata/sf0.001"

# Specs whose plans legitimately run Python (Arrow-batched pandas
# paths: multimodal decode). Everything else must stay JVM-side.
PANDAS_OK = {
    "x12_multimodal_decode",
    "x14_multimodal_resize",
    "x15_multimodal_frames",
    "x16_multimodal_features",
}
# Streaming specs execute during build (memory-sink result table);
# their returned plan is the sink read, not the streaming topology.
STREAMING = {"s01_stream_tumbling", "s04_stream_stateful_profiles"}


def _specs():
    return {s.name: s for s in all_specs()}


def _plan(spark, df, mode: str = "formatted") -> str:
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_pushdown_reaches_scan(spark):
    """A range filter must land in the parquet scan's PushedFilters,
    not evaluate post-scan only."""
    df = _specs()["p04_filter_band"].build(spark, SF)
    plan = _plan(spark, df)
    assert "PushedFilters:" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(("GreaterThan" in ln or "LessThan" in ln or "In(" in ln) for ln in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must read a 2-column schema."""
    df = _specs()["p02_project"].build(spark, SF)
    plan = _plan(spark, df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    # no more fields read than the query projects
    assert read[0].count(":") - 1 <= len(df.columns) + 1, read[0]


def test_small_dim_join_broadcasts(spark):
    """customer⋈orders⋈lineitem at test scale: the small side must
    come in as a broadcast, not force a full shuffle of the fact
    table."""
    df = _specs()["p10_join3"].build(spark, SF)
    plan = _plan(spark, df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_whole_stage_codegen_covers_agg(spark):
    """TPC-H Q1's scan→filter→partial-agg pipeline must be inside
    WholeStageCodegen (the '*' spans)."""
    df = _specs()["c02_tpch_q1"].build(spark, SF)
    # "simple" mode shows the unexecuted AQE wrapper; "codegen" mode
    # compiles and reports the actual WholeStageCodegen subtrees.
    plan = _plan(spark, df, "codegen")
    assert "WholeStageCodegen" in plan, plan[:500]


def test_partial_aggregation_before_shuffle(spark):
    """groupBy must map-side combine (HashAggregate below the
    exchange), not ship raw rows."""
    df = _specs()["c02_tpch_q1"].build(spark, SF)
    plan = _plan(spark, df, "simple")
    ex = plan.find("Exchange")
    assert ex != -1
    assert "HashAggregate" in plan[ex:], plan


@pytest.mark.parametrize(
    "name",
    [s.name for s in all_specs() if s.name not in PANDAS_OK | STREAMING],
)
def test_no_python_in_hot_path(spark, name):
    """Declared queries run JVM-side: no row-at-a-time Python UDFs,
    no pandas fallbacks outside the explicitly-pandas operators."""
    df = _specs()[name].build(spark, SF)
    plan = _plan(spark, df, "simple")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"{name}: {marker} found in plan"


def test_multimodal_is_arrow_batched(spark):
    """The multimodal decode path must be the Arrow-batched pandas
    form (mapInPandas), never row-at-a-time Python."""
    df = _specs()["x12_multimodal_decode"].build(spark, SF)
    plan = _plan(spark, df, "simple")
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
