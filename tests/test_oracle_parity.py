"""Every declared QuerySpec with an oracle must hash-match DuckDB —
this mirrors the driver's t2 gate at small scale so regressions are
caught before the round verify."""

from __future__ import annotations

import pytest

from database_query_processor_spark.workload import all_specs
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duckdb_run

SPECS = all_specs()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_match(spark, spec):
    df = spec.build(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check
        return
    probs = compare(df, duckdb_run(spec.oracle, SF_SMOKE))
    assert not probs, f"{spec.name}: {probs}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    keys = set(e.queries())
    assert set(e.oracle_sql()) <= keys


def test_hashed_compare_agrees_and_detects(spark):
    """The in-engine order-insensitive hash compare (for results too
    large to materialize in pandas — d06/d07 at sf1) must agree with
    the bit-exact pandas compare on matching queries across the type
    surface (ints, strings, doubles under the exact-decimal contract,
    dates), and must DETECT a single-value perturbation at equal row
    count — the failure mode a row-count-only check would miss."""
    from tests.oracle import hashed_compare

    specs = {s.name: s for s in all_specs()}
    for name in ("d06_dialect_join3_star", "c02_tpch_q1", "t01_asof_join"):
        s = specs[name]
        assert hashed_compare(s.build(spark, SF_SMOKE), s.oracle, SF_SMOKE) == []

    s = specs["c02_tpch_q1"]
    # same shape + same row count, one value nudged by 0.01
    bad = (
        "SELECT * REPLACE (CASE WHEN l_returnflag = 'A' "
        "THEN sum_qty + 0.01 ELSE sum_qty END AS sum_qty) "
        f"FROM ({s.oracle}) q"
    )
    probs = hashed_compare(s.build(spark, SF_SMOKE), bad, SF_SMOKE)
    assert probs and any("value hash" in p for p in probs), probs
    assert not any("row count" in p for p in probs), probs
