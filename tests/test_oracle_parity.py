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
