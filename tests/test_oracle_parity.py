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


def test_hashed_compare_big_magnitude_floats(spark):
    """The sf10-exposed canon boundary (artifacts/
    SWEEP_SF10_RELATIONAL_r09.txt): for |x| >= 1e9 the 6-dp float
    canon exceeds ~15 significant digits, where Spark's shortest-repr
    and DuckDB's binary-expansion double->decimal conversions
    legitimately diverge on BIT-IDENTICAL doubles. The magnitude-
    branched canon must (a) MATCH identical big values across the
    1e9/1e15 branch boundaries, (b) still DETECT a relative-1e-6
    perturbation, and (c) never collide a rescaled big value with a
    small value's plain string (branch tags)."""
    from tests.oracle import hashed_compare

    vals = [
        278641550109.415904,   # the actual c02-at-sf10 digit-16 case
        2.8e15 + 0.123,        # 'T' branch
        999999999.999999,      # just under the 'M' cut
        1e9,                   # exactly at the cut
        -278641550109.415904,  # sign symmetry
        0.280483866595734,     # small: must keep the historical canon
    ]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, x double")
    lits = ", ".join(f"({i}, CAST({v!r} AS DOUBLE))" for i, v in rows)
    sql = f"SELECT * FROM (VALUES {lits}) t(id, x)"
    assert hashed_compare(df, sql, SF_SMOKE) == []

    # (b) a 1-in-1e6 relative nudge on the big value must be caught
    # (repr() shortens the literal to …4159, so replace that form)
    assert "278641550109.4159" in sql
    bad = sql.replace("278641550109.4159", "278641828751.0", 1)
    probs = hashed_compare(df, bad, SF_SMOKE)
    assert probs and any("value hash" in p for p in probs), probs

    # (c) a big value rescaled into the small range must NOT hash-equal
    # the small row that spells the same digits (tag disambiguation)
    df2 = spark.createDataFrame([(0, 280483866595.734)], "id int, x double")
    sql2 = "SELECT 0 AS id, CAST(0.280483866595734 AS DOUBLE) AS x"
    probs = hashed_compare(df2, sql2, SF_SMOKE)
    assert probs and any("value hash" in p for p in probs), probs


def test_hashed_compare_half_point_floats(spark):
    """The sf10-exposed 6-dp HALF-POINT seam (x57's doc 91317,
    artifacts/SWEEP_SF10_TEXT_r09.txt): for a double whose shortest
    decimal repr sits exactly on a 6-dp half, Spark's F.round (HALF_UP
    on the shortest-repr decimal) and DuckDB's ROUND (on the binary
    expansion, which lies a hair off the half) split to adjacent
    canon strings on BIT-IDENTICAL doubles. _duck_canon therefore
    VARCHAR-bridges the 6-dp step (shortest repr -> DECIMAL, which
    DuckDB rounds half-away-from-zero = HALF_UP). Identical halves
    must MATCH, including negative zero and exponent-notation smalls;
    a real perturbation must still be DETECTED."""
    from tests.oracle import hashed_compare

    vals = [
        -1.0149445,   # the actual x57-at-sf10 case (binary below the half)
        1.0000005,    # positive half, binary below
        -1.0000005,   # sign symmetry
        2.5e-7,       # rounds to a half AT the 6-dp edge from below
        -1e-7,        # negative zero after rounding
        1.5e-8,       # exponent-notation small -> 0.000000
    ]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, x double")
    lits = ", ".join(f"({i}, CAST({v!r} AS DOUBLE))" for i, v in rows)
    sql = f"SELECT * FROM (VALUES {lits}) t(id, x)"
    assert hashed_compare(df, sql, SF_SMOKE) == []

    bad = sql.replace("-1.0149445", "-1.0149545", 1)
    probs = hashed_compare(df, bad, SF_SMOKE)
    assert probs and any("value hash" in p for p in probs), probs


def test_bigram_oracle_sampled_slice_parity(spark):
    """x50's big-scale SAMPLED-SLICE oracle (sql_bigram_logprob with
    sample_mod > 0, the r10 fix for the sf10 80 GB / OOM-crashing full
    form): corpus stats stay full-corpus, the per-position relation is
    restricted to doc_id % mod = 0. Two claims pinned at sf0.01:

    1. DuckDB-vs-DuckDB: the sliced form equals the FULL form filtered
       to the same docs (same rows, same nll bits) — the slice changes
       memory shape only, never values.
    2. Engine-vs-oracle: the engine's output filtered to the slice
       hash-matches the sliced oracle — the exact compare the sf10
       re-run (run_sf10_text.py) performs."""
    from database_query_processor_spark.operators.retrieval import (
        sql_bigram_logprob,
    )
    from database_query_processor_spark.workload.extensions import (
        TOKS_SQL,
        bigram_lm_quality,
    )
    from tests.oracle import duck_connect, hashed_compare

    sf_dir = "/root/testdata/sf0.01"
    mod = 5
    full = sql_bigram_logprob(toks_sql=TOKS_SQL)
    sliced = sql_bigram_logprob(toks_sql=TOKS_SQL, sample_mod=mod)

    con = duck_connect(sf_dir)
    a = con.sql(
        f"SELECT * FROM ({full}) WHERE doc_id % {mod} = 0 ORDER BY doc_id"
    ).fetchall()
    b = con.sql(f"SELECT * FROM ({sliced}) ORDER BY doc_id").fetchall()
    assert len(a) > 50  # the slice must be a real sample, not empty
    assert a == b  # bit-identical nll: stats are full-corpus in both

    eng = bigram_lm_quality(spark, sf_dir).filter(f"doc_id % {mod} = 0")
    assert hashed_compare(eng, sliced, sf_dir) == []
