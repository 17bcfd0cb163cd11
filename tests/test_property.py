"""Property-based differential testing: random ANSI-SQL queries
(filter / project / group-agg / order-limit over lineitem) executed by
BOTH Spark and DuckDB, results compared exactly.

This generalizes the per-query oracles: instead of 58 hand-written
query/oracle pairs, hypothesis explores the predicate/projection space
the reference's grammar covers (comparisons, conjunctions —
src/qp/parser/parser.cup:183-208) plus the aggregates it only parses
(src/qp/parser/parser.cup:225-249), catching semantic drift between
the engines (coercion, null handling, tie-breaks) that fixed examples
miss.

Aggregates are restricted to order-insensitive ones (count/min/max) so
exactness doesn't depend on the decimal-sum contract.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracle import compare, duckdb_run

SF = "/root/testdata/sf0.001"

NUM_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"]
STR_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]

num_pred = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(NUM_COLS),
    st.sampled_from(OPS),
    st.integers(min_value=0, max_value=60),
)
str_pred = st.builds(
    lambda c, op, v: f"{c} {op} '{v}'",
    st.sampled_from(STR_COLS),
    st.sampled_from(["=", "<>"]),
    st.sampled_from(["A", "N", "R", "O", "F"]),
)
date_pred = st.builds(
    lambda op, y, m: f"l_shipdate {op} DATE '{y}-{m:02d}-01'",
    st.sampled_from(["<", ">="]),
    st.integers(min_value=1992, max_value=1998),
    st.integers(min_value=1, max_value=12),
)
predicates = st.lists(st.one_of(num_pred, str_pred, date_pred), min_size=0, max_size=3)


@st.composite
def sql_query(draw) -> str:
    preds = draw(predicates)
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    if draw(st.booleans()):
        # group-agg form
        keys = draw(
            st.lists(st.sampled_from(STR_COLS + ["l_linenumber"]), min_size=1, max_size=2,
                     unique=True)
        )
        target = draw(st.sampled_from(NUM_COLS))
        agg = draw(st.sampled_from(["COUNT(*)", f"MIN({target})", f"MAX({target})"]))
        return (
            f"SELECT {', '.join(keys)}, {agg} AS agg_val, COUNT(*) AS n "
            f"FROM lineitem{where} GROUP BY {', '.join(keys)}"
        )
    # projection form (keys included so LIMIT-less results are comparable)
    cols = draw(st.lists(st.sampled_from(NUM_COLS + STR_COLS), min_size=1, max_size=4,
                         unique=True))
    return f"SELECT {', '.join(cols)} FROM lineitem{where}"


ORDERS_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
ORDERS_STR = ["o_orderstatus"]

o_num_pred = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(ORDERS_NUM),
    st.sampled_from(OPS),
    st.integers(min_value=0, max_value=300_000),
)
o_str_pred = st.builds(
    lambda op, v: f"o_orderstatus {op} '{v}'",
    st.sampled_from(["=", "<>"]),
    st.sampled_from(["F", "O", "P"]),
)


@st.composite
def join_query(draw) -> str:
    """Random 2-table join: lineitem ⋈ orders on the real FK, with
    predicates on either side, as projection or grouped aggregate."""
    preds = draw(st.lists(st.one_of(num_pred, o_num_pred, o_str_pred), max_size=3))
    where = (" AND " + " AND ".join(preds)) if preds else ""
    if draw(st.booleans()):
        key = draw(st.sampled_from(["l_returnflag", "o_orderstatus", "l_linenumber"]))
        target = draw(st.sampled_from(NUM_COLS + ORDERS_NUM))
        agg = draw(st.sampled_from(["COUNT(*)", f"MIN({target})", f"MAX({target})"]))
        return (
            f"SELECT {key}, {agg} AS agg_val FROM lineitem JOIN orders "
            f"ON l_orderkey = o_orderkey WHERE 1=1{where} GROUP BY {key}"
        )
    cols = draw(st.lists(st.sampled_from(NUM_COLS + STR_COLS + ORDERS_NUM + ORDERS_STR),
                         min_size=1, max_size=4, unique=True))
    return (
        f"SELECT {', '.join(cols)} FROM lineitem JOIN orders "
        f"ON l_orderkey = o_orderkey WHERE 1=1{where}"
    )


@pytest.fixture(scope="module")
def views(spark):
    from database_query_processor_spark.catalog import register_tables

    register_tables(spark, SF, tables=("lineitem", "orders"))
    return spark


@given(sql=sql_query())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_matches_duckdb(views, sql):
    probs = compare(views.sql(sql), duckdb_run(sql, SF))
    assert not probs, f"{sql}\n{probs}"


@given(sql=join_query())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_spark_matches_duckdb(views, sql):
    probs = compare(views.sql(sql), duckdb_run(sql, SF))
    assert not probs, f"{sql}\n{probs}"
