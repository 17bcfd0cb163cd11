"""Dialect workload: reference-dialect query strings executed through
plans/dialect.translate → spark.sql, proving the reference's own
surface syntax runs verbatim on this engine (comma-AND WHERE,
GROUPBY/ORDERBY keywords, double-quoted literals, global DESC flag,
aggregates that the reference parses but cannot execute)."""

from __future__ import annotations

from database_query_processor_spark.catalog import register_tables
from database_query_processor_spark.plans.dialect import run_reference_sql
from database_query_processor_spark.workload import QuerySpec

D01_REF = """
SELECT customer.c_name, orders.o_orderkey, orders.o_totalprice
FROM customer, orders
WHERE customer.c_custkey = orders.o_custkey, orders.o_totalprice > "150000", orders.o_orderstatus = "F"
ORDERBY orders.o_totalprice
DESC
"""

D02_REF = """
SELECT orders.o_orderstatus, MAX(orders.o_totalprice), COUNT(orders.o_orderkey)
FROM orders
GROUPBY orders.o_orderstatus
"""


def dialect_join_band_orderby(spark, sf_dir):
    register_tables(spark, sf_dir, ("customer", "orders"))
    return run_reference_sql(spark, D01_REF)


def dialect_groupby_agg(spark, sf_dir):
    register_tables(spark, sf_dir, ("orders",))
    return run_reference_sql(spark, D02_REF)


# d03-d10: the reference's own testcases/query1-10.sql shapes
# transposed onto the TPC-H-ish tables (CUSTOMER→customer, CART→orders,
# CARTDETAILS→lineitem, BILL→part chain becomes
# customer⋈orders⋈lineitem⋈part), each run through the dialect
# translator and oracle-checked. query6/query10 band+orderby and
# query8 aggregates are covered by d01/d02 above.

_JOIN4_WHERE = (
    "customer.c_custkey=orders.o_custkey, orders.o_orderkey=lineitem.l_orderkey, "
    "lineitem.l_partkey=part.p_partkey"
)
_JOIN4_WHERE_ANSI = (
    "c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_partkey = p_partkey"
)

_D_REF = {
    # query1: full scan SELECT *
    "d03_dialect_scan_star": ("SELECT * FROM region", ("region",),
                              "SELECT * FROM region", "query1 shape: SELECT * scan"),
    # query2: projection + equality filter on quoted literal
    "d04_dialect_project_filter": (
        'SELECT customer.c_custkey, customer.c_mktsegment, customer.c_name '
        'FROM customer WHERE customer.c_mktsegment="BUILDING"',
        ("customer",),
        "SELECT c_custkey, c_mktsegment, c_name FROM customer "
        "WHERE c_mktsegment = 'BUILDING'",
        "query2 shape: projection + σ"),
    # query3: 2-way join with projection
    "d05_dialect_join2": (
        "SELECT customer.c_custkey, customer.c_name, orders.o_orderkey, orders.o_orderstatus "
        "FROM customer, orders WHERE customer.c_custkey=orders.o_custkey",
        ("customer", "orders"),
        "SELECT c_custkey, c_name, o_orderkey, o_orderstatus FROM customer "
        "JOIN orders ON c_custkey = o_custkey",
        "query3 shape: 2-way equi-join"),
    # query4: SELECT * over a 3-way join
    "d06_dialect_join3_star": (
        "SELECT * FROM customer, orders, lineitem "
        "WHERE customer.c_custkey=orders.o_custkey, orders.o_orderkey=lineitem.l_orderkey",
        ("customer", "orders", "lineitem"),
        "SELECT * FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey",
        "query4 shape: SELECT * over 3-way join"),
    # query5: SELECT * over a 4-way join
    "d07_dialect_join4_star": (
        f"SELECT * FROM customer, orders, lineitem, part WHERE {_JOIN4_WHERE}",
        ("customer", "orders", "lineitem", "part"),
        f"SELECT * FROM customer, orders, lineitem, part WHERE {_JOIN4_WHERE_ANSI}",
        "query5 shape: SELECT * over 4-way join"),
    # query7: projection over 4-way join + band filters. The band sits
    # INSIDE the synthetic p_retailprice domain (900..999.9; 900..919.9
    # at sf0.001) — the previous 1200..1500 band matched nothing, so
    # the hash check was vacuously green on 0 == 0 rows and the
    # quoted-numeric-literal coercion it exists to prove went
    # unverified.
    "d08_dialect_join4_band_project": (
        "SELECT customer.c_mktsegment, part.p_retailprice "
        "FROM customer, orders, lineitem, part "
        f'WHERE {_JOIN4_WHERE}, part.p_retailprice<"915", part.p_retailprice>"905"',
        ("customer", "orders", "lineitem", "part"),
        "SELECT c_mktsegment, p_retailprice FROM customer, orders, lineitem, part "
        f"WHERE {_JOIN4_WHERE_ANSI} AND p_retailprice < 915 AND p_retailprice > 905",
        "query7 shape: π over 4-way join + band σ"),
    # query9: DISTINCT
    "d09_dialect_distinct": (
        "SELECT DISTINCT customer.c_mktsegment FROM customer",
        ("customer",),
        "SELECT DISTINCT c_mktsegment FROM customer",
        "query9 shape: DISTINCT projection"),
    # query10 without the DESC flag: global ascending ORDERBY
    "d10_dialect_orderby_asc": (
        "SELECT orders.o_orderkey, orders.o_totalprice FROM orders "
        'WHERE orders.o_totalprice>"200000" ORDERBY orders.o_totalprice',
        ("orders",),
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 200000 "
        "ORDER BY o_totalprice",
        "query10 shape (asc): σ + global-direction ORDERBY"),
}


def _make_build(ref_sql: str, tables: tuple[str, ...]):
    def build(spark, sf_dir):
        register_tables(spark, sf_dir, tables)
        return run_reference_sql(spark, ref_sql)

    return build


SPECS = [
    QuerySpec("d01_dialect_join_band_orderby", dialect_join_band_orderby,
              "SELECT c_name, o_orderkey, o_totalprice FROM customer JOIN orders "
              "ON c_custkey = o_custkey WHERE o_totalprice > 150000 AND o_orderstatus = 'F' "
              "ORDER BY o_totalprice DESC",
              "reference dialect end-to-end: comma-AND + quoted literals + global DESC (query10 shape)"),
    QuerySpec("d02_dialect_groupby_agg", dialect_groupby_agg,
              "SELECT o_orderstatus, MAX(o_totalprice) AS max_o_totalprice, "
              "COUNT(o_orderkey) AS count_o_orderkey FROM orders GROUP BY o_orderstatus",
              "reference dialect GROUPBY with aggregates (query8 shape — aborts in the reference)"),
] + [
    QuerySpec(name, _make_build(ref_sql, tables), oracle, desc)
    for name, (ref_sql, tables, oracle, desc) in _D_REF.items()
]
