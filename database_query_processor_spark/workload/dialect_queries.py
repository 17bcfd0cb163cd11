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
]
