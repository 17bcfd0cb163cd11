"""Reference-parity workload — one named query per operator the
reference actually executes (SURVEY.md §2.1), transposed onto the
TPC-H-ish testdata per FIXTURES.md §C, plus the semantics the reference
parses-but-mangles (theta join, cross join) done correctly.

Reference query shapes covered (testcases/query1..10.sql, demo/*.sql):
  scan, projection, single/conjunctive filters on every comparison op,
  attr-vs-attr filter, 2/3/4-way equi-joins, composite-key join,
  DISTINCT, ORDER BY asc/desc, GROUPBY-as-distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators import relational as R
from database_query_processor_spark.workload import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- scans & projections (testcases/query1.sql, query2.sql shapes) ---


def scan_region(spark, sf_dir):
    """Full-table SELECT * (reference Scan, src/qp/operators/Scan.java)."""
    return _t(spark, sf_dir, "region")


def project_customer(spark, sf_dir):
    """π column subset + reorder (reference Project, non-distinct)."""
    return R.project(_t(spark, sf_dir, "customer"), ["c_custkey", "c_name", "c_acctbal"])


# --- filters: all six comparison ops of src/qp/utils/Condition.java ---


def filter_lt(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return R.project(
        R.select_(li, "l_quantity", "<", 10.0),
        ["l_orderkey", "l_linenumber", "l_quantity"],
    )


def filter_band(spark, sf_dir):
    """Conjunctive range band — the reference stacks one Select per
    conjunct (testcases/query6.sql shape: > lo AND <= hi)."""
    o = _t(spark, sf_dir, "orders")
    return R.project(
        R.select_(R.select_(o, "o_totalprice", ">", 50000.0), "o_totalprice", "<=", 100000.0),
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )


def filter_eq_string(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return R.project(R.select_(o, "o_orderstatus", "=", "F"), ["o_orderkey", "o_orderstatus"])


def filter_ne(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return R.project(
        R.select_(li, "l_returnflag", "!=", "N"),
        ["l_orderkey", "l_linenumber", "l_returnflag"],
    )


def filter_ge_date(spark, sf_dir):
    """>= on a timestamp column (types beyond the reference's
    INT/STRING/REAL triple — ANSI semantics, divergence documented)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )


def filter_attr_attr(spark, sf_dir):
    """Same-table attr-vs-attr compare — routed to the selection list in
    the reference (src/qp/utils/SQLQuery.java:60-67)."""
    li = _t(spark, sf_dir, "lineitem")
    return R.project(
        R.select_attr(li, "l_discount", ">", "l_tax"),
        ["l_orderkey", "l_linenumber", "l_discount", "l_tax"],
    )


# --- joins (testcases/query3/4/5/6/7 shapes) ---


def join2(spark, sf_dir):
    """2-way equi-join customer⋈orders; both key copies kept, matching
    reference join-schema semantics (src/qp/utils/Schema.java:83-90)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return R.equi_join(c, o, [("c_custkey", "o_custkey")]).select(
        "c_custkey", "o_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def join3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = R.equi_join(R.equi_join(c, o, [("c_custkey", "o_custkey")]), li, [("o_orderkey", "l_orderkey")])
    return j.select("c_custkey", "o_orderkey", "l_linenumber", "l_extendedprice")


def join4_band(spark, sf_dir):
    """4-way join + range band (testcases/query6/7 shape). The two
    dimension-sized sides (customer at low SF, part) broadcast; at
    cluster scale Catalyst/AQE picks per-side strategy from stats."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = R.equi_join(c, o, [("c_custkey", "o_custkey")])
    j = R.equi_join(j, li, [("o_orderkey", "l_orderkey")])
    j = R.equi_join(j, p, [("l_partkey", "p_partkey")], broadcast_hint=True)
    j = j.filter((F.col("o_totalprice") > 50000.0) & (F.col("o_totalprice") < 150000.0))
    return j.select("c_name", "o_orderkey", "p_name", "l_quantity", "o_totalprice")


def join_composite_key(spark, sf_dir):
    """Composite-key equi-join (the reference ANDs parallel index lists,
    src/qp/operators/NestedJoin.java:49-57): lineitem self-join on
    (l_orderkey, l_linenumber)."""
    a = _t(spark, sf_dir, "lineitem").alias("a")
    b = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("b_quantity")
    ).alias("b")
    j = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
        "inner",
    )
    return j.select(F.col("a.l_orderkey").alias("l_orderkey"),
                    F.col("a.l_linenumber").alias("l_linenumber"),
                    F.col("a.l_quantity").alias("l_quantity"),
                    "b_quantity")


def theta_join(spark, sf_dir):
    """Theta join done RIGHT — the reference parses `attr op attr`
    across tables but executes pure equality
    (src/qp/operators/NestedJoin.java:139; SURVEY.md §2.2). Mixed
    equi+inequality: the equi conjunct keys the hash join, the
    inequality is a post-join filter."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    j = c.join(
        F.broadcast(s),
        (F.col("c_nationkey") == F.col("s_nationkey")) & (F.col("s_acctbal") > F.col("c_acctbal")),
        "inner",
    )
    return j.select("c_custkey", "s_suppkey", "c_acctbal", "s_acctbal")


def cross_join(spark, sf_dir):
    """Principled cartesian product — the reference silently DROPS
    un-joined FROM tables (src/qp/optimizer/RandomInitialPlan.java:93-102)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return R.cross_join(n, r.select(F.col("r_regionkey").alias("rk"), F.col("r_name").alias("rname")))


# --- distinct / order by / groupby-as-distinct ---


def distinct_(spark, sf_dir):
    """SELECT DISTINCT (testcases/query9.sql). Reference: blocking
    external sort-dedup; Spark: one hash-aggregate shuffle, no total
    order needed."""
    return R.distinct_project(_t(spark, sf_dir, "customer"), ["c_mktsegment", "c_nationkey"])


def orderby_desc(spark, sf_dir):
    """ORDER BY with per-column direction (reference: single global
    ASC/DESC flag only, src/qp/utils/SQLQuery.java:24-25). Spark
    range-partitions by sampled keys → distributed sort, not the
    reference's single-threaded multiway merge."""
    li = _t(spark, sf_dir, "lineitem")
    return R.order_by(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_extendedprice", "l_orderkey"],
        [True, False],
    )


def groupby_as_distinct(spark, sf_dir):
    """Reference GROUPBY: no aggregates — rewritten to distinct on the
    group keys (src/qp/optimizer/RandomInitialPlan.java:188-196)."""
    return R.group_by_distinct(_t(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"])


def salted_join_q(spark, sf_dir):
    """p18: the skew-salted equi-join as a declared query — the
    manual escape hatch for keys so hot that even AQE's skew-split
    partitions overflow (operators/relational.py:salted_join). Left
    rows spread across 8 deterministic salts; the customer dim is
    replicated 8x; the join key becomes (user_id, salt). Result is
    identical to the plain inner join — which is exactly what the
    oracle checks."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = R.salted_join(e, c, on=["user_id"], num_salts=8)
    from database_query_processor_spark.operators.aggregates import dec

    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


SPECS = [
    QuerySpec("p01_scan_full", scan_region, "SELECT * FROM region",
              "full-table scan (ref Scan; testcases/query1.sql shape)"),
    QuerySpec("p02_project", project_customer,
              "SELECT c_custkey, c_name, c_acctbal FROM customer",
              "projection subset+reorder (ref Project; query2 shape)"),
    QuerySpec("p03_filter_lt", filter_lt,
              "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 10.0",
              "σ with < (ref Select)"),
    QuerySpec("p04_filter_band", filter_band,
              "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
              "WHERE o_totalprice > 50000.0 AND o_totalprice <= 100000.0",
              "conjunctive range band (> and <=; query6 shape)"),
    QuerySpec("p05_filter_eq_string", filter_eq_string,
              "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'",
              "σ string equality (ref Select = on STRING)"),
    QuerySpec("p06_filter_ne", filter_ne,
              "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag <> 'N'",
              "σ inequality != (ref Select)"),
    QuerySpec("p07_filter_ge_date", filter_ge_date,
              "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem "
              "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'",
              ">= on timestamp (type-system extension beyond INT/STRING/REAL)"),
    QuerySpec("p08_filter_attr_attr", filter_attr_attr,
              "SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem "
              "WHERE l_discount > l_tax",
              "same-table attr-vs-attr σ (ref SQLQuery selection routing)"),
    QuerySpec("p09_join2", join2,
              "SELECT c_custkey, o_custkey, c_name, o_orderkey, o_totalprice "
              "FROM customer JOIN orders ON c_custkey = o_custkey",
              "2-way equi-join, both key copies kept (query3 shape)"),
    QuerySpec("p10_join3", join3,
              "SELECT c_custkey, o_orderkey, l_linenumber, l_extendedprice FROM customer "
              "JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey",
              "3-way equi-join chain (query4/5 shape)", bench=True),
    QuerySpec("p11_join4_band", join4_band,
              "SELECT c_name, o_orderkey, p_name, l_quantity, o_totalprice FROM customer "
              "JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey "
              "JOIN part ON l_partkey = p_partkey "
              "WHERE o_totalprice > 50000.0 AND o_totalprice < 150000.0",
              "4-way join + band + π (query6/7 shape)", bench=True),
    QuerySpec("p12_join_composite_key", join_composite_key,
              "SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_quantity AS b_quantity "
              "FROM lineitem a JOIN lineitem b "
              "ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber",
              "composite-key equi-join (ref parallel index lists)"),
    QuerySpec("p13_theta_join", theta_join,
              "SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal FROM customer "
              "JOIN supplier ON c_nationkey = s_nationkey AND s_acctbal > c_acctbal",
              "theta join executed correctly (ref silently runs equi)"),
    QuerySpec("p14_cross_join", cross_join,
              "SELECT n_nationkey, n_name, n_regionkey, r_regionkey AS rk, r_name AS rname "
              "FROM nation CROSS JOIN region",
              "cartesian product (ref drops un-joined tables)"),
    QuerySpec("p15_distinct", distinct_,
              "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
              "DISTINCT projection (ref sort-dedup; query9 shape)", bench=True),
    QuerySpec("p16_orderby", orderby_desc,
              "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
              "ORDER BY l_extendedprice DESC, l_orderkey ASC",
              "ORDER BY mixed direction (ref Sort; query10/orderby shape)", bench=True),
    QuerySpec("p17_groupby_as_distinct", groupby_as_distinct,
              "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
              "reference GROUPBY rewrite (distinct on group keys)"),
    QuerySpec("p18_salted_join", salted_join_q,
              "SELECT c_mktsegment, COUNT(*) AS n, "
              "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value "
              "FROM events e JOIN customer c ON e.user_id = c.c_custkey "
              "GROUP BY c_mktsegment",
              "skew-salted equi-join (manual salting for pathological hot "
              "keys beyond AQE's split): salt spread + 8x dim replication, "
              "result identical to the plain join"),
]
