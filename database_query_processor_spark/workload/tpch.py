"""TPC-H-shaped workload (c28-c44) — the remaining classic decision-
support query shapes, adapted to this dataset's reduced schema (no
partsupp table, no l_commitdate/l_receiptdate/l_shipmode columns; see
TESTDATA.md). Together with c02/c22/c23 (Q1/Q3/Q5) this covers every
TPC-H query pattern: EXISTS / NOT EXISTS decorrelation, IN-subquery
semi joins, NOT-IN anti joins, correlated scalar subqueries,
disjunctive multi-table predicates, CTE + scalar-max selection,
outer-join distributions, and CASE-conditional aggregation.

The reference engine executes none of these — its grammar has no
subqueries, OR, LIKE, CASE, or aggregates-that-run (SURVEY.md §2.3,
§2.5; reference: src/qp/parser/parser.cup:183-255,
src/qp/operators/Project.java:66-70). Each query here is the
Spark-native decorrelated form: EXISTS→left_semi, NOT EXISTS→left_anti,
scalar subquery→broadcast 1-row join, so Catalyst plans hash/broadcast
joins instead of per-row re-execution — the property that lets the
same plan run at 100 TB.

All money aggregates use the exact-decimal contract from
operators.aggregates (order-independent sums, hash-stable vs DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators.aggregates import dec
from database_query_processor_spark.workload import QuerySpec


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _one():
    return F.lit(1).cast("decimal(12,2)")


def _revenue():
    """l_extendedprice * (1 - l_discount) as an exact decimal."""
    return dec("l_extendedprice") * (_one() - dec("l_discount"))


def tpch_q4(spark, sf_dir):
    """Q4 order-priority checking: EXISTS → left-semi join whose
    condition mixes the equi key with an inequality on columns from
    BOTH sides (l_shipdate > o_orderdate + 60 days stands in for the
    missing commit/receipt dates)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def tpch_q6(spark, sf_dir):
    """Q6 forecast-revenue: pure scan-side σ (date band + discount band
    + quantity cap, all pushed to parquet) feeding one global sum —
    the canonical predicate-pushdown benchmark."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"))
    )


TPCH_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def tpch_q7(spark, sf_dir):
    """Q7 volume shipping between two nations: the same dimension table
    joined twice under different roles (supplier nation vs customer
    nation) — both broadcast — with a symmetric pair filter."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("supp_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("cust_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def tpch_q9(spark, sf_dir):
    """Q9 product-type profit by nation and year (cost term adapted to
    p_retailprice·qty — no partsupp table in this dataset). LIKE filter
    on part prunes before the fact join; nation broadcasts."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = _revenue() - dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


TPCH_Q9_ORACLE = """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
           - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
    AND s_nationkey = n_nationkey AND p_name LIKE '%a%')
GROUP BY nation, o_year ORDER BY nation ASC, o_year DESC
"""


def tpch_q10(spark, sf_dir):
    """Q10 returned-item reporting: σ on both fact sides (quarter of
    orders, R-flagged lineitems), customer join, top-20 by lost
    revenue with deterministic key tie-break."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


TPCH_Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def tpch_q11(spark, sf_dir):
    """Q11 important-inventory shape: grouped value per part with a
    HAVING threshold that is itself a scalar aggregate (0.2% of the
    national total) — computed once and broadcast as a 1-row join, not
    re-evaluated per group."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value = dec("l_extendedprice") * dec("l_quantity")
    national = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    per_part = national.groupBy("l_partkey").agg(F.sum(value).cast("double").alias("value"))
    threshold = national.agg((F.sum(value).cast("double") * 0.002).alias("cutoff"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("cutoff"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


TPCH_Q11_ORACLE = """
SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 0.002
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
ORDER BY value DESC, l_partkey ASC
"""


def tpch_q12(spark, sf_dir):
    """Q12 shape (shipmode → linestatus, no l_shipmode column):
    CASE-conditional counts inside one grouped aggregate — a single
    pass, no self-join per bucket."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


TPCH_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def tpch_q13(spark, sf_dir):
    """Q13 customer-order distribution: LEFT OUTER join with an extra
    non-key join condition (priority filter belongs in the ON clause,
    not WHERE — WHERE would drop the zero-order customers), then a
    second aggregation over the first's output."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


TPCH_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def tpch_q14(spark, sf_dir):
    """Q14 promo-revenue ratio: two conditional sums in one aggregate,
    divided in double only after each exact-decimal sum — the ratio is
    bit-stable across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = _revenue()
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


TPCH_Q14_ORACLE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END) AS DOUBLE)
     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def tpch_q15(spark, sf_dir):
    """Q15 top supplier: CTE (revenue per supplier over a quarter)
    consumed twice — once for the rows, once for its MAX — joined via a
    broadcast 1-row scalar instead of recomputing per row."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).cast("double").alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(best), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TPCH_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def tpch_q16(spark, sf_dir):
    """Q16 supplier-count shape (part-supplier link via lineitem — no
    partsupp): NOT IN → left-anti join against the blacklist, then
    grouped exact COUNT(DISTINCT)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand").asc(), F.col("p_size").asc())
    )


TPCH_Q16_ORACLE = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey AND p_brand <> 'Brand#13'
  AND p_size IN (1,4,9,14,19,23,36,45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
"""


def tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue: correlated scalar subquery
    (per-part average quantity) decorrelated into a grouped aggregate
    joined back on the correlation key. l_quantity is integral, so the
    double average is exact and order-independent."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(
            (F.lit(0.5) * (F.sum("l_quantity") / F.count("l_quantity"))).alias("qty_cut"),
        )
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


TPCH_Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


def tpch_q18(spark, sf_dir):
    """Q18 large-volume customers. The IN-subquery's HAVING aggregate
    (total quantity per order > 200) is ALSO the reporting measure:
    o_orderkey is unique in orders, so each reporting group is exactly
    one qualifying order and its sum_qty equals the tot_qty already
    computed. The rewrite joins the filtered aggregate directly —
    lineitem is scanned and aggregated ONCE (the semi-join + second
    scan + re-aggregation shape costs a full extra pass over the fact
    table at any scale). Same result set as the textbook plan; the
    oracle keeps the literal IN-subquery formulation."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("tot_qty"))
        .filter(F.col("tot_qty") > 200)
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("tot_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


TPCH_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def tpch_q19(spark, sf_dir):
    """Q19 discounted revenue: disjunction of conjunctive brand/size/
    quantity bands spanning BOTH join sides — stays a single equi-join
    with the OR as a post-join filter (Catalyst pushes the
    per-side residuals below the join on its own)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bands = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(bands)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


TPCH_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))
"""


def tpch_q20(spark, sf_dir):
    """Q20 potential-promotion suppliers: nested IN subqueries — part
    filter feeds a grouped-HAVING lineitem subquery, whose supplier set
    semi-joins the outer supplier⋈nation block."""
    bolts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(bolts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("tot"))
        .filter(F.col("tot") > 300)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


TPCH_Q20_ORACLE = """
SELECT s_name, s_suppkey FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
  AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_3','NATION_7','NATION_11')
ORDER BY s_suppkey
"""


def tpch_q21(spark, sf_dir):
    """Q21 suppliers-who-kept-orders-waiting: EXISTS (another supplier
    on the same order) + NOT EXISTS (another LATE supplier on the same
    order) as one semi and one anti join over the same fact — the
    lateness condition references the already-joined orders side
    (l_shipdate > o_orderdate + 90 days stands in for receipt/commit)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l1 = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
    )
    l2 = li.select(F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key"))
    l3 = li.select(
        F.col("l_orderkey").alias("o3_key"),
        F.col("l_suppkey").alias("s3_key"),
        F.col("l_shipdate").alias("ship3"),
    )
    return (
        l1.join(
            l2,
            (F.col("o2_key") == F.col("l_orderkey")) & (F.col("s2_key") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3_key") == F.col("l_orderkey"))
            & (F.col("s3_key") != F.col("l_suppkey"))
            & (F.col("ship3") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


TPCH_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 100
"""


def tpch_q22(spark, sf_dir):
    """Q22 global-sales-opportunity shape: scalar average (broadcast
    1-row) gates customers, NOT EXISTS recent orders → left-anti join,
    country code adapted to c_nationkey % 10 (no c_phone column)."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("avg_bal"))
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


TPCH_Q22_ORACLE = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal FROM (
  SELECT c_nationkey % 10 AS cntrycode, c_acctbal FROM customer
  WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal)
                     FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-06-01'))
GROUP BY cntrycode ORDER BY cntrycode
"""


def tpch_q2(spark, sf_dir):
    """Q2 minimum-cost-supplier shape (no partsupp: unit cost derived
    as min extprice/qty per (part, supplier) from lineitem): the
    correlated-MIN subquery decorrelates to a grouped MIN joined back
    on the correlation key; region-gated supplier set reused by both
    the outer block and the MIN. Unit cost is a single IEEE divide on
    doubles — bit-stable cross-engine where decimal division scale
    rules are not."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE").select("p_partkey")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )
    eligible = (
        cost.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
    )
    min_cost = eligible.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eligible.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", F.col("l_partkey").alias("p_partkey"), "unit_cost"
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(), F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


TPCH_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
FROM part, supplier, cost, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2, supplier s2, nation n2, region r2
                   WHERE c2.l_partkey = p_partkey AND c2.l_suppkey = s2.s_suppkey
                     AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
                     AND r2.r_name = 'ASIA')
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC LIMIT 100
"""


def tpch_q8(spark, sf_dir):
    """Q8 national market share: 8-table join (nation twice: customer
    region gate + supplier nationality), yearly share ratio from two
    conditional decimal sums divided only after casting — bit-stable."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _revenue()
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"), "left_semi")
        .join(n2, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


TPCH_Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'ECONOMY')
GROUP BY o_year ORDER BY o_year
"""


SPECS = [
    QuerySpec("c49_tpch_q2", tpch_q2, TPCH_Q2_ORACLE,
              "TPC-H Q2 shape: correlated-MIN subquery decorrelated, region-gated"),
    QuerySpec("c50_tpch_q8", tpch_q8, TPCH_Q8_ORACLE,
              "TPC-H Q8: market-share ratio, nation joined under two roles"),
    QuerySpec("c28_tpch_q4", tpch_q4, TPCH_Q4_ORACLE,
              "TPC-H Q4 shape: EXISTS decorrelated to a mixed-condition semi join"),
    QuerySpec("c29_tpch_q6", tpch_q6, TPCH_Q6_ORACLE,
              "TPC-H Q6: pushdown-only scan + single global aggregate", bench=True),
    QuerySpec("c30_tpch_q7", tpch_q7, TPCH_Q7_ORACLE,
              "TPC-H Q7: one dimension joined under two roles, symmetric pair filter"),
    QuerySpec("c31_tpch_q9", tpch_q9, TPCH_Q9_ORACLE,
              "TPC-H Q9 shape: LIKE-pruned part join, profit by nation/year"),
    QuerySpec("c32_tpch_q10", tpch_q10, TPCH_Q10_ORACLE,
              "TPC-H Q10: returned-item revenue top-20"),
    QuerySpec("c33_tpch_q11", tpch_q11, TPCH_Q11_ORACLE,
              "TPC-H Q11 shape: HAVING vs broadcast scalar-aggregate threshold"),
    QuerySpec("c34_tpch_q12", tpch_q12, TPCH_Q12_ORACLE,
              "TPC-H Q12 shape: CASE-conditional counts in one grouped pass"),
    QuerySpec("c35_tpch_q13", tpch_q13, TPCH_Q13_ORACLE,
              "TPC-H Q13: outer join with ON-clause filter, aggregation of an aggregation"),
    QuerySpec("c36_tpch_q14", tpch_q14, TPCH_Q14_ORACLE,
              "TPC-H Q14: conditional-sum ratio (promo revenue share)"),
    QuerySpec("c37_tpch_q15", tpch_q15, TPCH_Q15_ORACLE,
              "TPC-H Q15: CTE reused for rows and for its scalar MAX"),
    QuerySpec("c38_tpch_q16", tpch_q16, TPCH_Q16_ORACLE,
              "TPC-H Q16 shape: NOT IN anti join + grouped COUNT(DISTINCT)"),
    QuerySpec("c39_tpch_q17", tpch_q17, TPCH_Q17_ORACLE,
              "TPC-H Q17: correlated scalar subquery decorrelated to agg+join"),
    QuerySpec("c40_tpch_q18", tpch_q18, TPCH_Q18_ORACLE,
              "TPC-H Q18: IN-subquery over grouped HAVING, top-100 report", bench=True),
    QuerySpec("c41_tpch_q19", tpch_q19, TPCH_Q19_ORACLE,
              "TPC-H Q19: disjunctive cross-side predicate on one equi-join"),
    QuerySpec("c42_tpch_q20", tpch_q20, TPCH_Q20_ORACLE,
              "TPC-H Q20: nested IN subqueries as chained semi joins"),
    QuerySpec("c43_tpch_q21", tpch_q21, TPCH_Q21_ORACLE,
              "TPC-H Q21: EXISTS + NOT EXISTS as semi + anti joins on one fact"),
    QuerySpec("c44_tpch_q22", tpch_q22, TPCH_Q22_ORACLE,
              "TPC-H Q22 shape: scalar-average gate + NOT EXISTS anti join"),
]
