"""Completions workload — everything the reference declares or hints at
but never executes (SURVEY.md §2.5-2.6): real aggregates with GROUP BY
+ HAVING, grouping sets (rollup/cube), exact + approximate distinct
counting, set operations (the `Schema.checkCompat` vestige,
src/qp/utils/Schema.java:114-126), LIMIT/top-k, window functions,
semi/anti joins and subqueries, scalar expressions (the reference has
NO scalar functions at all, src/qp/parser/parser.cup:197-255), pivot.

All doubles that pass through aggregation use the exact-decimal
contract from operators.aggregates so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators.aggregates import avg_money, dec, sum_money
from database_query_processor_spark.workload import QuerySpec


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def agg_global(spark, sf_dir):
    """Un-grouped aggregates over lineitem: COUNT/COUNT DISTINCT/
    MIN/MAX/SUM/AVG in one pass (single partial+final aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        sum_money("l_extendedprice", "sum_price"),
        avg_money("l_extendedprice", "avg_price"),
    )


def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary — the flagship aggregate (grouped, 8
    aggregates, partial-agg shuffle carries 4 groups not 600k rows)."""
    li = _t(spark, sf_dir, "lineitem")
    disc = dec("l_discount")
    ext = dec("l_extendedprice")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(ext).cast("double").alias("sum_base_price"),
            F.sum(ext * (F.lit(1).cast("decimal(12,2)") - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ext * (F.lit(1).cast("decimal(12,2)") - disc) * (F.lit(1).cast("decimal(12,2)") + dec("l_tax")))
            .cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(ext).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Decimal -> double goes through VARCHAR in the oracle: DuckDB's
# direct CAST(DECIMAL AS DOUBLE) computes int128/10^scale with TWO
# float roundings and is off-by-one-ulp once the decimal needs ≥16
# significant digits (first seen at sf1: Q1's R/O sum_charge
# 27864155010.941590 -> duckdb 27864155010.941593 vs the correctly
# rounded ...94159 that Spark's BigDecimal.doubleValue and Python's
# float() both produce). String -> double is correctly rounded in
# both engines, so the VARCHAR bridge IS the exact-decimal contract's
# conversion; at sweep scales below 16 digits the two paths agree.
TPCH_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def groupby_having(spark, sf_dir):
    """GROUP BY + HAVING (testcases/query8.sql shape, executed for real
    — the reference aborts, src/qp/operators/Project.java:66-70)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), sum_money("o_totalprice", "total_spent"),
             F.max("o_totalprice").alias("max_order"))
        .filter(F.col("n_orders") >= 8)
    )


def rollup_(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), sum_money("l_extendedprice", "sum_price")
    )


def cube_(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), sum_money("l_quantity", "sum_qty")
    )


def tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): selective dim filter →
    3-way join → grouped revenue → top-10. Catalyst broadcasts the
    filtered customer side; the revenue shuffle carries one row per
    surviving order. Dates shifted to this dataset's 1995-2001 range;
    deterministic tie-break keys added for oracle stability."""
    one = F.lit(1).cast("decimal(12,2)")
    cutoff = F.lit("1997-06-01 00:00:00").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


TPCH_Q3_ORACLE = """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


def tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): 6-way join — three
    broadcastable dims (supplier, nation, region) + the
    customer⋈orders⋈lineitem fact chain, with the c_nationkey =
    s_nationkey 'local' condition. The classic join-order/broadcast
    stress test."""
    one = F.lit(1).cast("decimal(12,2)")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


TPCH_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def grouping_sets_(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): the two-level +
    grand-total set list."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(F.count("*").alias("n"), sum_money("l_extendedprice", "sum_price"))


def percentile_(spark, sf_dir):
    """Exact percentiles (median/p95) per group — sort-based exact
    aggregate; both engines interpolate (n-1)·p positions identically
    on this integral-valued column."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.95D)").alias("p95_qty"),
    )


def approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL++) — the 100 TB-friendly distinct
    count — made oracle-checkable: the query emits the EXACT distinct
    count plus `within_tol` = sketch estimate within 5% (~5 sigma at
    rsd=0.01) of it, and the DuckDB oracle computes the exact count
    with literal TRUE. A hash match therefore certifies the sketch's
    error bound, not just row shape."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    tol = F.abs(F.col("approx") - F.col("exact_parts")) <= 0.05 * F.col("exact_parts") + 0.5
    return agg.select("l_returnflag", "exact_parts", tol.alias("within_tol"))


def union_all(spark, sf_dir):
    """UNION ALL of two σ branches (set-op surface the reference only
    hints at via Schema.checkCompat)."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 250000.0).select("o_orderkey", "o_totalprice")
    lo = o.filter(F.col("o_totalprice") < 1000.0).select("o_orderkey", "o_totalprice")
    return hi.unionAll(lo)


def intersect_(spark, sf_dir):
    """INTERSECT (distinct semantics): nations having both customers
    and suppliers."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


def except_(spark, sf_dir):
    """EXCEPT: nations with customers but no suppliers."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).distinct()


def topk(spark, sf_dir):
    """ORDER BY + LIMIT = distributed TopK (Spark's TakeOrderedAndProject:
    per-partition heap + driver merge of K, not a global sort). Tie-broken
    on the key so the result set is deterministic."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


def window_topk_per_group(spark, sf_dir):
    """Top-3 customers by balance per nation: row_number window (no
    reference analog — SURVEY.md §2.6 'none')."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


def window_running_sum(spark, sf_dir):
    """Per-customer running order total (rows-frame cumulative sum over
    exact decimals)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


def window_lag_lead(spark, sf_dir):
    """lag/lead + rank over event stream per user."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id", 1).over(w).alias("prev_event"),
        F.lead("event_id", 1).over(w).alias("next_event"),
        F.row_number().over(w).alias("seq"),
    )


def semi_join(spark, sf_dir):
    """EXISTS as left-semi join: customers with ≥1 high-value order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def anti_join(spark, sf_dir):
    """NOT EXISTS as left-anti join: customers with no HIGH-VALUE
    (>400k) order. The filter makes the check DISCRIMINATING: every
    customer has >= 1 order in the synthetic data, so the unfiltered
    'no orders' form returned zero rows and its hash check was
    vacuous (a broken anti-join yielding empty would still match);
    ~13% of customers lack a 400k order, so both branches carry
    rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def outer_join(spark, sf_dir):
    """LEFT OUTER join (reference executes inner only — SURVEY.md §2.2):
    every customer with HIGH-VALUE (>400k) order counts, 0 for
    customers with none. The filter is what makes the NULL-aware
    COUNT branch observable: unfiltered, every customer has orders,
    so the output equaled a plain inner join and the outer semantics
    were untested."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    j = c.join(o, c.c_custkey == o.o_custkey, "left_outer")
    return j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


def scalar_subquery(spark, sf_dir):
    """Scalar subquery: orders above 1.5× the deterministic average
    price (2× exceeded the max price in the synthetic domain — the
    result was empty and the hash check vacuous). The single-row aggregate joins back via broadcast crossJoin
    — the plan stays lazy (no job at build time) and single-pass, with
    the threshold evaluated executor-side like Catalyst's own scalar
    subquery rewrite."""
    o = _t(spark, sf_dir, "orders")
    avg_row = o.agg((F.sum(dec("o_totalprice", 18, 2)).cast("double") / F.count("*")).alias("a"))
    return (
        o.crossJoin(F.broadcast(avg_row))
        .filter(F.col("o_totalprice") > 1.5 * F.col("a"))
        .select("o_orderkey", "o_totalprice")
    )


def scalar_functions(spark, sf_dir):
    """Scalar expression surface (string/date/math/conditional) — the
    reference has NO scalar functions (src/qp/parser/parser.cup:197-255).
    floor/ceil instead of round (round tie-breaking differs by engine)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.floor(F.col("o_totalprice") / 1000.0).cast("long").alias("price_k"),
        F.when(F.col("o_totalprice") > 150000.0, F.lit("big"))
        .when(F.col("o_totalprice") > 50000.0, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("bucket"),
    )


def pivot_(spark, sf_dir):
    """PIVOT l_linestatus → columns (conditional-aggregation form in
    the oracle)."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")))
    )
    return p.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_open"),
        F.col("F").cast("double").alias("qty_filled"),
    )


def approx_percentile_(spark, sf_dir):
    """Approximate percentiles (GK sketch): mergeable partial sketches
    shuffle O(1/ε) summaries, never the values — the scale path where
    c21's exact percentile needs a full sort. Oracle-checkable form:
    each sketch quantile must land inside the exact rank window
    [percentile(q−0.01), percentile(q+0.01)] (accuracy=10000 → ε=1e-4;
    ±1% rank is the generous hard bound also pinned in
    tests/test_sketches.py). The emitted booleans + exact row count
    hash-match a TRUE-literal DuckDB oracle."""
    li = _t(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.75, 0.9]
    approx = F.percentile_approx("l_extendedprice", qs, 10000)
    lo = F.expr(
        "percentile(l_extendedprice, array({}))".format(
            ", ".join(f"{q - 0.01}D" for q in qs)
        )
    )
    hi = F.expr(
        "percentile(l_extendedprice, array({}))".format(
            ", ".join(f"{q + 0.01}D" for q in qs)
        )
    )
    agg = li.agg(
        F.count("*").alias("n_rows"),
        approx.alias("a"),
        lo.alias("lo"),
        hi.alias("hi"),
    )
    oks = [
        (
            (F.element_at("a", i + 1) >= F.element_at("lo", i + 1))
            & (F.element_at("a", i + 1) <= F.element_at("hi", i + 1))
        ).alias(f"q{int(q * 100)}_ok")
        for i, q in enumerate(qs)
    ]
    return agg.select("n_rows", *oks)


def unpivot_(spark, sf_dir):
    """UNPIVOT/melt: part's numeric attributes to (attr, val) rows —
    scan-side Expand, no shuffle."""
    p = _t(spark, sf_dir, "part")
    return p.select("p_partkey", F.col("p_size").cast("double").alias("p_size"),
                    F.col("p_retailprice").cast("double").alias("p_retailprice")).unpivot(
        "p_partkey", ["p_size", "p_retailprice"], "attr", "val"
    )


def count_distinct_grouped(spark, sf_dir):
    """Grouped exact COUNT(DISTINCT): exercises the Expand-based
    distinct-aggregate rewrite (partial dedup before the final agg)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


def filtered_agg(spark, sf_dir):
    """Conditional aggregation (SQL FILTER clause): per-month order
    counts split by priority in one pass — no self-joins."""
    o = _t(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("timestamp_ntz")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1)
    return o.groupBy(month.alias("month")).agg(
        F.count("*").alias("n_orders"),
        F.count(urgent).alias("n_urgent"),
        sum_money("o_totalprice", "sum_price"),
    )


def hll_daily_estimates(e):
    """(day, approx_users): per-hour HLL sketches union-merged to
    daily estimates — the raw rollup, shared by the c45 query and the
    mergeability tests."""
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.hll_sketch_agg("user_id", 12).alias("sk")
    )
    daily = hourly.groupBy(F.date_trunc("day", "hour").alias("day")).agg(
        F.hll_union_agg("sk").alias("dsk")
    )
    return daily.select("day", F.hll_sketch_estimate("dsk").alias("approx_users"))


def sketch_rollup(spark, sf_dir):
    """Mergeable-sketch pre-aggregation (DataSketches HLL): per-hour
    user sketches union-merged to daily distinct estimates. THE
    pattern for distinct-counting 100 TB incrementally — fine-grained
    jobs persist ~KB sketches, the rollup merges sketches instead of
    re-scanning history, and a day costs 24 sketch merges regardless
    of row count. Oracle-checkable form: emit the exact per-day
    distinct count plus `within_tol` = merged estimate within 5%
    (lgConfigK=12 → ~1.6% rsd, 5% ≈ 3 sigma); DuckDB computes the
    exact count with literal TRUE, so the hash match certifies the
    rollup's error bound. Mergeability (merged ≡ direct sketch) is
    pinned separately in tests/test_sketches.py."""
    e = _t(spark, sf_dir, "events")
    est = hll_daily_estimates(e)
    exact = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").alias("n_users")
    )
    tol = F.abs(F.col("approx_users") - F.col("n_users")) <= 0.05 * F.col("n_users") + 0.5
    return (
        est.join(exact, "day")
        .select("day", "n_users", tol.alias("within_tol"))
        .orderBy("day")
    )


def kll_daily_quantiles(e):
    """(day, median_value, p95_value): hourly KLL sketches folded to
    daily quantile estimates — the raw rollup, shared by the c46 query
    and the rank-error tests. kll_sketch_merge_double is a binary
    merge, so the daily fold is an explicit array aggregate over the
    collected hourly sketches — mergeability on display."""
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.kll_sketch_agg_double("value", F.lit(200)).alias("sk")
    )
    daily = hourly.groupBy(F.date_trunc("day", "hour").alias("day")).agg(
        F.collect_list("sk").alias("sks")
    )
    merged = daily.select(
        "day",
        F.aggregate(
            F.slice("sks", 2, F.size("sks") - 1),
            F.element_at("sks", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("dsk"),
    )
    return merged.select(
        "day",
        F.kll_sketch_get_quantile_double("dsk", F.lit(0.5)).alias("median_value"),
        F.kll_sketch_get_quantile_double("dsk", F.lit(0.95)).alias("p95_value"),
    )


def kll_quantile_rollup(spark, sf_dir):
    """Mergeable quantile sketches (DataSketches KLL): per-hour value
    sketches folded into daily p50/p95 estimates. The quantile
    counterpart of c45's HLL rollup — percentiles over 100 TB without
    a global sort, and incrementally: history contributes KB sketches,
    not rows. Oracle-checkable form: each estimate must land inside
    the exact per-day rank window [percentile(q−0.03),
    percentile(q+0.03)] (k=200 → ε≈1.3% rank error; 3% hard bound,
    same as tests/test_sketches.py); emitted booleans + exact row
    count hash-match a TRUE-literal DuckDB oracle."""
    e = _t(spark, sf_dir, "events")
    est = kll_daily_quantiles(e)
    exact = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.expr("percentile(value, 0.47D)").alias("p50_lo"),
        F.expr("percentile(value, 0.53D)").alias("p50_hi"),
        F.expr("percentile(value, 0.92D)").alias("p95_lo"),
        F.expr("percentile(value, 0.98D)").alias("p95_hi"),
    )
    p50_ok = (F.col("median_value") >= F.col("p50_lo")) & (F.col("median_value") <= F.col("p50_hi"))
    p95_ok = (F.col("p95_value") >= F.col("p95_lo")) & (F.col("p95_value") <= F.col("p95_hi"))
    return (
        est.join(exact, "day")
        .select("day", "n_events", p50_ok.alias("p50_ok"), p95_ok.alias("p95_ok"))
        .orderBy("day")
    )


def window_range_frame(spark, sf_dir):
    """RANGE-framed window over event time: 7-day trailing spend per
    customer — the frame is defined by VALUE distance (timestamp
    within [cur−6d, cur]), not row count, so equal-date peers share
    one frame. Complements the rows-frame running sum (c12)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("trailing_7d"),
    )


RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d
FROM orders
"""


def window_rank_family(spark, sf_dir):
    """The full ranking-function family in one window: rank /
    dense_rank / percent_rank / cume_dist / ntile quartiles per
    customer by order value. The o_orderkey tiebreak makes the order
    total, so every rank — and the two int/int-divide fractions — is
    deterministic and hash-matches the oracle."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


RANK_FAMILY_SQL = """
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


def json_extract(spark, sf_dir):
    """Semi-structured processing: parse the events JSON props column
    with a TYPED from_json (JVM-side Jackson, no schema inference, no
    Python) and aggregate on the extracted field. The typed schema is
    what keeps this a single codegen'd scan at 100 TB — schema-on-read
    without an inference pass."""
    e = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


THETA_SET_OPS_SQL = """
WITH e AS (SELECT DISTINCT event_type, user_id FROM events
           WHERE ts < TIMESTAMP '2024-01-03'),
c AS (SELECT user_id FROM e WHERE event_type = 'click'),
b AS (SELECT user_id FROM e WHERE event_type = 'purchase')
SELECT (SELECT COUNT(*) FROM c JOIN b USING (user_id)) AS n_both,
       (SELECT COUNT(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM b)) AS n_click_only,
       TRUE AS both_ok, TRUE AS click_only_ok
"""

JSON_EXTRACT_SQL = """
WITH j AS (SELECT event_type, CAST(props->>'k' AS INTEGER) AS k FROM events)
SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
FROM j WHERE k > 50 GROUP BY event_type
"""


def theta_estimates(e):
    """(both, click_only) theta-sketch estimates over a pre-filtered
    events frame — the raw sketch math, shared by the c48 query and
    the exactness tests."""
    sk = e.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    click = sk.filter(F.col("event_type") == "click").select(F.col("sk").alias("click_sk"))
    buy = sk.filter(F.col("event_type") == "purchase").select(F.col("sk").alias("buy_sk"))
    return click.join(F.broadcast(buy)).select(
        F.theta_sketch_estimate(F.theta_intersection("click_sk", "buy_sk")).alias("both"),
        F.theta_sketch_estimate(F.theta_difference("click_sk", "buy_sk")).alias("click_only"),
    )


def theta_set_ops(spark, sf_dir):
    """Theta-sketch set operations: |clickers ∩ purchasers| and
    |clickers ∖ purchasers| over a 2-day window, estimated from two
    mergeable sketches — audience overlap without materializing either
    id set (HLL can union but NOT intersect; theta sketches keep the
    sample needed for ∩ and ∖, the reason both families exist).
    Oracle-checkable form: emit the exact intersection/difference
    sizes plus booleans that each estimate is within 5% of exact
    (below the 4096-entry nominal the sketch is exact, so these hold
    with zero slack at test scale); DuckDB computes the exact set
    sizes with literal TRUEs."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    est = theta_estimates(e)
    click_ids = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buy_ids = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    n_both = click_ids.join(buy_ids, "user_id").agg(F.count("*").alias("n_both"))
    n_click_only = click_ids.join(buy_ids, "user_id", "left_anti").agg(
        F.count("*").alias("n_click_only")
    )
    both_ok = F.abs(F.col("both") - F.col("n_both")) <= 0.05 * F.col("n_both") + 0.5
    click_only_ok = (
        F.abs(F.col("click_only") - F.col("n_click_only")) <= 0.05 * F.col("n_click_only") + 0.5
    )
    return (
        est.crossJoin(F.broadcast(n_both))
        .crossJoin(F.broadcast(n_click_only))
        .select(
            "n_both",
            "n_click_only",
            both_ok.alias("both_ok"),
            click_only_ok.alias("click_only_ok"),
        )
    )


UNPIVOT_SQL = """
SELECT p_partkey, attr, val FROM (
  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part)
"""

FILTERED_AGG_SQL = """
SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
"""


def null_safe_join(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match NULL keys instead of vanishing. Built by nulling out one
    segment on both sides — a plain equi-join would drop every
    BUILDING customer; the null-safe join routes them to the '(null)'
    bucket. Catalyst plans EqualNullSafe as a hash-join key (null-safe
    keys hash like any other), so this stays a broadcast hash join,
    not a nested loop."""
    c = _t(spark, sf_dir, "customer")
    k = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    left = c.select(k.alias("k"), "c_custkey")
    right = (
        c.select(k.alias("rk")).distinct()
        .select("rk", F.coalesce("rk", F.lit("(null)")).alias("segment_label"))
    )
    return (
        left.join(right, left["k"].eqNullSafe(right["rk"]))
        .groupBy("segment_label")
        .agg(F.count("*").alias("n_customers"))
    )


NULL_SAFE_JOIN_SQL = """
WITH l AS (SELECT nullif(c_mktsegment, 'BUILDING') AS k, c_custkey FROM customer),
r AS (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS rk,
             COALESCE(nullif(c_mktsegment, 'BUILDING'), '(null)') AS segment_label
      FROM customer)
SELECT r.segment_label, COUNT(*) AS n_customers
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.rk
GROUP BY r.segment_label
"""


def token_positions(spark, sf_dir):
    """Positional explode (LATERAL VIEW posexplode): token → first
    occurrence position per document. The explode is a generator in
    the scan stage (no shuffle); the only exchange is the final
    (doc_id, token) aggregate."""
    from database_query_processor_spark.functions import text as TX

    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", F.posexplode(TX.tokens("text")).alias("pos", "token"))
    return t.groupBy("doc_id", "token").agg(
        (F.min("pos") + 1).cast("long").alias("first_pos")
    )


TOKEN_POSITIONS_SQL = """
WITH t AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> len(x) > 0) AS toks
  FROM documents),
x AS (SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
      FROM t)
SELECT doc_id, token, CAST(MIN(pos) AS BIGINT) AS first_pos
FROM x GROUP BY doc_id, token
"""


def lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery — top-2 customers by balance per
    nation. Catalyst decorrelates the per-nation ORDER BY ... LIMIT
    into a WindowGroupLimit (rank pushed below the shuffle, partial
    top-k per partition before the exchange) + one hash join — NOT a
    per-row re-execution of the subquery: at 100 TB the inner table
    is scanned once."""
    from database_query_processor_spark.catalog import register_tables

    register_tables(spark, sf_dir, ("nation", "customer"))
    return spark.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name ASC LIMIT 2) t
    """)


LATERAL_TOPK_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n CROSS JOIN LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name ASC LIMIT 2) t
"""


def setops_all(spark, sf_dir):
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL): customers'
    order-month multisets for two years — ALL semantics keep duplicate
    multiplicity (a customer ordering twice in both years appears
    twice in the intersection), which the DISTINCT forms (c08/c09)
    collapse. Spark plans both as aggregate+generate over counted
    duplicates, not a join explosion."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select(
        "o_custkey", F.month("o_orderdate").alias("m")
    )
    b = o.filter(F.year("o_orderdate") == 1996).select(
        "o_custkey", F.month("o_orderdate").alias("m")
    )
    return (
        a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
        .unionByName(a.exceptAll(b).withColumn("op", F.lit("except_all")))
    )


SETOPS_ALL_SQL = """
WITH a AS (SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS m FROM orders
           WHERE year(o_orderdate) = 1995),
b AS (SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS m FROM orders
      WHERE year(o_orderdate) = 1996)
SELECT *, 'intersect_all' AS op FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
UNION ALL
SELECT *, 'except_all' AS op FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
"""


def listagg_ordered(spark, sf_dir):
    """Ordered string aggregation (LISTAGG / string_agg): nations per
    region, comma-joined in name order. Spark: collect_list →
    array_sort → array_join — collect_list's arrival order is
    nondeterministic under parallelism, so the explicit array_sort is
    what makes the result stable (and cross-engine-identical)."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


LISTAGG_SQL = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey
"""


def histogram_fixed_width(spark, sf_dir):
    """Equi-width histogram of order totals: 20 buckets spanning
    [min, max], bucket edges computed in-query (1-row min/max agg,
    broadcast). The per-row bucket id is pure arithmetic — a single
    scan + one tiny aggregate + one final count shuffle."""
    o = _t(spark, sf_dir, "orders")
    m = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    b = F.least(
        F.lit(19),
        F.floor((F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 20)),
    ).cast("long")
    return (
        o.crossJoin(F.broadcast(m))
        .select(b.alias("bucket"), "lo", "hi")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


HISTOGRAM_SQL = """
WITH m AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
SELECT CAST(least(19, floor((o_totalprice - lo) / ((hi - lo) / 20))) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM orders, m GROUP BY 1
"""


def higher_order_funcs(spark, sf_dir):
    """Higher-order array functions over per-order line-item arrays:
    transform (net value per item), filter (bulk items, qty >= 25),
    aggregate (fold the filtered values into a sum), exists (any
    high-tax item), element_at (first item by line number). The
    reference has no collection types at all (SURVEY.md §1.1); this is
    the Spark-native array/lambda surface.

    All lambda arithmetic is exact integer (cents and percent units
    extracted via the decimal contract), so every folded value is
    bit-stable. One shuffle (the collect_list groupBy); the lambdas
    evaluate inside codegen on the collected arrays — no Python, no
    re-shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    rows = li.select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber").alias("ln"),
            (dec("l_extendedprice") * 100).cast("bigint").alias("pc"),
            (dec("l_discount") * 100).cast("bigint").alias("dp"),
            F.col("l_quantity").cast("bigint").alias("qty"),
            (dec("l_tax") * 100).cast("bigint").alias("tp"),
        ).alias("s"),
    )
    arr = rows.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("s")).alias("items")
    )
    big = F.filter("items", lambda s: s.getField("qty") >= 25)
    net = F.transform(big, lambda s: s.getField("pc") * (100 - s.getField("dp")))
    return arr.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.size(big).alias("n_big"),
        F.aggregate(net, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("sum_net_units"),
        F.exists("items", lambda s: s.getField("tp") > 5).alias("has_high_tax"),
        F.element_at(F.transform("items", lambda s: s.getField("pc")), 1).alias("first_pc"),
    )


HIGHER_ORDER_SQL = """
WITH r AS (
  SELECT l_orderkey,
         struct_pack(ln := l_linenumber,
                     pc := CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT),
                     dp := CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT),
                     qty := CAST(l_quantity AS BIGINT),
                     tp := CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT)) AS s
  FROM lineitem),
a AS (SELECT l_orderkey,
             -- full-struct tiebreak: (orderkey, linenumber) is NOT
             -- unique in the synthetic data, and Spark's sort_array
             -- orders by every struct field lexicographically
             list(s ORDER BY s.ln, s.pc, s.dp, s.qty, s.tp) AS items
      FROM r GROUP BY l_orderkey)
SELECT l_orderkey,
       len(items) AS n_items,
       len(list_filter(items, s -> s.qty >= 25)) AS n_big,
       CAST(COALESCE(list_sum(list_transform(list_filter(items, s -> s.qty >= 25),
                                             s -> s.pc * (100 - s.dp))), 0) AS BIGINT)
         AS sum_net_units,
       len(list_filter(items, s -> s.tp > 5)) > 0 AS has_high_tax,
       list_transform(items, s -> s.pc)[1] AS first_pc
FROM a
"""


def regexp_extract_all_q(spark, sf_dir):
    """regexp_extract_all over the document corpus: every match of a
    word pattern per document, with counts and the distinct sorted
    match list. Pure scan-side string work — no shuffle at all; both
    engines' regex engines agree on left-to-right non-overlapping
    match semantics for this pattern."""
    d = _t(spark, sf_dir, "documents")
    matches = F.regexp_extract_all(F.col("text"), F.lit(r"\bta[a-z]+"), F.lit(0))
    return d.select(
        "doc_id",
        F.size(matches).alias("n_hits"),
        F.concat_ws(" ", F.array_sort(F.array_distinct(matches))).alias("distinct_hits"),
    )


REGEXP_ALL_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\bta[a-z]+')) AS n_hits,
       -- DuckDB's array_to_string yields NULL (not '') on an empty
       -- list; Spark's concat_ws yields '' — normalize
       COALESCE(array_to_string(list_sort(list_distinct(regexp_extract_all(text, '\bta[a-z]+'))), ' '), '')
         AS distinct_hits
FROM documents
"""



def recursive_month_spine(spark, sf_dir):
    """WITH RECURSIVE (Spark 4.0+, SPARK-24497): calendar-spine
    generation — the canonical bounded-depth recursion. An 80-row
    month spine is built by the recursive CTE itself (no table scan),
    then LEFT-joined to pre-aggregated monthly order totals with
    zero-fill, so missing months surface as explicit 0 rows.

    Scale shape: recursion depth = number of months (bounded, driver-
    side tiny); the orders aggregation is the only data-sized subtree
    (partial-agg shuffle carries one row per month), and the spine
    join broadcasts. Unbounded-depth recursion over DATA (transitive
    closure) deliberately stays the iterative operator with
    localCheckpoint (operators/corpus.py:connected_components) — a
    recursive CTE's unbounded plan growth is the wrong tool at 100 TB;
    this query covers the SQL surface itself.

    No reference analog (the reference's parser has no WITH at all,
    src/qp/parser/parser.cup)."""
    from database_query_processor_spark.catalog import register_tables

    register_tables(spark, sf_dir, ("orders",))
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01 00:00:00'
        )
        SELECT date_format(m, 'yyyy-MM') AS ym,
               COALESCE(t.n_orders, 0) AS n_orders,
               CAST(COALESCE(t.total, 0) AS DOUBLE) AS total_price
        FROM months LEFT JOIN (
          SELECT date_trunc('MONTH', o_orderdate) AS mo, COUNT(*) AS n_orders,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
          FROM orders GROUP BY 1) t ON t.mo = m
        ORDER BY ym
    """)


RECURSIVE_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT strftime(m, '%Y-%m') AS ym,
       COALESCE(t.n_orders, 0) AS n_orders,
       CAST(COALESCE(t.total, 0) AS DOUBLE) AS total_price
FROM months LEFT JOIN (
  SELECT date_trunc('month', o_orderdate) AS mo, COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders GROUP BY 1) t ON t.mo = m
ORDER BY ym
"""


def variant_shred(spark, sf_dir):
    """VARIANT (Spark 4.0): schemaless semi-structured ingestion —
    parse_json into the binary VARIANT encoding, shred typed fields
    out with variant_get, aggregate. The schemaless counterpart of
    c52's from_json (which needs the schema up front): VARIANT defers
    typing to read time while staying columnar-friendly (the
    encoding is order-preserving and prunable, unlike JSON strings
    re-parsed per access).

    A path absent from the data ('$.absent') yields NULL, counted to
    pin the missing-path semantic. avg is exact-sum-then-one-divide
    (bigint sum, single IEEE divide) rounded to 9 on both engines —
    the cross-engine hash contract."""
    e = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    absent = F.expr("variant_get(parse_json(props), '$.absent', 'string')")
    return (
        e.select("event_type", k.alias("k"), absent.alias("absent"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum("k").cast("double") / F.count("*"), 9).alias("avg_k"),
            F.count("absent").alias("n_absent"),
        )
        .orderBy("event_type")
    )


VARIANT_SHRED_SQL = """
WITH v AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS INT) AS k,
                  json_extract_string(props, '$.absent') AS absent
           FROM events)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 9) AS avg_k,
       COUNT(absent) AS n_absent
FROM v GROUP BY event_type ORDER BY event_type
"""



def pagerank_supply_graph(spark, sf_dir):
    """c63: fixed-point PageRank over the customer–supplier supply
    graph (edge = customer ordered from supplier; undirected,
    id-spaces interleaved to keep one numeric node domain). 5
    iterations, all-bigint arithmetic — integer sums are associative,
    so the unordered shuffle reduce hash-matches DuckDB exactly
    (operators/graph.py:pagerank_fixedpoint)."""
    from database_query_processor_spark.operators import graph as GR

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("id_a"),
            (F.col("l_suppkey") * 2 + 1).alias("id_b"),
        )
        .distinct()
    )
    return GR.pagerank_fixedpoint(edges)


def _pagerank_oracle():
    from database_query_processor_spark.operators import graph as GR

    return GR.sql_pagerank(
        "SELECT DISTINCT o_custkey * 2 AS id_a, l_suppkey * 2 + 1 AS id_b "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    )


def triangle_copurchase_graph(spark, sf_dir):
    """c64: triangle count + global clustering coefficient of the
    supplier co-purchase graph (edge = two suppliers sharing >= 3
    orders). Degree-ordered orientation bounds the wedge join at
    m^1.5 — the hub-proof form (operators/graph.py:triangle_count)."""
    from database_query_processor_spark.operators import graph as GR

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("id_a"), F.col("b.l_suppkey").alias("id_b")
        )
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 3)
        .select("id_a", "id_b")
    )
    return GR.triangle_count(edges)


def _triangle_oracle():
    from database_query_processor_spark.operators import graph as GR

    return GR.sql_triangle_count(
        """SELECT a.l_suppkey AS id_a, b.l_suppkey AS id_b
           FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
           JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b USING (l_orderkey)
           WHERE a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 3"""
    )


def sliding_distinct_users(spark, sf_dir):
    """c65: trailing-3-day distinct active users per day — the DAU/
    WAU-style sliding COUNT(DISTINCT) no built-in window frame
    computes scalably. A collect_set window would buffer every user
    per frame on ONE partition; instead each (day, user) pair
    EXPLODES to the 3 window-end days it contributes to and a plain
    countDistinct groupBy does the rest (the s02 sliding-window
    rewrite applied to distinct aggregation): pre-dedup to (day,
    user), 3× fan-out of the deduped pairs, one hash shuffle keyed by
    window day — fully parallel at any scale."""
    e = _t(spark, sf_dir, "events")
    daily = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    fan = daily.select(
        F.explode(
            F.array(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 1 DAY"),
                F.col("day") + F.expr("INTERVAL 2 DAY"),
            )
        ).alias("day"),
        "user_id",
    )
    days = daily.select("day").distinct()
    return (
        fan.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_active_3d"))
    )


SLIDING_DISTINCT_SQL = """
WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
x AS (SELECT day + i * INTERVAL 1 DAY AS day, user_id
      FROM d, unnest([0, 1, 2]) AS t(i)),
days AS (SELECT DISTINCT day FROM d)
SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_3d
FROM x JOIN days USING (day)
GROUP BY 1
"""


def group_ols(spark, sf_dir):
    """c66: per-group ordinary-least-squares regression of value
    against time — the regr_slope/regr_intercept/corr family as one
    map-side-combinable aggregate. All five sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT integer sums: x = epoch
    hours (BIGINT), y = value cents (DECIMAL(12,2)·100 → BIGINT), so
    the one shuffle carries six longs per group and the combination
    runs in DECIMAL(38,0) (n·Σx² and (Σx)² overflow BIGINT at sf1)
    before a fixed-order double chain, ROUND 9.

    Scale: this is THE way to do grouped regression at 100 TB — the
    alternative (per-group collect + fit) moves raw data; sufficient
    statistics shuffle O(groups) regardless of row count."""
    e = _t(spark, sf_dir, "events")
    x = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).cast("long")
    y = (dec("value") * 100).cast("long")
    d38 = "decimal(38,0)"
    # NULL x or y rows are excluded BEFORE aggregation so n counts
    # exactly the rows the sums cover — COUNT(*) over NULL-skipping
    # SUMs would silently mix inconsistent statistics (both engines
    # would agree, so the hash check could never catch it).
    # The product sums accumulate as DECIMAL(38,0): Σx² at ~2.2e11 per
    # row overflows BIGINT past ~4e7 rows per group — exactly the
    # scale this query exists for. (The per-row products themselves
    # fit a long comfortably.)
    stats = (
        e.select(F.col("event_type"), x.alias("x"), y.alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast(d38)).alias("sx"),
            F.sum(F.col("y").cast(d38)).alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
        )
    )
    n38 = F.col("n").cast(d38)
    num = (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).cast(d38)
    den = (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).cast(d38)
    deny = (n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast(d38)
    # try_divide: a degenerate group (all events in one epoch-hour →
    # den 0; constant value → deny 0) yields NULL slope/intercept/corr
    # — matching DuckDB's x/0 = NULL — instead of an ANSI
    # DIVIDE_BY_ZERO job abort.
    slope = F.try_divide(num.cast("double"), den.cast("double"))
    return stats.select(
        "event_type",
        F.col("n"),
        F.round(slope, 9).alias("slope_cents_per_hour"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            9,
        ).alias("intercept_cents"),
        F.round(
            F.try_divide(
                num.cast("double"),
                F.sqrt(den.cast("double") * deny.cast("double")),
            ),
            9,
        ).alias("corr"),
    )


GROUP_OLS_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
  FROM (SELECT event_type,
               CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS x,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        FROM events)
  WHERE x IS NOT NULL AND y IS NOT NULL
  GROUP BY event_type),
c AS (
  SELECT *,
         CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))
           - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) AS num,
         CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))
           - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS den,
         CAST(n AS DECIMAL(38,0)) * CAST(syy AS DECIMAL(38,0))
           - CAST(sy AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) AS deny
  FROM s)
SELECT event_type, n,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9)
         AS slope_cents_per_hour,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 9) AS intercept_cents,
       ROUND(CAST(num AS DOUBLE)
             / sqrt(CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 9) AS corr
FROM c
"""


SPECS = [
    QuerySpec("c66_group_ols", group_ols, GROUP_OLS_SQL,
              "per-group OLS regression + correlation via exact integer "
              "sufficient statistics (six longs per group through the one "
              "shuffle; DECIMAL(38) combination, fixed-order double chain)"),
    QuerySpec("c65_sliding_distinct", sliding_distinct_users, SLIDING_DISTINCT_SQL,
              "trailing-3-day distinct users per day: explode-to-window-"
              "ends rewrite of sliding COUNT(DISTINCT) — no global "
              "collect_set window, one hash shuffle"),
    QuerySpec("c64_triangle_count", triangle_copurchase_graph, _triangle_oracle(),
              "triangle count + global clustering coefficient: degree-"
              "ordered orientation (out-degree O(sqrt m)) caps the wedge "
              "self-join at m^1.5; all-integer counts, one final divide"),
    QuerySpec("c63_pagerank", pagerank_supply_graph, _pagerank_oracle(),
              "fixed-point PageRank on the customer-supplier graph: 5 "
              "bigint power-iteration rounds (one shuffle each, O(1) "
              "lineage via localCheckpoint), unrolled-CTE oracle"),
    QuerySpec("c61_recursive_cte", recursive_month_spine, RECURSIVE_SPINE_SQL,
              "WITH RECURSIVE month-spine generation + zero-filled monthly "
              "totals (Spark 4 recursive CTE; bounded depth, broadcast spine)"),
    QuerySpec("c62_variant_shred", variant_shred, VARIANT_SHRED_SQL,
              "VARIANT semi-structured shredding: parse_json -> variant_get "
              "typed extraction, missing-path NULL semantics, exact-sum avg"),
    QuerySpec("c59_higher_order_funcs", higher_order_funcs, HIGHER_ORDER_SQL,
              "higher-order array functions (transform/filter/aggregate/"
              "exists/element_at) over per-order item arrays, exact "
              "integer lambda math"),
    QuerySpec("c60_regexp_extract_all", regexp_extract_all_q, REGEXP_ALL_SQL,
              "regexp_extract_all: all pattern matches per document, "
              "count + distinct sorted list (scan-only, no shuffle)"),
    QuerySpec("c58_histogram_fixed_width", histogram_fixed_width, HISTOGRAM_SQL,
              "equi-width histogram with in-query bucket edges "
              "(broadcast 1-row stats, single scan + count)"),
    QuerySpec("c57_listagg_ordered", listagg_ordered, LISTAGG_SQL,
              "LISTAGG / ordered string_agg (explicit sort makes the "
              "parallel collect deterministic)"),
    QuerySpec("c56_setops_all", setops_all, SETOPS_ALL_SQL,
              "multiset INTERSECT ALL / EXCEPT ALL (duplicate-preserving "
              "set ops via counted-duplicate aggregation, no join blowup)"),
    QuerySpec("c55_lateral_topk", lateral_topk, LATERAL_TOPK_SQL,
              "correlated LATERAL subquery (top-k per outer row), "
              "decorrelated by Catalyst into a WindowGroupLimit + join"),
    QuerySpec("c53_null_safe_join", null_safe_join, NULL_SAFE_JOIN_SQL,
              "null-safe equi-join (<=> / IS NOT DISTINCT FROM) — NULL keys "
              "match, planned as a hash join not a nested loop"),
    QuerySpec("c54_posexplode_positions", token_positions, TOKEN_POSITIONS_SQL,
              "LATERAL VIEW posexplode: per-doc token first-occurrence "
              "positions (generator in scan stage, one aggregate exchange)"),
    QuerySpec("c01_agg_global", agg_global,
              "SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_partkey) AS n_parts, "
              "MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty, "
              "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price, "
              "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price "
              "FROM lineitem",
              "ungrouped COUNT/COUNT-DISTINCT/MIN/MAX/SUM/AVG (ref parses, aborts)"),
    QuerySpec("c02_tpch_q1", tpch_q1, TPCH_Q1_ORACLE,
              "TPC-H Q1: grouped 8-aggregate pricing summary", bench=True),
    QuerySpec("c03_groupby_having", groupby_having,
              "SELECT o_custkey, COUNT(*) AS n_orders, "
              "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent, "
              "MAX(o_totalprice) AS max_order "
              "FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8",
              "GROUP BY + HAVING executed for real (query8 shape)"),
    QuerySpec("c04_rollup", rollup_,
              "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
              "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price "
              "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
              "ROLLUP grouping sets"),
    QuerySpec("c05_cube", cube_,
              "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
              "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty "
              "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
              "CUBE grouping sets"),
    QuerySpec("c06_approx_count_distinct", approx_distinct,
              "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts, "
              "TRUE AS within_tol FROM lineitem GROUP BY l_returnflag",
              "HLL++ approximate distinct, self-validating: hash match certifies "
              "the sketch is within 5% of the exact count"),
    QuerySpec("c07_union_all", union_all,
              "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000.0 "
              "UNION ALL SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 1000.0",
              "UNION ALL (set-op surface the ref never built)"),
    QuerySpec("c08_intersect", intersect_,
              "SELECT c_nationkey AS nationkey FROM customer "
              "INTERSECT SELECT s_nationkey AS nationkey FROM supplier",
              "INTERSECT distinct semantics"),
    QuerySpec("c09_except", except_,
              "SELECT DISTINCT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer "
              "EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier)",
              "EXCEPT ALL + distinct"),
    QuerySpec("c10_topk", topk,
              "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
              "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25",
              "ORDER BY + LIMIT → TakeOrderedAndProject (no global sort)"),
    QuerySpec("c11_window_topk_per_group", window_topk_per_group,
              "SELECT c_nationkey, c_custkey, c_acctbal, rn FROM ("
              "SELECT c_nationkey, c_custkey, c_acctbal, ROW_NUMBER() OVER "
              "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn "
              "FROM customer) WHERE rn <= 3",
              "top-k per group via window row_number", bench=True),
    QuerySpec("c12_window_running_sum", window_running_sum,
              "SELECT o_custkey, o_orderkey, "
              "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER "
              "(PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total "
              "FROM orders",
              "cumulative window sum (exact-decimal frame)"),
    QuerySpec("c13_window_lag_lead", window_lag_lead,
              "SELECT user_id, event_id, "
              "LAG(event_id, 1) OVER w AS prev_event, LEAD(event_id, 1) OVER w AS next_event, "
              "ROW_NUMBER() OVER w AS seq FROM events "
              "WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)",
              "lag/lead/sequence windows over event stream"),
    QuerySpec("c14_semi_join", semi_join,
              "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
              "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)",
              "EXISTS → left-semi join"),
    QuerySpec("c15_anti_join", anti_join,
              "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
              "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
              "AND o_totalprice > 400000)",
              "NOT EXISTS → left-anti join (>400k orders: non-vacuous both ways)"),
    QuerySpec("c16_outer_join", outer_join,
              "SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer "
              "LEFT OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o "
              "ON c_custkey = o_custkey GROUP BY c_custkey",
              "LEFT OUTER join + null-aware count (ref: inner only; zeros observable)"),
    QuerySpec("c17_scalar_subquery", scalar_subquery,
              "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > "
              "1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)",
              "scalar subquery threshold (1.5x: inside the data domain)"),
    QuerySpec("c18_scalar_functions", scalar_functions,
              "SELECT o_orderkey, UPPER(SUBSTRING(o_orderpriority, 1, 3)) AS prio3, "
              "LENGTH(o_orderstatus) AS status_len, "
              "CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_prio, "
              "YEAR(o_orderdate) AS order_year, MONTH(o_orderdate) AS order_month, "
              "CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS price_k, "
              "CASE WHEN o_totalprice > 150000.0 THEN 'big' "
              "WHEN o_totalprice > 50000.0 THEN 'mid' ELSE 'small' END AS bucket "
              "FROM orders",
              "string/date/math/CASE scalar surface (ref has none)"),
    QuerySpec("c22_tpch_q3", tpch_q3, TPCH_Q3_ORACLE,
              "TPC-H Q3: selective dim filter + 3-way join + grouped revenue top-10",
              bench=True),
    QuerySpec("c23_tpch_q5", tpch_q5, TPCH_Q5_ORACLE,
              "TPC-H Q5: 6-way join (3 broadcast dims + fact chain) + grouped revenue",
              bench=True),
    QuerySpec("c20_grouping_sets", grouping_sets_,
              "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
              "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price "
              "FROM lineitem GROUP BY GROUPING SETS "
              "((l_returnflag, l_linestatus), (l_returnflag), ())",
              "explicit GROUPING SETS"),
    QuerySpec("c21_percentile", percentile_,
              "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, "
              "quantile_cont(l_quantity, 0.95) AS p95_qty "
              "FROM lineitem GROUP BY l_returnflag",
              "exact percentiles per group"),
    QuerySpec("c24_approx_percentile", approx_percentile_,
              "SELECT COUNT(*) AS n_rows, TRUE AS q25_ok, TRUE AS q50_ok, "
              "TRUE AS q75_ok, TRUE AS q90_ok FROM lineitem",
              "approximate percentiles via mergeable GK sketch, self-validating: "
              "hash match certifies each quantile is within ±1% rank of exact"),
    QuerySpec("c25_unpivot", unpivot_, UNPIVOT_SQL,
              "UNPIVOT/melt to long form (scan-side Expand, no shuffle)"),
    QuerySpec("c26_count_distinct_grouped", count_distinct_grouped,
              "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs, "
              "COUNT(*) AS n_orders FROM orders GROUP BY o_orderpriority",
              "grouped exact COUNT(DISTINCT) (Expand-based distinct rewrite)"),
    QuerySpec("c45_sketch_rollup", sketch_rollup,
              "SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS n_users, "
              "TRUE AS within_tol FROM events GROUP BY 1 ORDER BY 1",
              "DataSketches HLL rollup: hourly user sketches union-merged to "
              "daily distinct estimates (incremental 100 TB distinct-count "
              "pattern), self-validating vs exact within 5%"),
    QuerySpec("c46_kll_quantile_rollup", kll_quantile_rollup,
              "SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_events, "
              "TRUE AS p50_ok, TRUE AS p95_ok FROM events GROUP BY 1 ORDER BY 1",
              "DataSketches KLL rollup: hourly value sketches folded to daily "
              "p50/p95 (mergeable-quantile 100 TB pattern), self-validating "
              "within ±3% rank of exact"),
    QuerySpec("c47_window_range_frame", window_range_frame, RANGE_FRAME_SQL,
              "RANGE-framed window: 7-day trailing spend per customer "
              "(value-distance frame, not row-count)"),
    QuerySpec("c51_window_rank_family", window_rank_family, RANK_FAMILY_SQL,
              "rank / dense_rank / percent_rank / cume_dist / ntile in one "
              "window (total order via tiebreak => deterministic)"),
    QuerySpec("c52_json_extract", json_extract, JSON_EXTRACT_SQL,
              "semi-structured: typed from_json over the events props "
              "column + filter/agg on the extracted field"),
    QuerySpec("c48_theta_set_ops", theta_set_ops, THETA_SET_OPS_SQL,
              "theta-sketch set operations: audience intersection/difference "
              "estimates, self-validating vs exact set sizes"),
    QuerySpec("c27_filtered_agg", filtered_agg, FILTERED_AGG_SQL,
              "conditional aggregation (FILTER clause) in one pass"),
    QuerySpec("c19_pivot", pivot_,
              "SELECT l_returnflag, "
              "CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_open, "
              "CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_filled "
              "FROM lineitem GROUP BY l_returnflag",
              "PIVOT as conditional aggregation"),
]
