"""Dialect translator: unit translations + running the reference's own
testcases/*.sql verbatim against synthesized CUSTOMER/CART/CARTDETAILS/
BILL views (schema per FIXTURES.md §A.1)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from database_query_processor_spark.plans.dialect import run_reference_sql, translate

REF_TESTCASES = "/root/reference/testcases"


def test_translate_comma_and_literals():
    out = translate('SELECT t.a FROM t WHERE t.a > "5", t.b = "x y" ORDERBY t.a DESC')
    # literals stay quoted strings: the engine coerces per COLUMN
    # type, exactly like the reference's eval-time coercion — a bare
    # numeral would coerce string COLUMNS numerically instead
    assert "WHERE t.a > '5' AND t.b = 'x y'" in out
    assert "ORDER BY t.a DESC" in out


def test_translate_comma_inside_literal_not_split():
    out = translate('SELECT t.a FROM t WHERE t.name = "Smith, John", t.a > "5"')
    assert "t.name = 'Smith, John' AND t.a > '5'" in out


def test_translate_groupby_agg_alias():
    out = translate("SELECT t.g, MAX(t.v) FROM t GROUPBY t.g")
    assert "MAX(t.v) AS max_v" in out
    assert "GROUP BY t.g" in out


def _make_ref_views(spark):
    """Tiny deterministic e-commerce star schema shaped like the
    reference's .det specs (FIXTURES.md §A.1)."""
    n = 100
    base = spark.range(n).select(F.col("id").cast("int").alias("i"))
    base.select(
        F.col("i").alias("cid"),
        (F.col("i") % 2).alias("gender"),
        F.concat(F.lit("fn"), F.col("i")).alias("firstname"),
        F.concat(F.lit("ln"), F.col("i")).alias("lastname"),
        F.concat(F.lit("addr"), F.col("i")).alias("address"),
    ).createOrReplaceTempView("CUSTOMER")
    base.select(
        F.col("i").alias("cartid"),
        ((F.col("i") * 7) % n).alias("cid"),
        F.concat(F.lit("st"), F.col("i") % 4).alias("status"),
        F.lit("r").alias("remarks"),
    ).createOrReplaceTempView("CART")
    base.select(
        F.col("i").alias("iid"),
        ((F.col("i") * 3) % n).alias("cartid"),
        (F.col("i") % 50).alias("qty"),
        F.lit("r").alias("remarks"),
    ).createOrReplaceTempView("CARTDETAILS")
    base.select(
        F.col("i").alias("billid"),
        ((F.col("i") * 11) % n).alias("iid"),
        ((F.col("i") * 25) % 2500).alias("amount"),
        F.lit("r").alias("remarks"),
    ).createOrReplaceTempView("BILL")


@pytest.mark.skipif(not os.path.isdir(REF_TESTCASES), reason="reference not mounted")
def test_reference_testcases_run(spark):
    """Every testcases/query*.sql must translate and execute (incl.
    query8's aggregates, which abort in the reference itself)."""
    _make_ref_views(spark)
    files = sorted(glob.glob(f"{REF_TESTCASES}/query*.sql"))
    assert len(files) == 10
    for f in files:
        with open(f) as fh:
            ref_sql = fh.read()
        df = run_reference_sql(spark, ref_sql)
        assert df.count() >= 0, f"{os.path.basename(f)} failed"
