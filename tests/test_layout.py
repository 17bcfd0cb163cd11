"""Physical layout: bucketed joins must be exchange-free, partitioned
reads must prune. These are the at-scale claims in SCALE.md, asserted
on real plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.plans.inspect import explain_str
from database_query_processor_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, df, mode: str = "simple") -> str:
    return explain_str(df, mode)


def test_bucketed_join_is_exchange_free(spark):
    """orders⋈lineitem both bucketed on the join key: the sort-merge
    join must consume bucket outputs directly — no Exchange on either
    side."""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"),
                   "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "t_lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(spark, j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_agg_is_exchange_free(spark):
    """groupBy on the bucket key reuses the bucket partitioning."""
    orders = load_table(spark, SF, "orders")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"),
                   "t_orders_b2", ["o_orderkey"], 8)
    try:
        agg = spark.table("t_orders_b2").groupBy("o_orderkey").agg(
            F.count("*").alias("n")
        )
        plan = _plan(spark, agg)
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b2")


def test_partitioned_read_prunes(spark, tmp_path):
    """A filter on the partition column must show up as a
    PartitionFilter and reduce the files read."""
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])
    filtered = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(spark, filtered, "formatted")
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    # pruned scan returns exactly the clicks
    n_clicks = events.filter(F.col("event_type") == "click").count()
    assert filtered.count() == n_clicks
