"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full declared workload (see
database_query_processor_spark/workload/ — one QuerySpec per
capability in SURVEY.md §2 + completions + extensions). The driver
runs each Spark query against its DuckDB oracle at sf0.01 and
hash-compares (row count + schema + order-insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from database_query_processor_spark.workload import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 4-way join + range
    band + ORDER BY (reference testcases/query10.sql shape)."""
    from pyspark.sql import functions as F

    from database_query_processor_spark.workload.parity import join4_band

    return join4_band(spark, "/root/testdata/sf0.001").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {spec.name: spec.build for spec in all_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    non-SQL-expressible ops — driver records rows-only checks there)."""
    return {spec.name: spec.oracle for spec in all_specs() if spec.oracle is not None}
