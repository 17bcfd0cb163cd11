"""Physical data layout: bucketing and partitioned writes.

The reference has one layout — a heap file of serialized tuples per
table (src/qp/operators/Scan.java:30-55); every join re-reads and
re-materializes (NestedJoin.java:69-93). At 100 TB, layout IS the
optimization:

  * **Bucketing** pre-shuffles a table ONCE at write time into N
    hash-buckets on the join/agg key. Two tables bucketed the same way
    join with ZERO exchange — the per-query shuffle the reference pays
    on every join disappears into the write. Use for fact tables
    joined repeatedly on the same key (orders⋈lineitem on orderkey).
  * **Partitioned writes** (`partitionBy`) turn predicates on the
    partition column into directory pruning — a filtered scan never
    opens non-matching files. Use for low-cardinality scan keys
    (date, event_type, ivf cell).

Both are asserted shuffle-free / pruned in tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Write as a bucketed (optionally sorted) catalog table. Joins and
    aggregations on bucket_cols against an equally-bucketed table run
    exchange-free; sortBy additionally removes the per-task sort for
    sort-merge joins."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Directory-partitioned parquet: predicates on partition_cols
    become PartitionFilters (pruning at file-listing time, before any
    I/O)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
