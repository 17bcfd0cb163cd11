"""Table catalog: parquet directories → DataFrames + temp views.

The reference resolves each FROM-list table by deserializing a
`<TABLE>.md` sidecar schema and scanning `<TABLE>.tbl`
(reference: src/qp/optimizer/RandomInitialPlan.java:76-89,
src/qp/operators/Scan.java:30-55). Parquet is self-describing, so
registration collapses to `spark.read.parquet(...)` +
`createOrReplaceTempView` — schema, statistics, and column pruning
ride the data source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as TIMESTAMP(NANOS) in the driver parquet; Spark reads
# them as long (nanosAsLong) and we convert to microsecond timestamps,
# truncating like DuckDB does (ns → us).
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one base relation (reference Scan operator,
    src/qp/operators/Scan.java:19-109 → `spark.read.parquet`)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # ns → us truncation like DuckDB; NTZ so values compare
            # naively against the oracle (session tz is UTC anyway)
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz")
            )
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every base table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
