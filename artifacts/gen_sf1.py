#!/usr/bin/env python
"""Synthesize an sf1 dataset for the relational scaling probe by
deterministic 10x replication of /root/testdata/sf0.1 with key-range
offsets (referential structure preserved: each copy i shifts every
key domain by i * (max_key + 1), so orders still join their lineitems
and customers, and per-key group sizes stay constant while key
cardinality and row count scale 10x — the growth profile a real
sf-scaled TPC-H has).

nation/region stay fixed (constant-size dims in TPC-H at every sf).
documents/embeddings are NOT generated: the dedup/similarity family
has its own 10x/100x probes (artifacts/PROBE{10,100}X_r04.json) with
a hazard-controlled corpus; exact 10x text replication would instead
flood the dup detectors.

Output: /tmp/dqps_sf1/*.parquet (regenerable scratch, never
committed). Usage: python artifacts/gen_sf1.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/dqps_sf1"
COPIES = 10

# table -> columns sharing each key domain
KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "user": [("events", "user_id")],
    "event": [("events", "event_id")],
}


def main() -> None:
    spark = get_spark(
        app_name="dqps-gen-sf1",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(DST, exist_ok=True)

    # key-domain spans measured once from the source tables
    spans: dict[str, int] = {}
    cache = {}
    for dom, cols in KEY_DOMAINS.items():
        hi = 0
        for table, col in cols:
            if table not in cache:
                cache[table] = load_table(spark, SRC, table)
            hi = max(hi, cache[table].agg(F.max(col)).first()[0])
        spans[dom] = int(hi) + 1

    shifted_cols = {
        (table, col): spans[dom]
        for dom, cols in KEY_DOMAINS.items()
        for table, col in cols
    }

    for table in ["region", "nation"]:
        load_table(spark, SRC, table).write.mode("overwrite").parquet(
            f"{DST}/{table}.parquet"
        )

    for table in ["customer", "supplier", "part", "orders", "lineitem", "events"]:
        df = cache.get(table) or load_table(spark, SRC, table)
        rep = df.withColumn(
            "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        )
        for col in df.columns:
            span = shifted_cols.get((table, col))
            if span is not None:
                rep = rep.withColumn(col, F.col(col) + F.col("_copy") * span)
        rep.drop("_copy").write.mode("overwrite").parquet(
            f"{DST}/{table}.parquet"
        )
        print(f"{table}: written")

    for table in ["lineitem", "orders", "customer", "events"]:
        n = spark.read.parquet(f"{DST}/{table}.parquet").count()
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
