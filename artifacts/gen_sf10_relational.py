#!/usr/bin/env python
"""Synthesize the sf10 RELATIONAL tables (100x of /root/testdata/sf0.1)
for the round-9 fourth-decade relational spot-check (VERDICT r8 item 1):
the same deterministic key-shifted replication as artifacts/gen_sf1.py
(each copy i shifts every key domain by i * span, so referential
structure is preserved, per-key group sizes stay constant, and key
cardinality + row count scale 100x — the growth profile of a real
sf-scaled TPC-H), applied straight from sf0.1 with COPIES=100 instead
of chaining two 10x hops (one script, one source of truth; the 10x-of-
10x composition would produce the identical multiset anyway since the
per-copy shift is linear in the measured span).

nation/region stay fixed (constant-size dims in TPC-H at every sf).
events/documents/embeddings are NOT written: the five relational
shapes this decade checks (c02_tpch_q1, c22_tpch_q3, c23_tpch_q5,
c40_tpch_q18, p16_orderby) read only the TPC-H-shaped tables, and the
sf10 documents corpus has its own generator (gen_sf10.py) with
text-specific invariants.

Generation-time invariants (fail loudly, never quietly invalidate the
decade): per-table row count must be exactly COPIES * source count,
and each shifted key column's distinct count must be exactly COPIES *
the source distinct count (shift bijectivity — a span error would
alias keys across copies and silently change join fan-outs).

Output: /tmp/dqps_sf10/{customer,supplier,part,orders,lineitem,
nation,region}.parquet (regenerable scratch, never committed).
Usage: PYTHONPATH=/root/repo python artifacts/gen_sf10_relational.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from database_query_processor_spark.catalog import load_table  # noqa: E402
from database_query_processor_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/dqps_sf10"
COPIES = 100

# table -> columns sharing each key domain (gen_sf1.py's map minus the
# events domains — events is not replicated here)
KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
}

TABLES_REP = ["customer", "supplier", "part", "orders", "lineitem"]


def main() -> None:
    spark = get_spark(
        app_name="dqps-gen-sf10-relational",
        driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(DST, exist_ok=True)

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

    for table in TABLES_REP:
        df = cache.get(table) or load_table(spark, SRC, table)
        src_n = df.count()
        key_cols = [c for c in df.columns if (table, c) in shifted_cols]
        src_distinct = {
            c: df.select(c).distinct().count() for c in key_cols
        }
        rep = df.withColumn(
            "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        )
        for col in key_cols:
            rep = rep.withColumn(
                col, F.col(col) + F.col("_copy") * shifted_cols[(table, col)]
            )
        rep.drop("_copy").write.mode("overwrite").parquet(
            f"{DST}/{table}.parquet"
        )
        out = spark.read.parquet(f"{DST}/{table}.parquet")
        n = out.count()
        if n != COPIES * src_n:
            raise RuntimeError(
                f"{table}: row-count invariant broken: {n} != {COPIES} * {src_n}"
            )
        for col in key_cols:
            d = out.select(col).distinct().count()
            if d != COPIES * src_distinct[col]:
                raise RuntimeError(
                    f"{table}.{col}: key-bijectivity invariant broken: "
                    f"{d} distinct != {COPIES} * {src_distinct[col]}"
                )
        print(
            f"{table}: {n} rows ({COPIES}x{src_n}), shifted keys "
            + ", ".join(f"{c} span={shifted_cols[(table, c)]}" for c in key_cols),
            flush=True,
        )


if __name__ == "__main__":
    main()
