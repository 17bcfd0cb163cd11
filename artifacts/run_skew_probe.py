#!/usr/bin/env python
"""Round-9 planted-skew evidence at sf1 scale (VERDICT r8 item 7):
p18's salted join and AQE's skew-join split are plan-gated but were
never MEASURED against a genuinely skewed key. This probe plants a
pathological zipf-ish fact table (20M rows, 50% of them on ONE hot
customer key, power-tail over the rest of the sf1 customer domain),
runs the p18 aggregate shape under four strategies, and records which
wins:

  * broadcast   — the realistic default: the 150k-row dim broadcasts,
                  no shuffle of the fact on the join key at all, skew
                  moot. Recorded as the reference regime; the other
                  rows simulate the 100 TB case where the dim side is
                  too big to broadcast (autoBroadcastJoinThreshold=-1).
  * plain       — shuffle join, AQE skew split OFF: the hot key pins
                  one reducer with 10M rows (the pathology).
  * aqe_skew    — shuffle join, AQE skew split ON with thresholds
                  lowered so the ~hot partition qualifies (defaults
                  need 256MB partitions; local-scale partitions are
                  smaller). AQE splits the hot partition by matching
                  each split against the FULL build side — no
                  semantic change, works for sort-merge joins.
  * salted_8/32 — operators/relational.salted_join: deterministic
                  row-hash salt on the fact, dim replicated
                  num_salts x, join on (key, salt).

All four produce the identical 5-row aggregate (asserted). min of 3
timed after 1 warm, gc + cleaner-drain barrier between runs. Writes
artifacts/SKEW_PROBE_r09.json; tests/test_skew.py pins the winning
shape. Fact data: /tmp/dqps_skew/fact.parquet (regenerable scratch,
deterministic id-hash keys — no RNG).
Usage: PYTHONPATH=/root/repo python -u artifacts/run_skew_probe.py
"""
from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators.relational import salted_join
from database_query_processor_spark.session import get_spark

SF1 = "/tmp/dqps_sf1"
SCRATCH = "/tmp/dqps_skew"
N_FACT = 20_000_000
HOT_KEY = 7  # must exist in the sf1 customer key domain
OUT = os.path.join(os.path.dirname(__file__), "SKEW_PROBE_r09.json")


def gen_fact(spark) -> None:
    """50% of rows on HOT_KEY, the rest spread by hash over the sf1
    customer domain (150k keys) — deterministic in id, no RNG."""
    span = load_table(spark, SF1, "customer").agg(
        F.max("c_custkey")
    ).first()[0]
    fact = spark.range(N_FACT).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(int(span))) + 1)
        .alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0).alias("value"),
    )
    fact.write.mode("overwrite").parquet(f"{SCRATCH}/fact.parquet")


def agg_shape(joined):
    from database_query_processor_spark.operators.aggregates import dec

    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


def timed(spark, build, runs=3):
    build().write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)  # cleaner drain (BENCH_BARRIER_AB_r08)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def main() -> None:
    spark = get_spark(
        app_name="skew-probe", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if not os.path.isdir(f"{SCRATCH}/fact.parquet"):
        gen_fact(spark)
    fact = spark.read.parquet(f"{SCRATCH}/fact.parquet")
    dim = load_table(spark, SF1, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    conf = spark.conf

    def plain():
        return agg_shape(fact.join(dim, ["user_id"]))

    def salted(n):
        return agg_shape(salted_join(fact, dim, on=["user_id"], num_salts=n))

    # identical results across strategies (cheap: 5-row aggregates)
    base = sorted(map(tuple, plain().collect()))
    assert sorted(map(tuple, salted(8).collect())) == base

    out: dict[str, dict] = {"config": {
        "n_fact": N_FACT, "hot_key_share": 0.5,
        "dim_rows": dim.count(), "shuffle_partitions":
        conf.get("spark.sql.shuffle.partitions"),
    }}

    def run(label, build, **cfg):
        saved = {k: conf.get(k) for k in cfg}
        for k, v in cfg.items():
            conf.set(k, v)
        try:
            plan = build()._jdf.queryExecution().executedPlan().toString()
            row = {"sec": timed(spark, build)}
            row["joins"] = [
                kind for kind in ("BroadcastHashJoin", "SortMergeJoin",
                                  "ShuffledHashJoin")
                if kind in plan
            ]
            out[label] = row
            print(label, row, flush=True)
        finally:
            for k, v in saved.items():
                conf.set(k, v)

    run("broadcast", plain)  # session default: 64MB threshold, dim broadcasts
    NOB = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    run("plain_skew_off", plain, **NOB,
        **{"spark.sql.adaptive.skewJoin.enabled": "false"})
    run("aqe_skew", plain, **NOB, **{
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    })
    run("salted_8", lambda: salted(8), **NOB,
        **{"spark.sql.adaptive.skewJoin.enabled": "false"})
    run("salted_32", lambda: salted(32), **NOB,
        **{"spark.sql.adaptive.skewJoin.enabled": "false"})

    ranked = sorted(
        (k for k in out if k not in ("config", "broadcast")),
        key=lambda k: out[k]["sec"],
    )
    out["winner_non_broadcast"] = ranked[0]
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("winner (non-broadcast regime):", ranked[0], flush=True)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
