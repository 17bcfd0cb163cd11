#!/usr/bin/env python
"""Relational scaling probe: the c/p/t-family bench queries measured
at sf0.01 / sf0.1 / sf1 (the sf1 set synthesized by gen_sf1.py —
10x key-shifted replication, constant per-key group sizes). Reports
per-decade growth factors and the fitted scaling exponent
log10(t_sf1 / t_sf0.1): 1.0 = linear, ~1.15 covers n·log n at these
sizes, 2.0 = quadratic blow-up.

Sub-second queries at small sf are dominated by fixed per-query
overhead (plan + task launch ~0.1-0.3 s on local[32]), which DEFLATES
exponents measured from a small base — the honest signal is the
sf0.1 -> sf1 decade. Usage:
  PYTHONPATH=/root/repo python artifacts/run_sf1_scaling.py
"""

from __future__ import annotations

import json
import math
import os
import time

from database_query_processor_spark.session import get_spark
from database_query_processor_spark.workload import all_specs

SCALES = [
    ("0.01", "/root/testdata/sf0.01", 3),
    ("0.1", "/root/testdata/sf0.1", 3),
    ("1", "/tmp/dqps_sf1", 3),
]
FAMILIES = ("c", "p", "t", "x", "s")  # r6: x-family joins; r7: s12 (first bench-gated streaming query)


def main() -> None:
    spark = get_spark(
        app_name="dqps-sf1-scaling",
        driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = [
        s for s in all_specs() if s.bench and s.name[0] in FAMILIES
    ]
    def _gc_barrier() -> None:
        # Same barrier bench.py runs before every timed run (see its
        # module docstring + artifacts/BENCH_BARRIER_AB_r08.json): the
        # gc keeps earlier runs' garbage out of the next timed window,
        # and the drain pause lets ContextCleaner's ASYNC shuffle-file
        # deletes (which that very gc triggers) finish OUTSIDE it.
        # Without this, the first r08 probe pass inflated the sf1 rows
        # of the shuffle-heaviest specs up to 5x (x40 9.9s in-suite vs
        # 1.9-2.6s isolated; c40 10.6 vs 5.6-6.7).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)

    out: dict[str, dict] = {}
    for spec in specs:
        row: dict[str, float] = {}
        for sf, path, runs in SCALES:
            try:
                _gc_barrier()
                df = spec.build(spark, path)
                df.write.format("noop").mode("overwrite").save()  # warm
                ts = []
                for _ in range(runs):
                    _gc_barrier()
                    t0 = time.perf_counter()
                    spec.build(spark, path).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    ts.append(time.perf_counter() - t0)
                row[sf] = round(min(ts), 3)
            except Exception as ex:
                row[sf] = -1.0
                print(f"  {spec.name}@{sf}: FAILED {type(ex).__name__}: {ex}")
        if row.get("0.1", -1) > 0 and row.get("1", -1) > 0:
            row["growth_01_to_1"] = round(row["1"] / row["0.1"], 2)
            row["exponent"] = round(math.log10(row["1"] / row["0.1"]), 2)
        out[spec.name] = row
        print(spec.name, row)
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SCALING_SF1_r08.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print("written", dest)


if __name__ == "__main__":
    main()
