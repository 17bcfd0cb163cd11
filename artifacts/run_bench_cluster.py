#!/usr/bin/env python
"""Round-10 one-off (VERDICT r9 item 7): the 24-query bench gate run
under BOTH local[32] (the recorded-baseline master) and
local-cluster[2,8,9216] (two real executor JVMs: netty shuffle, wire
broadcast, executor-side Python workers) in one session-pair on one
host, with per-query ratios.

Purpose: the correctness sweep has multi-executor evidence
(SWEEP_SF001_CLUSTER_r09.txt, 208/208) but the bench never has — a
query shape that secretly depends on single-JVM shared memory (e.g.
in-process broadcast reuse, local disk block manager short-circuit)
would show up as a RATIO outlier here, while a uniform ratio is just
the hardware delta (16 executor cores vs 32 local threads ~= 2x on
CPU-bound shapes, less on startup-dominated ones). The MEDIAN ratio
is the uniform band; outliers beyond 1.5x the band are listed for
explanation.

Methodology per master: 1 warm + min-of-3 per query, gc + short drain
between runs (bench.py shape, fewer reps to bound wall), dd-direct
MB/s + 32-task null-query floor recorded per master section.

Writes artifacts/BENCH_CLUSTER_r10.json. Run on a QUIET box:
  PYTHONPATH=/root/repo python -u artifacts/run_bench_cluster.py
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(__file__), "BENCH_CLUSTER_r10.json")

MASTERS = {
    "local32": {"master": "local[32]", "shuffle_partitions": 32},
    "cluster_2x8": {
        "master": "local-cluster[2,8,9216]",
        "shuffle_partitions": 16,
        "extra_conf": {
            "spark.executor.memory": "8192m",
            "spark.executorEnv.PYTHONPATH": REPO,
        },
    },
}


def _dd_mbps():
    import bench

    return bench._dd_direct_mbps(256)


def run_master(tag: str, kwargs: dict) -> dict:
    spark = get_spark(
        app_name=f"bench-{tag}", driver_memory="48g",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            **kwargs.get("extra_conf", {}),
        },
        master=kwargs["master"],
        shuffle_partitions=kwargs["shuffle_partitions"],
    )

    def _barrier():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)

    def _null() -> float:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 32_000, 1, 32).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)

    section: dict = {"master": kwargs["master"], "dd_mbps": _dd_mbps()}
    spark.range(10).count()  # spin up executors before timing anything
    section["null_query"] = _null()
    timings: dict[str, float] = {}
    for spec in [s for s in all_specs() if s.bench]:
        try:
            _barrier()
            spec.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(3):
                _barrier()
                t0 = time.perf_counter()
                spec.build(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            timings[spec.name] = round(min(runs), 3)
        except Exception as ex:
            timings[spec.name] = -1.0
            print(f"  {spec.name}: FAILED {type(ex).__name__}: {ex}", flush=True)
        print(f"  [{tag}] {spec.name}: {timings[spec.name]}s", flush=True)
    section["queries"] = timings
    section["total"] = round(sum(t for t in timings.values() if t >= 0), 3)
    spark.stop()
    return section


def main() -> None:
    out: dict = {}
    for tag, kwargs in MASTERS.items():
        out[tag] = run_master(tag, kwargs)
        print(f"{tag}: total={out[tag]['total']}s", flush=True)

    a, b = out["local32"]["queries"], out["cluster_2x8"]["queries"]
    ratios = {
        n: round(b[n] / a[n], 2)
        for n in a
        if a.get(n, 0) > 0 and b.get(n, 0) > 0
    }
    band = round(statistics.median(ratios.values()), 2)
    out["ratios_cluster_over_local"] = ratios
    out["median_ratio_band"] = band
    out["outliers_over_1p5x_band"] = sorted(
        n for n, r in ratios.items() if r > 1.5 * band
    )
    out["note"] = (
        "expected uniform band ~2x on CPU-bound shapes (16 executor "
        "cores vs 32 local threads); outliers are the single-JVM-"
        "dependence suspects to explain"
    )
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
