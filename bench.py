#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced to full materialization with a noop sink (no
driver collect — the sink write exercises the whole distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

from database_query_processor_spark.session import get_spark
from database_query_processor_spark.workload import all_specs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="dqps-bench", driver_memory="64g")

    specs = [s for s in all_specs() if s.bench]
    timings: dict[str, float] = {}
    for spec in specs:
        try:
            df = spec.build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm (JIT/codegen/cache)
            runs = []
            for _ in range(3):  # median-of-3: JVM/GC noise dominates at this scale
                t0 = time.perf_counter()
                spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[spec.name] = round(sorted(runs)[1], 3)
            print(f"  {spec.name}: {timings[spec.name]}s {[round(r,2) for r in runs]}", file=sys.stderr)
        except Exception as ex:  # one broken query must not zero the whole bench
            timings[spec.name] = -1.0
            print(f"  {spec.name}: FAILED {type(ex).__name__}: {ex}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(t for t in timings.values() if t >= 0), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
