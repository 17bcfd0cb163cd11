#!/usr/bin/env python
"""Isolated per-query timing, bench-methodology-compatible (noop sink,
clearCache + System.gc barrier before every timed run, warm runs
first). Usage:

    PYTHONPATH=/root/repo python artifacts/time_isolated_r11.py x32_text_repetition [more...]
    RUNS=9 WARM=2 SF_DIR=/root/testdata/sf0.1 ... (env overrides)

Prints one line per query: min / median / raw list. For A/B work
during the r11 optimization round; the official number stays bench.py.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))
WARM = int(os.environ.get("WARM", "2"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="dqps-iso-r11", driver_memory="64g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    specs = {s.name: s for s in all_specs()}

    def barrier():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)

    for name in names:
        spec = specs[name]

        def run():
            spec.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(name)
        for _ in range(WARM):
            run()
        ts = []
        for _ in range(RUNS):
            barrier()
            t0 = time.perf_counter()
            run()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(ts)} median={statistics.median(ts)} {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
