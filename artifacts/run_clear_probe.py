#!/usr/bin/env python
"""Isolated-session timing for ONE bench query — the adjudication
tool for bench.py plan_suspects (the r8 C11_CLEAR / P11P16_CLEAR
method): a fresh Spark session, bench.py methodology (2 warm runs,
gc + cleaner-drain barrier before every timed run, noop sink), N
timed runs, ONE json line to stdout. A suspect whose ISOLATED ratio
vs its BASELINE.md row sits inside the host band is suite-context /
host noise, not a plan regression.

Usage: PYTHONPATH=/root/repo python -u artifacts/run_clear_probe.py <query> [runs]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    name = sys.argv[1]
    runs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = get_spark(
        app_name=f"clear-{name}", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spec = next(s for s in all_specs() if s.name == name)

    def _run():
        spec.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def _barrier():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)

    _barrier()
    for _ in range(2):
        _run()
    ts = []
    for _ in range(runs_n):
        _barrier()
        t0 = time.perf_counter()
        _run()
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "query": name,
        "min": round(min(ts), 3),
        "median": round(statistics.median(ts), 3),
        "runs": [round(t, 3) for t in ts],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
