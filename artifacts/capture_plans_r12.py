#!/usr/bin/env python
"""Capture .explain("formatted") for queries into
plans/r12/<query>_<tag>.txt (tag = before/after). Usage:

    PYTHONPATH=/root/repo python artifacts/capture_plans_r12.py before [names...]

With no names, captures all bench-flagged specs; with explicit names,
captures exactly those (bench-flagged or not — r12 touches operators
whose consumers are declared-but-not-benched, e.g. x18/x42/x45).
Streaming builds (s12) execute the stream as part of build(); their
committed-result read-back plan is what gets captured.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = set(sys.argv[2:])
    out_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dqps-plans-r12",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    if names:
        specs = [s for s in all_specs() if s.name in names]
    else:
        specs = [s for s in all_specs() if s.bench]
    for spec in specs:
        try:
            df = spec.build(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(ex).__name__}: {ex}"
        path = os.path.join(out_dir, f"{spec.name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {spec.name} ({tag}, sf_dir={SF_DIR}) ==\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
