#!/usr/bin/env python
"""r11 all-queries plan audit: build every non-streaming declared query
at sf0.01 and flag scale-killer plan nodes — CartesianProduct,
non-broadcast nested-loop joins, Python evaluation nodes
(BatchEvalPython / ArrowEvalPython / FlatMapGroupsInPandas outside the
declared Arrow sites), SortAggregate fallbacks, and the exchange count.
Output: artifacts/PLAN_AUDIT_r11.json (one row per query) + a summary
of anything suspicious to stderr.

The s-family is excluded because spec.build() for streaming queries
EXECUTES the stream to completion (their plan story is the write-side
frames in PLANS.md); their processors were audited by hand this round.
"""
from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_query_processor_spark.plans.inspect import explain_str  # noqa: E402
from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

# Arrow boundary sites that are DECLARED (codec/state work that must
# cross into Python by design): multimodal decode, TWS processors.
PYTHON_OK = {"x12_", "x14_", "x15_", "x16_"}


def main() -> None:
    spark = get_spark(app_name="dqps-plan-audit-r11", driver_memory="16g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    rows = {}
    suspects = []
    for spec in all_specs():
        if spec.name.startswith("s") and spec.name[1].isdigit():
            rows[spec.name] = {"skipped": "streaming (build executes)"}
            continue
        try:
            df = spec.build(spark, SF_DIR)
            plan = explain_str(df, "simple")
        except Exception as ex:
            rows[spec.name] = {"error": f"{type(ex).__name__}: {ex}"}
            suspects.append((spec.name, "BUILD ERROR"))
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            flags.append("BatchEvalPython")
        py_nodes = re.findall(r"(ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|PythonMapInArrow)", plan)
        if py_nodes and not any(spec.name.startswith(p) for p in PYTHON_OK):
            flags.append("python:" + "+".join(sorted(set(py_nodes))))
        if "SortAggregate" in plan:
            flags.append("SortAggregate")
        bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        rows[spec.name] = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "bnlj": bnlj,
            "flags": flags,
        }
        if flags:
            suspects.append((spec.name, ",".join(flags)))
    out = os.path.join(REPO, "artifacts", "PLAN_AUDIT_r11.json")
    with open(out, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "queries": rows}, fh, indent=1, sort_keys=True)
    print(f"audited {len(rows)} queries -> {out}", file=sys.stderr)
    for name, why in suspects:
        print(f"  SUSPECT {name}: {why}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
