#!/usr/bin/env python
"""Round-7/8 scaling probe for the operators added AFTER the round-4
probes (PROBE10X/PROBE100X predate them): the full x40-x66 block,
src14-src18, t13-t18, s10-s12 — each timed at sf0.1 and sf1
(/tmp/dqps_sf1, gen_sf1.py's structure-preserving 10x), reporting the
decade growth factor and fitted exponent log10(t_sf1/t_sf0.1)
(1.0 = linear; sub-second queries carry 0.1-0.3 s fixed overhead that
deflates small-base exponents — the growth column is the signal).
Spark side only (correctness is the sweeps' job). min of 2 after 1
warm. Writes artifacts/PROBE_NEWOPS_r08.json. Run:
  PYTHONPATH=/root/repo python -u artifacts/run_probe_newops.py
"""
from __future__ import annotations

import json
import math
import os
import time

from database_query_processor_spark.session import get_spark
from database_query_processor_spark.workload import all_specs

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/dqps_sf1"
OUT = os.path.join(os.path.dirname(__file__), "PROBE_NEWOPS_r08.json")

NEW_PREFIXES = tuple(
    [f"x{i}" for i in range(40, 67)]
    + [f"src{i}" for i in range(14, 19)]
    + [f"t{i}" for i in range(13, 19)]
    + ["s10", "s11", "s12"]
)


def timed(spark, build, runs=2):
    build().write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        # drain pause: that gc triggers ContextCleaner's ASYNC
        # shuffle-file deletes — let them land outside the timed
        # window (see artifacts/BENCH_BARRIER_AB_r08.json)
        time.sleep(0.25)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def main() -> None:
    spark = get_spark(
        app_name="probe-newops", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = [
        s for s in all_specs()
        if any(s.name.startswith(p + "_") for p in NEW_PREFIXES)
    ]
    # NEWOPS_SKIP: comma list of names to skip with a note (e.g. x49 —
    # its demo cells=8 sizing makes the sf1 Spark side a ~10-minute
    # interpreted-cosine pair join; its sf1 wall is recorded by the
    # correctness sweep instead, and the production √n-cells sizing is
    # verified by run_sf1_x_specials.py). NEWOPS_MERGE: start from an
    # existing output file and only run missing names (resume).
    skip = {n for n in os.environ.get("NEWOPS_SKIP", "").split(",") if n}
    out: dict[str, dict] = {}
    if os.environ.get("NEWOPS_MERGE") and os.path.exists(OUT):
        with open(OUT) as fh:
            out = json.load(fh)
    for spec in specs:
        if spec.name in out:
            continue
        if spec.name in skip:
            out[spec.name] = {"skipped": os.environ.get(
                "NEWOPS_SKIP_NOTE", "see sweep artifact for sf1 wall")}
            print(spec.name, out[spec.name], flush=True)
            continue
        row: dict[str, float | str] = {}
        try:
            row["sf0.1"] = timed(spark, lambda: spec.build(spark, SF01))
            row["sf1"] = timed(spark, lambda: spec.build(spark, SF1))
            row["growth"] = round(row["sf1"] / row["sf0.1"], 2)
            row["exponent"] = round(math.log10(max(row["growth"], 0.01)), 2)
        except Exception as ex:  # noqa: BLE001 - probe reports, never dies
            row["error"] = f"{type(ex).__name__}: {str(ex)[:120]}"
        out[spec.name] = row
        print(spec.name, row, flush=True)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
