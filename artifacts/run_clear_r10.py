#!/usr/bin/env python
"""Round-10 formal adjudication (VERDICT r9 item 2) of the DRIVER's
r09 bench plan_suspects [p15_distinct, t03_sessionize] with the
established methodology (BENCH_SUSPECTS_CLEAR_r09): isolated
fresh-session min-of-9 per suspect + min-of-5 for never-flagged
reference queries, a two-parameter host model iso_min = m*baseline + a
least-squares fitted on the REFERENCES ONLY, and the suspects judged
by whether their residuals sit inside the reference residual spread.
io weather (dd-direct MB/s + 32-task null-query floor) recorded so
the additive term has an independent anchor.

Both suspects are sub-0.7s queries whose r09 normalized ratios
(1.35/1.37) are the classic tiny-baseline additive-cost signature;
this artifact replaces that reasoning with measurement.

Writes artifacts/SUSPECTS_CLEAR_r10.json. Run on a QUIET box:
  PYTHONPATH=/root/repo python -u artifacts/run_clear_r10.py
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
OUT = os.path.join(os.path.dirname(__file__), "SUSPECTS_CLEAR_r10.json")

SUSPECTS = ["p15_distinct", "t03_sessionize"]
# never-flagged references spanning the baseline-time range
# (tiny -> multi-second), same set shape as BENCH_SUSPECTS_CLEAR_r09
REFERENCES = [
    "c11_window_topk_per_group",
    "c29_tpch_q6",
    "p16_orderby",
    "t01_asof_join",
    "c02_tpch_q1",
    "p10_join3",
    "c23_tpch_q5",
    "x02_dedup_minhash",
    "x33_boilerplate_ngrams",
    "t05_rollup_gapfill",
]


def _baselines() -> dict[str, float]:
    sys.path.insert(0, REPO)
    import bench

    return bench._baseline_mins(os.path.join(REPO, "BASELINE.md"))


def _dd_mbps():
    import bench

    return bench._dd_direct_mbps(256)


def main() -> None:
    spark = get_spark(
        app_name="clear-r10", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = {s.name: s for s in all_specs()}
    base = _baselines()

    def _barrier():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)

    def probe(name: str, runs_n: int) -> dict:
        spec = specs[name]

        def _run():
            spec.build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()

        _barrier()
        for _ in range(2):
            _run()
        ts = []
        for _ in range(runs_n):
            _barrier()
            t0 = time.perf_counter()
            _run()
            ts.append(time.perf_counter() - t0)
        return {
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "runs": [round(t, 3) for t in ts],
            "baseline": base.get(name),
        }

    out: dict = {"dd_mbps_start": _dd_mbps()}
    t0 = time.perf_counter()
    spark.range(0, 32_000, 1, 32).write.format("noop").mode("overwrite").save()
    nq = []
    for _ in range(3):
        _barrier()
        t0 = time.perf_counter()
        spark.range(0, 32_000, 1, 32).write.format("noop").mode(
            "overwrite"
        ).save()
        nq.append(time.perf_counter() - t0)
    out["null_query"] = round(min(nq), 3)

    out["references"] = {}
    for name in REFERENCES:
        out["references"][name] = probe(name, 5)
        print(name, out["references"][name]["min"], flush=True)
    out["suspects"] = {}
    for name in SUSPECTS:
        out["suspects"][name] = probe(name, 9)
        print(name, out["suspects"][name]["min"], flush=True)
    out["dd_mbps_end"] = _dd_mbps()

    # two-parameter host model iso_min = m*baseline + a, least squares
    # on references only
    pts = [
        (r["baseline"], r["min"])
        for r in out["references"].values()
        if r["baseline"]
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - m * sx) / n
    ybar = sy / n
    ss_res = sum((y - (m * x + a)) ** 2 for x, y in pts)
    ss_tot = sum((y - ybar) ** 2 for _, y in pts)
    out["host_model"] = {
        "m": round(m, 3),
        "a_sec": round(a, 3),
        "r2_refs": round(1 - ss_res / ss_tot, 3) if ss_tot else None,
    }

    def residual_pct(row) -> float:
        pred = m * row["baseline"] + a
        return round(100 * (row["min"] - pred) / pred, 1)

    ref_res = sorted(residual_pct(r) for r in out["references"].values())
    out["reference_residual_spread_pct"] = [ref_res[0], ref_res[-1]]
    out["suspect_residuals_pct"] = {
        name: residual_pct(r) for name, r in out["suspects"].items()
    }
    out["verdict"] = {
        name: (
            "CLEARED (inside reference residual spread)"
            if ref_res[0] <= res <= ref_res[-1]
            else "NOT CLEARED — investigate plan"
        )
        for name, res in out["suspect_residuals_pct"].items()
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in (
        "host_model", "reference_residual_spread_pct",
        "suspect_residuals_pct", "verdict", "null_query",
    )}, indent=1), flush=True)
    print("wrote", OUT, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
