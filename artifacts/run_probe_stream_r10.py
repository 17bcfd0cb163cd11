#!/usr/bin/env python
"""Round-10 streaming-throughput decades (VERDICT r9 item 4): extend
the scale evidence beyond s01/s12 to the two stateful-JOIN shapes —
s05 (stream-stream interval join: purchases x clicks within 1h, both
sides stateful with watermark-bounded buffers) and s06
(dropDuplicates-with-watermark) — at 100k / 1M / 10M events, plus a
re-measure of s12 after the round-10 change so PROBE_STREAM_r10
carries the post-fix decade next to PROBE_STREAM_r09's pre-fix one.

Methodology = run_probe_stream.py (r9): whole-stream drive timing,
1 warm + min-of-N (N=3 at 100k/1M, N=2 at 10M to bound wall), gc +
drain barrier between runs. dd-direct MB/s recorded per scale
section (burst-throttled host storage, BENCH_SUSPECTS_CLEAR_r09).

Writes artifacts/PROBE_STREAM_r10.json. Run on a QUIET box:
  PYTHONPATH=/root/repo python -u artifacts/run_probe_stream_r10.py
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SCALES = {
    "100k": ("/root/testdata/sf0.1", 100_000, 3),
    "1M": ("/tmp/dqps_sf1", 1_000_000, 3),
    "10M": ("/tmp/dqps_sf10", 10_000_000, 2),
}
ROWS = [
    "s05_stream_stream_join",
    "s06_stream_dedup",
    "s12_session_expiry_tws",
]
OUT = os.path.join(os.path.dirname(__file__), "PROBE_STREAM_r10.json")


def _dd_mbps() -> float | None:
    import bench

    return bench._dd_direct_mbps(256)


def timed(spark, build, runs: int) -> float:
    build().write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def main() -> None:
    spark = get_spark(
        app_name="probe-stream-r10", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = {s.name: s for s in all_specs()}
    out: dict[str, dict] = {}
    for name in ROWS:
        spec = specs[name]
        row: dict[str, float | dict] = {}
        for label, (sf_dir, n_events, runs) in SCALES.items():
            dd = _dd_mbps()
            wall = timed(spark, lambda: spec.build(spark, sf_dir), runs)
            row[label] = {
                "sec": wall,
                "events_per_sec": round(n_events / wall),
                "dd_mbps_before": dd,
                "runs": runs,
            }
            print(f"{name} {label}: {wall}s dd={dd}", flush=True)
        labels = list(SCALES)
        for lo, hi in zip(labels, labels[1:]):
            growth = round(row[hi]["sec"] / row[lo]["sec"], 2)
            row[f"growth_{hi}_vs_{lo}"] = growth
            row[f"exponent_{hi}_vs_{lo}"] = round(
                math.log10(max(growth, 0.01)), 2
            )
            row[f"throughput_ratio_{hi}_vs_{lo}"] = round(
                row[hi]["events_per_sec"] / row[lo]["events_per_sec"], 2
            )
        out[name] = row
        print(name, row, flush=True)
        with open(OUT, "w") as fh:  # checkpoint per row: partial > lost
            json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
