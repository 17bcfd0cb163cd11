#!/usr/bin/env python
"""Round-9 streaming-throughput decades (VERDICT r8 item 4): s01
(stateless tumbling window agg) and s12 (transformWithStateInPandas
value-state + event-time timers, RocksDB store) driven as REAL
Structured Streaming runs at 100k events (sf0.1), 1M events
(/tmp/dqps_sf1, gen_sf1.py) and 10M events (/tmp/dqps_sf10,
gen_events10m.py) — reporting events/second at each size and the
per-decade exponent. The S12_VARIANCE_r08 decomposition predicted
s12's ~1.7 s fixed per-run timer-batch + state-server cost amortizes
at scale, i.e. rows/s should IMPROVE with input size; this probe is
that prediction's measurement.

Timing includes the whole stream drive (readStream -> sink completion)
— that IS the streaming throughput, not a plan-only artifact. min of
3 after 1 warm, gc + cleaner-drain barrier between runs (the
BENCH_BARRIER_AB_r08 methodology).

Writes artifacts/PROBE_STREAM_r09.json. Run:
  PYTHONPATH=/root/repo python -u artifacts/run_probe_stream.py
"""
from __future__ import annotations

import json
import math
import os
import time

from database_query_processor_spark.session import get_spark
from database_query_processor_spark.workload import all_specs

SCALES = {
    "100k": ("/root/testdata/sf0.1", 100_000),
    "1M": ("/tmp/dqps_sf1", 1_000_000),
    # third decade: /tmp/dqps_sf10/events.parquet from
    # artifacts/gen_events10m.py (10x key-shifted sf1 events, same
    # event-time horizon -> 10x live state keys)
    "10M": ("/tmp/dqps_sf10", 10_000_000),
}
ROWS = ["s01_stream_tumbling", "s12_session_expiry_tws"]
OUT = os.path.join(os.path.dirname(__file__), "PROBE_STREAM_r09.json")


def timed(spark, build, runs=3):
    build().write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)  # cleaner-drain (BENCH_BARRIER_AB_r08)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def main() -> None:
    spark = get_spark(
        app_name="probe-stream", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = {s.name: s for s in all_specs()}
    out: dict[str, dict] = {}
    for name in ROWS:
        spec = specs[name]
        row: dict[str, float | dict] = {}
        for label, (sf_dir, n_events) in SCALES.items():
            wall = timed(spark, lambda: spec.build(spark, sf_dir))
            row[label] = {
                "sec": wall,
                "events_per_sec": round(n_events / wall),
            }
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
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
