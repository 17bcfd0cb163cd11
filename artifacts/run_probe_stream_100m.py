#!/usr/bin/env python
"""Round-10 FOURTH streaming decade: 100M events / 1.5M users
(/tmp/dqps_sf100, artifacts/gen_events100m.py — key-shifted x10 of
the 10M table on the same event-time horizon, so live state keys and
armed timers grow x10 again).

Rows: s01 (stateless tumbling — scan-bound control), s06
(dropDuplicates-with-watermark, parquet sink), s12 (tws ValueState +
event-time timers, parquet sink + changelog checkpointing) — s12 both
at the default 32 state partitions AND at 256, because
S12_DECOMP_r10 showed the timer-expiry sweep cost grows with
timers-PER-PARTITION: at 1.5M armed timers, 32 partitions is 47k
timers/partition (far beyond any measured-cheap cell), while 256
partitions (5.9k/part) is the configuration a cluster of this
key cardinality would actually run. SINGLE timed run per row (no
warm) — at this scale the data dwarfs startup; dd-direct MB/s
recorded per row.

Writes artifacts/PROBE_STREAM_100M_r10.json. Run on a QUIET box:
  PYTHONPATH=/root/repo python -u artifacts/run_probe_stream_100m.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SF100 = "/tmp/dqps_sf100"
N = 100_000_000
OUT = os.path.join(os.path.dirname(__file__), "PROBE_STREAM_100M_r10.json")


def _dd_mbps():
    import bench

    return bench._dd_direct_mbps(256)


def main() -> None:
    spark = get_spark(
        app_name="probe-stream-100m", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    specs = {s.name: s for s in all_specs()}
    out: dict = {}

    def row(tag: str, name: str, parts: int | None = None) -> None:
        dd = _dd_mbps()
        old = spark.conf.get("spark.sql.shuffle.partitions")
        if parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            t0 = time.perf_counter()
            specs[name].build(spark, SF100).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 2)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        out[tag] = {
            "sec": wall,
            "events_per_sec": round(N / wall),
            "dd_mbps_before": dd,
            "state_partitions": parts or int(old),
            "runs": 1,
        }
        print(f"{tag}: {wall}s dd={dd}", flush=True)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    row("s01_100M", "s01_stream_tumbling")
    row("s06_100M", "s06_stream_dedup")
    row("s12_100M_parts256", "s12_session_expiry_tws", parts=256)
    row("s12_100M_parts32", "s12_session_expiry_tws")
    out["dd_mbps_final"] = _dd_mbps()
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
