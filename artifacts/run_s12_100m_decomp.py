#!/usr/bin/env python
"""Decompose s12's FOURTH decade (100M events / 1.5M keys). The r10
probe measured 440s at the DEFAULT 32 state partitions (10.4x the
10M wall for 10x data — near-linear, throughput constant at ~227k
events/s) vs 1086s at 256 partitions (8 task waves x per-store fixed
cost on a throttled-disk window: dd 238 vs 722 MB/s) — partition
count should track executor count, not key count, until
timers/partition leaves the cheap regime. This decomposition runs
the production topology (parquet sink + changelog checkpointing) at
32 partitions with per-batch StreamingQueryProgress to attribute the
linear-decade wall.

Appends "decomp_100M" to artifacts/PROBE_STREAM_100M_r10.json.
Run on a QUIET box:
  PYTHONPATH=/root/repo python -u artifacts/run_s12_100m_decomp.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_query_processor_spark.session import get_spark  # noqa: E402
from run_s12_decomp import _dd_mbps  # noqa: E402
from run_s12_postfix import drive_parquet  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "PROBE_STREAM_100M_r10.json")


def main() -> None:
    spark = get_spark(
        app_name="s12-100m-decomp", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ck = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(ck, "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    dd = _dd_mbps()
    row = drive_parquet(spark, "/tmp/dqps_sf100", "decomp100m")
    row.update(events=100_000_000, dd_mbps_before=dd, state_partitions=32,
               dd_mbps_after=_dd_mbps())
    d = json.load(open(OUT))
    d["decomp_100M"] = row
    json.dump(d, open(OUT, "w"), indent=1)
    print("decomp_100M:", row["wall_sec"], "s — appended to", OUT, flush=True)


if __name__ == "__main__":
    main()
