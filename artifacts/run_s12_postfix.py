#!/usr/bin/env python
"""Post-fix follow-up to run_s12_decomp.py: per-batch decomposition of
s12's PRODUCTION topology as of round 10 (distributed parquet file
sink + first-seen-key listTimers skip), plus two targeted probes:

- parts64_parquet_10M: the timers-per-partition QUADRATIC model test.
  The r10 decomposition measured per-timer cost 0.17ms @470/part,
  0.41ms @4700/part, 0.13ms @1170/part (128 parts). If the expiry
  sweep has a per-partition ~k^2 term, then at 64 partitions
  (2344 timers/part, 2 task waves on 32 cores) the timer batch
  should land at roughly HALF the 32-partition wall. A confirmed
  lever means cluster-scale partition counts keep the sweep cheap.

- changelog_10M: RocksDB changelog checkpointing enabled (the
  SCALE.md-recommended production knob) — records what it does to
  commit latency on this topology.

Appends a "postfix" section to artifacts/S12_DECOMP_r10.json.
Run on a QUIET box:
  PYTHONPATH=/root/repo python -u artifacts/run_s12_postfix.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.streaming.stateful import (  # noqa: E402
    session_expiry_tws,
)
from database_query_processor_spark.streaming.windows import _events_stream  # noqa: E402
from run_s12_decomp import _dd_mbps, _trim_progress  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "S12_DECOMP_r10.json")
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
SCALES = {"1M": ("/tmp/dqps_sf1", 1_000_000), "10M": ("/tmp/dqps_sf10", 10_000_000)}


def drive_parquet(spark, sf_dir: str, tag: str) -> dict:
    conf = spark.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    old = conf.get(key, None)
    conf.set(key, ROCKSDB)
    try:
        stream = _events_stream(spark, sf_dir)
        out = session_expiry_tws(stream)
        root = tempfile.mkdtemp(prefix=f"dqps_postfix_{tag}_")
        t0 = time.perf_counter()
        q = (
            out.writeStream.outputMode("append").format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            wall = round(time.perf_counter() - t0, 2)
            prog = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
        return {"wall_sec": wall, "batches": _trim_progress(prog)}
    finally:
        if old is None:
            conf.unset(key)
        else:
            conf.set(key, old)


def main() -> None:
    spark = get_spark(
        app_name="s12-postfix", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    post: dict = {}
    for label, (sf_dir, n) in SCALES.items():
        dd = _dd_mbps()
        row = drive_parquet(spark, sf_dir, f"prod_{label}")
        row.update(events=n, events_per_sec=round(n / row["wall_sec"]),
                   dd_mbps_before=dd)
        post[f"parquet_prod_{label}"] = row
        print(f"parquet_prod_{label}: {row['wall_sec']}s dd={dd}", flush=True)

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        row = drive_parquet(spark, "/tmp/dqps_sf10", "parts64")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    row["events"] = 10_000_000
    post["parts64_parquet_10M"] = row
    print(f"parts64_parquet_10M: {row['wall_sec']}s", flush=True)

    ck = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    spark.conf.set(ck, "true")
    try:
        row = drive_parquet(spark, "/tmp/dqps_sf10", "changelog")
    finally:
        spark.conf.unset(ck)
    row["events"] = 10_000_000
    post["changelog_10M"] = row
    print(f"changelog_10M: {row['wall_sec']}s", flush=True)

    post["dd_mbps_final"] = _dd_mbps()
    d = json.load(open(OUT))
    d["postfix"] = post
    json.dump(d, open(OUT, "w"), indent=1)
    print("appended postfix section to", OUT, flush=True)


if __name__ == "__main__":
    main()
