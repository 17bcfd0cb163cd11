#!/usr/bin/env python
"""Round-10 decomposition of s12's super-linear third decade (VERDICT
r9 item 1): PROBE_STREAM_r09 measured wall 9.5s -> 177.4s from 1M ->
10M events (exponent 1.27, throughput halved) and the cause was
undiagnosed. This probe decomposes the run three ways:

1. PER-BATCH StreamingQueryProgress (durationMs: addBatch /
   queryPlanning / walCommit / triggerExecution; stateOperators:
   allUpdatesTimeMs / commitTimeMs / numRowsUpdated / RocksDB custom
   metrics) at 100k / 1M / 10M — batch 0 is the data batch, batch 1+
   the timer batch(es), so the split attributes wall to data vs
   timer vs state-commit directly.

2. ISOLATING VARIANTS at 1M and 10M:
   - noop_sink: the prod topology but writeStream.format('noop') —
     removes the UPDATE-MODE MEMORY SINK's driver-side collect. The
     s12 result has ~0.95 rows per input event (954,650 sessions at
     1M; 9,546,500 at 10M — nearly every event opens a new session
     under the 30-min gap), so the memory sink materializes ~9.5M
     rows on the driver at 10M; if wall collapses here, the decade
     was sink-bound, not state-bound.
   - no_timer: same ValueState session logic, timeMode='None', no
     timer registration/firing (emits data-closed sessions only,
     ~98% of rows) — isolates the event-time timer machinery
     (per-key listTimers/deleteTimer/registerTimer state-server
     round-trips + the end-of-stream expiry sweep).
   - parts_128: prod topology at 128 shuffle/state partitions
     (vs the default 32) — state store cost scales per-partition,
     so a structural RocksDB/commit bottleneck shrinks, a
     data-volume bottleneck doesn't.

3. IO WEATHER: dd-direct MB/s before/after each scale's section
   (this host's storage is burst-throttled; BENCH_SUSPECTS_CLEAR_r09
   measured 124-233 MB/s swings), so a disk-throttle explanation is
   provable or refutable from the artifact alone.

Writes artifacts/S12_DECOMP_r10.json. Run:
  PYTHONPATH=/root/repo python -u artifacts/run_s12_decomp.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_query_processor_spark.session import get_spark  # noqa: E402
from database_query_processor_spark.streaming.stateful import (  # noqa: E402
    SESSION_GAP_US,
    TWS_SESSION_SCHEMA,
    _activate_protobuf_shim,
    _SessionExpiryProcessor,
    session_expiry_tws,
)
from database_query_processor_spark.streaming.windows import _events_stream  # noqa: E402

SCALES = {
    "100k": ("/root/testdata/sf0.1", 100_000),
    "1M": ("/tmp/dqps_sf1", 1_000_000),
    "10M": ("/tmp/dqps_sf10", 10_000_000),
}
OUT = os.path.join(os.path.dirname(__file__), "S12_DECOMP_r10.json")
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class _NoTimerSessionProcessor(_SessionExpiryProcessor):
    """s12's ValueState session logic with the timer machinery
    stripped (probe-only): same per-key sort/fold/update, but no
    listTimers/deleteTimer/registerTimer round-trips and no expiry
    sweep. Emits data-closed sessions only (~98% of s12's rows)."""

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        evts: list[int] = []
        for pdf in rows:
            if pdf.empty:
                continue
            evts.extend(
                int(t) for t in pdf["ts"].astype("datetime64[us]").astype("int64")
            )
        if not evts:
            return
        evts.sort()
        if self._sess.exists():
            start, last, n = (int(x) for x in self._sess.get())
        else:
            start, last, n = -1, -1, 0
        closed: list[tuple[int, int, int]] = []
        for t in evts:
            if n == 0:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_US:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        self._sess.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(closed),
                    "start_us": [c[0] for c in closed],
                    "end_us": [c[1] for c in closed],
                    "n": [c[2] for c in closed],
                    "closed_by": ["data"] * len(closed),
                }
            )


def no_timer_tws(stream):
    from pyspark.sql import functions as F

    _activate_protobuf_shim(stream.sparkSession)
    return (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            _NoTimerSessionProcessor(),
            outputStructType=TWS_SESSION_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def _dd_mbps() -> float | None:
    import bench

    return bench._dd_direct_mbps(256)


def _trim_progress(progresses: list[dict]) -> list[dict]:
    """Keep the fields that attribute wall time; drop the rest."""
    out = []
    for p in progresses:
        row = {
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "durationMs": p.get("durationMs"),
        }
        ops = []
        for so in p.get("stateOperators") or []:
            keep = {
                k: so.get(k)
                for k in (
                    "operatorName", "numRowsTotal", "numRowsUpdated",
                    "allUpdatesTimeMs", "numRowsRemoved",
                    "allRemovalsTimeMs", "commitTimeMs",
                    "numExpiredTimers", "timerProcessingTimeMs",
                    "memoryUsedBytes",
                )
                if k in so
            }
            cm = so.get("customMetrics") or {}
            keep["customMetrics"] = {
                k: v
                for k, v in cm.items()
                if v and (
                    "Latency" in k or "Compact" in k or "Flush" in k
                    or "BytesWritten" in k or "BytesRead" in k
                    or "PauseTime" in k or "CommitTime" in k
                    or "numExternalCol" in k
                )
            }
            ops.append(keep)
        row["stateOperators"] = ops
        out.append(row)
    return out


def drive(spark, sf_dir, transform, sink: str, tag: str) -> dict:
    """One synchronous streaming run; returns wall + trimmed per-batch
    progress. Fresh memory-sink name per tag; RocksDB provider set for
    the run (transformWithState requires it)."""
    conf = spark.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    old = conf.get(key, None)
    conf.set(key, ROCKSDB)
    try:
        stream = _events_stream(spark, sf_dir)
        out = transform(stream)
        name = f"dqps_decomp_{tag}"
        spark.catalog.dropTempView(name)
        t0 = time.perf_counter()
        w = out.writeStream.outputMode("update")
        if sink == "memory":
            q = w.format("memory").queryName(name).start()
        else:
            q = w.format("noop").start()
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
        app_name="s12-decomp", driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out: dict = {"variants": {}}

    # 1) prod decomposition at three scales, per-batch metrics
    for label, (sf_dir, n) in SCALES.items():
        dd0 = _dd_mbps()
        row = drive(spark, sf_dir, session_expiry_tws, "memory", f"prod_{label}")
        row["events"] = n
        row["events_per_sec"] = round(n / row["wall_sec"])
        row["dd_mbps_before"] = dd0
        out["variants"][f"prod_{label}"] = row
        print(f"prod_{label}: wall={row['wall_sec']}s dd={dd0}", flush=True)

    # 2) isolating variants at 1M and 10M
    for label in ("1M", "10M"):
        sf_dir, n = SCALES[label]
        for tag, transform, sink, extra in (
            ("noop_sink", session_expiry_tws, "noop", None),
            ("no_timer", no_timer_tws, "memory", None),
            ("parts_128", session_expiry_tws, "memory", 128),
        ):
            old_parts = spark.conf.get("spark.sql.shuffle.partitions")
            if extra:
                spark.conf.set("spark.sql.shuffle.partitions", str(extra))
            try:
                row = drive(spark, sf_dir, transform, sink, f"{tag}_{label}")
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old_parts)
            row["events"] = n
            row["events_per_sec"] = round(n / row["wall_sec"])
            out["variants"][f"{tag}_{label}"] = row
            print(f"{tag}_{label}: wall={row['wall_sec']}s", flush=True)

    out["dd_mbps_final"] = _dd_mbps()
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
