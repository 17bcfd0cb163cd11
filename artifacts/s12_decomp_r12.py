#!/usr/bin/env python
"""r12 s12 decomposition: where do the ~6.8 s of one bench run go, and
which honest knob moves them. Variants (each = one full cold topology
run, matching the bench's per-run shape, min-of-N wall):

  A prod          — current code path exactly
  B parts_N       — state partition count derived from input size
                    (spark.sql.shuffle.partitions for the stream only)
  C changelog     — RocksDB changelog checkpointing on (r10 said 2x
                    worse at 100k; re-check on this host)
  D unload_off    — keep loaded state store instances across batches
                    (spark.sql.streaming.stateStore.unloadOnCommit off
                    is already default; probe maintenance shutdown)

Per-run: wall + per-batch durationMs + state operator commit metrics.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_query_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "3"))


def one_run(spark, conf_overrides):
    from database_query_processor_spark.streaming.stateful import (
        run_session_expiry_stream,
    )

    saved = {}
    for k, v in conf_overrides.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        t0 = time.perf_counter()
        df = run_session_expiry_stream(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        return {"stream_s": round(t1 - t0, 3), "readback_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3)}
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def main():
    spark = get_spark(app_name="s12-decomp-r12", driver_memory="16g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    variants = {
        "A_prod": {},
        "B_parts8": {"spark.sql.shuffle.partitions": "8"},
        "B_parts4": {"spark.sql.shuffle.partitions": "4"},
        "B_parts16": {"spark.sql.shuffle.partitions": "16"},
        "C_changelog": {
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled": "true"
        },
        "B8_C": {
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled": "true",
        },
    }
    out = {}
    # interleave variants round-robin so host drift hits all equally
    for r in range(RUNS):
        for name, conf in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
            res = one_run(spark, conf)
            out.setdefault(name, []).append(res)
            print(f"run{r} {name}: {res}", file=sys.stderr)
    summary = {
        name: {
            "min_total": min(r["total_s"] for r in rs),
            "min_stream": min(r["stream_s"] for r in rs),
            "min_readback": min(r["readback_s"] for r in rs),
            "runs": rs,
        }
        for name, rs in out.items()
    }
    path = os.path.join(REPO, "artifacts", "S12_DECOMP_r12.json")
    with open(path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["min_total"] for k, v in summary.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
