#!/usr/bin/env python
"""Synthesize a 100M-row events table for the round-10 streaming
probe's FOURTH decade (100k -> 1M -> 10M -> 100M): deterministic
10x replication of /tmp/dqps_sf10's events (gen_events10m.py)
with user_id/event_id shifted by the measured key-domain span
per copy — the same key-shifted replication scheme every other scale
probe in this repo uses. Timestamps are NOT shifted: the corpus keeps
the same event-time horizon, so the decade grows watermark state
(10x live keys per window / per session store) rather than stretching
the timeline — the regime a 10x-busier stream actually presents.

Output: /tmp/dqps_sf10/events.parquet (single file, because the
streaming topologies read the sf dir with pathGlobFilter =
'events.parquet' which matches FILE names). Regenerable scratch,
never committed.
Usage: PYTHONPATH=/root/repo python -u artifacts/gen_events100m.py
(requires /tmp/dqps_sf1 from gen_sf1.py)
"""
from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from database_query_processor_spark.session import get_spark  # noqa: E402

SRC = "/tmp/dqps_sf10"
DST = "/tmp/dqps_sf100"
COPIES = 10


def main() -> None:
    spark = get_spark(
        app_name="dqps-gen-events100m",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(DST, exist_ok=True)
    src = spark.read.parquet(f"{SRC}/events.parquet")
    spans = src.agg(
        (F.max("event_id") + 1).alias("event"),
        (F.max("user_id") + 1).alias("user"),
    ).first()
    rep = (
        src.withColumn(
            "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        )
        .withColumn("event_id", F.col("event_id") + F.col("_copy") * spans["event"])
        .withColumn("user_id", F.col("user_id") + F.col("_copy") * spans["user"])
        .drop("_copy")
    )
    tmp_dir = f"{DST}/_events100m_tmp"
    rep.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
    dest = f"{DST}/events.parquet"
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    elif os.path.exists(dest):
        os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp_dir)

    n = spark.read.parquet(dest).count()
    n_src = src.count()
    assert n == COPIES * n_src, (n, n_src)
    # key-shift bijectivity: distinct ids must scale exactly 10x
    d = spark.read.parquet(dest).agg(
        F.countDistinct("event_id").alias("e"),
        F.countDistinct("user_id").alias("u"),
    ).first()
    d_src = src.agg(
        F.countDistinct("event_id").alias("e"),
        F.countDistinct("user_id").alias("u"),
    ).first()
    assert d["e"] == COPIES * d_src["e"] and d["u"] == COPIES * d_src["u"], (d, d_src)
    print(f"events100m: {n} rows, {d['u']} users -> {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
