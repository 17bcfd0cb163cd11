"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (batch-only single pass,
src/QueryMain.java:162-194); this is the extension surface for
operators Spark's built-in windowed aggregations can't express —
arbitrary per-key state machines (user profiles, fraud counters,
cross-event feature extraction).

The demo operator keeps a per-user running profile (event count,
first/last event time) in explicit GroupState, emitting the updated
profile per key per micro-batch. Scale design: state lives in the
executor state store keyed by user_id (shuffle key), so throughput
scales with executors and state size with distinct keys — at 100 TB
the knobs are the state-store provider (RocksDB), watermark-driven
timeout eviction, and key-salting only if a single user dominates.

Timestamps cross the Arrow boundary as int64 micros (state schema has
no timestamp type restrictions to fight, and min/max on ints is
exact); the plan edge converts back to TIMESTAMP_NTZ.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import normalize_event_ts

STATE_SCHEMA = "n BIGINT, first_us BIGINT, last_us BIGINT"
OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, first_us BIGINT, last_us BIGINT"


def _update_profile(key, pdfs: Iterator, state) -> Iterator:
    import pandas as pd

    n, first_us, last_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        n += len(pdf)
        mn, mx = int(ts_us.min()), int(ts_us.max())
        first_us = mn if first_us is None else min(first_us, mn)
        last_us = mx if last_us is None else max(last_us, mx)
    state.update((n, first_us, last_us))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "first_us": [first_us], "last_us": [last_us]}
    )


def user_profiles(stream: DataFrame) -> DataFrame:
    """Per-user stateful profile over a streaming DataFrame with
    (user_id, ts) columns. Output: one row per user per micro-batch
    with the running totals."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_profile_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive user_profiles over the finite events parquet: file-source
    readStream → stateful op → update-mode memory sink, synchronously
    to completion. The final per-user profile is the row with the
    largest n_events (update mode emits one row per key per batch) —
    reduced batch-side so the result is batching-invariant."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = normalize_event_ts(stream)
    name = "user_profiles_" + uuid.uuid4().hex[:8]
    q = (
        user_profiles(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
        .select(
            "user_id",
            "n_events",
            F.timestamp_micros(F.col("first_us")).cast("timestamp_ntz").alias("first_ts"),
            F.timestamp_micros(F.col("last_us")).cast("timestamp_ntz").alias("last_ts"),
        )
    )
