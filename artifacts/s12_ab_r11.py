#!/usr/bin/env python
"""A/B: s12 session-expiry TWS — pandas vs pandas+ts_us vs row-based."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Row
from pyspark.sql import functions as F
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.streaming import stateful as ST
from database_query_processor_spark.streaming.windows import _events_stream, _run_to_parquet_sink
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

SF = "/root/testdata/sf0.1"
GAP = ST.SESSION_GAP_US


class RowProc(StatefulProcessor):
    def init(self, handle):
        self._handle = handle
        self._sess = handle.getValueState("sess", "start_us BIGINT, last_us BIGINT, n BIGINT")

    def handleInputRows(self, key, rows, timer_values):
        evts = sorted(r[2] for r in rows)
        if not evts:
            return
        prev = self._sess.get()
        if prev is not None:
            start, last, n = (int(x) for x in prev)
        else:
            start, last, n = -1, -1, 0
        prev_last = last
        closed = []
        for t in evts:
            if n == 0:
                start, last, n = t, t, 1
            elif t - last > GAP:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = (last if last >= t else t), n + 1
        self._sess.update((start, last, n))
        old_e = (prev_last + GAP) // 1000
        new_e = (last + GAP) // 1000
        if prev is None:
            self._handle.registerTimer(new_e)
        elif new_e != old_e:
            self._handle.deleteTimer(old_e)
            self._handle.registerTimer(new_e)
        uid = int(key[0])
        for c in closed:
            yield Row(user_id=uid, start_us=c[0], end_us=c[1], n=c[2], closed_by="data")

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        prev = self._sess.get()
        if prev is None:
            return
        start, last, n = (int(x) for x in prev)
        self._sess.clear()
        yield Row(user_id=int(key[0]), start_us=start, end_us=last, n=n, closed_by="timer")

    def close(self):
        pass


def row_tws(stream):
    ST._activate_protobuf_shim(stream.sparkSession)
    return (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                      F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .transformWithState(
            RowProc(),
            outputStructType=ST.TWS_SESSION_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )


def drive(spark, transform, label, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sink = ST._run_tws_topology(spark, SF, transform, "ab_" + label, sink="parquet")
        cnt = sink.count()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"RES {label}: rows={cnt} {ts} min={min(ts)}", flush=True)
    return ts


if __name__ == "__main__":
    spark = get_spark(driver_memory="16g", extra_conf={"spark.ui.showConsoleProgress": "false"})
    # interleaved A/B to average out host weather
    for _ in range(3):
        drive(spark, ST.session_expiry_tws, "pandas", n=1)
        drive(spark, row_tws, "rowbased", n=1)
    spark.stop()
