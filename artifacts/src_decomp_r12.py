"""r12 item 5: decompose src09_compaction / src11_merge_upsert (guide §1, §6.3).

Times each phase (min of 3, gc barrier, noop sink for pure reads) and A/B's
write-side knobs: parquet codec for the scratch/one-read intermediates,
output file count, and maxRecordsPerFile. Writes SRC_DECOMP_r12.json.
"""
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators.aggregates import dec
from database_query_processor_spark.operators.relational import merge_into
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.sources import layout as LAY
from database_query_processor_spark.workdir import scratch_dir
from database_query_processor_spark.workload.sources_ops import orders_changelog

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="src-decomp-r12",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})


def gc():
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.25)


def timed(fn, n=3):
    fn()  # warm
    ts = []
    for _ in range(n):
        gc()
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return round(min(ts), 3), ts


out = {}

# ---------- src09 ----------
e = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type", "value")
n_events = e.count()
out["events_rows"] = n_events

# phase A: fragment write (64 tiny files), current shape
def frag_write(codec=None):
    frag = scratch_dir("dqps_frag_probe_")
    w = e.repartition(64).write.mode("overwrite")
    if codec:
        w = w.option("compression", codec)
    w.parquet(frag)
    return frag

out["src09_A_frag_write_zstd"] = timed(lambda: frag_write())
out["src09_A_frag_write_snappy"] = timed(lambda: frag_write("snappy"))
out["src09_A_frag_write_lz4"] = timed(lambda: frag_write("lz4"))

# fixed fragment dir for downstream phases
FRAG = frag_write()

# phase B: compact (range shuffle + sort + 4-file write)
def compact_run(codec=None):
    comp = scratch_dir("dqps_comp_probe_")
    df = spark.read.parquet(FRAG)
    w = df.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.mode("overwrite")
    if codec:
        w = w.option("compression", codec)
    w.parquet(comp)
    return comp

out["src09_B_compact_zstd"] = timed(lambda: compact_run())
out["src09_B_compact_snappy"] = timed(lambda: compact_run("snappy"))

COMP = compact_run()

# phase C: read-back + aggregate
def agg_read():
    (spark.read.parquet(COMP)
     .groupBy("event_type")
     .agg(F.count("*").alias("n"),
          F.sum(dec("value")).cast("double").alias("sum_value"),
          F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
     .write.format("noop").mode("overwrite").save())

out["src09_C_readback_agg"] = timed(agg_read)

# sizes
def du(path):
    total = 0
    nfiles = 0
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                nfiles += 1
                total += os.path.getsize(os.path.join(root, f))
    return nfiles, total

out["src09_frag_files"] = du(FRAG)
out["src09_comp_files"] = du(COMP)

# ---------- src11 ----------
o = load_table(spark, SF_DIR, "orders")
target = o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
out["orders_rows"] = target.count()
source = orders_changelog(target)
merged = merge_into(
    target, source, key="o_orderkey",
    matched_update={"o_orderstatus": F.col("s.o_orderstatus"),
                    "o_totalprice": F.col("s.o_totalprice")},
    matched_delete=F.col("s.is_delete"),
)

# phase A: merge compute only
out["src11_A_merge_noop"] = timed(
    lambda: merged.write.format("noop").mode("overwrite").save())

# phase B: write merged parquet (current shape — whatever partitioning falls out)
def merge_write(df, codec=None):
    p = scratch_dir("dqps_merge_probe_")
    w = df.write.mode("overwrite")
    if codec:
        w = w.option("compression", codec)
    w.parquet(p)
    return p

out["src11_B_write_zstd"] = timed(lambda: merge_write(merged))
out["src11_B_write_snappy"] = timed(lambda: merge_write(merged, "snappy"))
out["src11_B_write_coalesce4"] = timed(lambda: merge_write(merged.coalesce(4)))

MRG = merge_write(merged)
out["src11_merged_files"] = du(MRG)

# phase C: read back whole table
out["src11_C_readback"] = timed(
    lambda: spark.read.parquet(MRG).write.format("noop").mode("overwrite").save())

print(json.dumps(out, indent=1))
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SRC_DECOMP_r12.json"), "w") as fh:
    json.dump(out, fh, indent=1)
