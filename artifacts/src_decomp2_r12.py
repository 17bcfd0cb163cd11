"""r12 item 5, probe 2: fragment-step repartition mechanism + parquet
rowgroup/page knobs (guide §2.5 deterministic keys, §6.3). Writes
SRC_DECOMP2_r12.json."""
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.workdir import scratch_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="src-decomp2-r12",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})


def gc():
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.25)


def timed(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        gc()
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return round(min(ts), 3), ts


def du(path):
    total, nfiles = 0, 0
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                nfiles += 1
                total += os.path.getsize(os.path.join(root, f))
    return nfiles, total


out = {}
e = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type", "value")

# A/B: round-robin repartition(64) (sortBeforeRepartition pre-sort) vs
# deterministic hash split on xxhash64(event_id) — same 64 tiny files.
def frag_rr():
    p = scratch_dir("dqps_frag_rr_")
    e.repartition(64).write.mode("overwrite").parquet(p)
    return p

def frag_hash():
    p = scratch_dir("dqps_frag_h_")
    e.repartition(64, F.pmod(F.xxhash64("event_id"), F.lit(64))).write.mode(
        "overwrite").parquet(p)
    return p

out["frag_roundrobin"] = timed(frag_rr)
out["frag_hash_xx64"] = timed(frag_hash)
out["frag_rr_files"] = du(frag_rr())
out["frag_hash_files"] = du(frag_hash())

# hash-partitioning by pmod(xxhash64) into 64 partitions keyed on 64
# distinct values: check the spread (guide §2.5 collision note)
cnt = (e.groupBy(F.pmod(F.xxhash64("event_id"), F.lit(64)).alias("b"))
       .count().agg(F.min("count"), F.max("count"), F.count("*")).first())
out["hash_bucket_min_max_nbuckets"] = [cnt[0], cnt[1], cnt[2]]

# rowgroup/page-size effect on the compact write (4 files, ~880 KB total —
# expect no effect at this SF; recorded so the claim is measured, not assumed)
FRAG = frag_rr()

def compact_opts(**opts):
    p = scratch_dir("dqps_comp2_")
    w = (spark.read.parquet(FRAG).repartitionByRange(4, "ts")
         .sortWithinPartitions("ts").write.mode("overwrite"))
    for k, v in opts.items():
        w = w.option(k, v)
    w.parquet(p)
    return p

out["compact_default"] = timed(lambda: compact_opts())
out["compact_blk1m"] = timed(lambda: compact_opts(**{"parquet.block.size": 1024 * 1024}))
out["compact_page64k"] = timed(lambda: compact_opts(**{"parquet.page.size": 64 * 1024}))

print(json.dumps(out, indent=1))
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SRC_DECOMP2_r12.json"), "w") as fh:
    json.dump(out, fh, indent=1)
