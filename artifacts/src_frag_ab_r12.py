"""r12 item 5, probe 3: INTERLEAVED A/B of the src09 fragment step —
keyless repartition(64) (pays sortBeforeRepartition) vs deterministic
repartition(64, xxhash64(event_id)) (full-entropy key -> all 64
partitions populated, guide §2.5). Interleaving cancels host weather.
Writes SRC_FRAG_AB_r12.json."""
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
spark = get_spark(app_name="src-frag-ab-r12",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})


def gc():
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.25)


def du(path):
    total, nfiles = 0, 0
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                nfiles += 1
                total += os.path.getsize(os.path.join(root, f))
    return nfiles, total


e = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type", "value")


def frag_rr():
    p = scratch_dir("dqps_ab_rr_")
    e.repartition(64).write.mode("overwrite").parquet(p)
    return p


def frag_hash():
    p = scratch_dir("dqps_ab_h_")
    e.repartition(64, F.xxhash64("event_id")).write.mode("overwrite").parquet(p)
    return p


out = {"rr": [], "hash": []}
out["rr_files"] = du(frag_rr())      # warm + file-count check
out["hash_files"] = du(frag_hash())
for _ in range(5):
    for name, fn in (("rr", frag_rr), ("hash", frag_hash)):
        gc()
        t0 = time.perf_counter()
        fn()
        out[name].append(round(time.perf_counter() - t0, 3))

out["rr_min"] = min(out["rr"])
out["hash_min"] = min(out["hash"])
print(json.dumps(out, indent=1))
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SRC_FRAG_AB_r12.json"), "w") as fh:
    json.dump(out, fh, indent=1)
