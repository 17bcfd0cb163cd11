import json, sys, time
import __spark_entry__ as e
from database_query_processor_spark.session import get_spark

spark = get_spark(driver_memory="16g")
qs = e.queries()
names = ["c64_triangle_count", "x04_dedup_ngram_jaccard", "x60_dedup_containment",
         "x61_bpe_tokenize", "x58_bpe_merges", "c63_pagerank"]
out = {}
for name in names:
    runs = []
    for i in range(3):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"exch_probe:{name}:{i}")
        t0 = time.monotonic()
        df = qs[name](spark, "/root/testdata/sf0.1")
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = [min(runs), runs]
    print(name, out[name], flush=True)
json.dump(out, open("artifacts/EXCH_PROBE_r12.json", "w"), indent=1)
