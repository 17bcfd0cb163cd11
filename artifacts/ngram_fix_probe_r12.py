import json, time
import __spark_entry__ as e
from database_query_processor_spark.session import get_spark

spark = get_spark(driver_memory="16g")
qs = e.queries()
names = ["x19_decontaminate", "x44_contamination_safe_split", "x52_fuzzy_decontaminate",
         "x50_bigram_lm_quality", "x02_dedup_minhash", "x04_dedup_ngram_jaccard",
         "x60_dedup_containment", "x18_dedup_clusters", "x42_dedup_keep_best",
         "x45_dedup_soft_weights"]
out = {}
for name in names:
    runs = []
    for i in range(3):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"ngfix:{name}:{i}")
        t0 = time.monotonic()
        qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = [min(runs), runs]
    print(name, out[name], flush=True)
json.dump(out, open("artifacts/NGRAM_FIX_PROBE_r12.json", "w"), indent=1)
