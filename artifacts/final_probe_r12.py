import json, time
import __spark_entry__ as e
from database_query_processor_spark.session import get_spark
spark = get_spark(driver_memory="16g")
qs = e.queries()
names = ["x62_hard_negatives", "x66_ann_pq_rerank", "x45_dedup_soft_weights",
         "x61_bpe_tokenize", "x58_bpe_merges", "x42_dedup_keep_best",
         "c64_triangle_count", "x63_bpe_compression", "x47_budget_select",
         "x29_sim_knn_join_lsh", "x18_dedup_clusters"]
out = {}
for name in names:
    runs = []
    for i in range(3):
        spark.catalog.clearCache(); spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"final:{name}:{i}")
        t0 = time.monotonic()
        qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = [min(runs), runs]
    print(name, out[name], flush=True)
json.dump(out, open("artifacts/FINAL_PROBE_r12.json", "w"), indent=1)
