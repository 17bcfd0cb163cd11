import json, time
from pyspark.sql import functions as F
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators import dedup as DD

spark = get_spark(driver_memory="16g")
SF = "/root/testdata/sf0.1"
docs = load_table(spark, SF, "documents")

out = {}
def timed(name, build, n=3):
    runs = []
    for i in range(n):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"x04_decomp:{name}:{i}")
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = [min(runs), runs]
    print(name, out[name], flush=True)

ex = lambda: DD.doc_shingles(docs, "doc_id", "text").select("doc_id", F.explode("grams").alias("gram"))
def rare():
    return ex().groupBy("gram").agg(F.count("*").alias("c")).filter(F.col("c") <= 100).select("gram")
def indexed():
    return ex().join(rare(), "gram")
def pairs():
    idx = indexed()
    a = idx.select(F.col("doc_id").alias("id_a"), "gram")
    b = idx.select(F.col("doc_id").alias("id_b"), "gram")
    return a.join(b, "gram").filter(F.col("id_a") < F.col("id_b")).groupBy("id_a", "id_b").agg(F.count("*").alias("shared"))

# cardinalities (once)
n_docs = docs.count()
n_ex = ex().count()
n_idx = indexed().count()
n_pairs = pairs().count()
out["cards"] = dict(docs=n_docs, exploded=n_ex, indexed=n_idx, pairs=n_pairs)
print(out["cards"], flush=True)

timed("A_explode", ex)
timed("B_rare", rare)
timed("C_indexed", indexed)
timed("D_paircounts", pairs)
json.dump(out, open("artifacts/X04_DECOMP_r12.json", "w"), indent=1)
