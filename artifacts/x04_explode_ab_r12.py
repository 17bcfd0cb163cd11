import time
from pyspark.sql import functions as F
from pyspark import StorageLevel
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators import dedup as DD

spark = get_spark(driver_memory="16g")
SF = "/root/testdata/sf0.1"
docs = load_table(spark, SF, "documents")

def timed(name, build, n=3):
    runs = []
    for i in range(n):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"ab:{name}:{i}")
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    print(name, min(runs), runs, flush=True)

sh = lambda: DD.doc_shingles(docs, "doc_id", "text")

# A: inline explode (current shape)
timed("A_inline_explode", lambda: sh().select("doc_id", F.explode("grams").alias("g")))

# B: persist barrier then explode
def b():
    g = sh().persist(StorageLevel.MEMORY_AND_DISK)
    g.count()
    return g.select("doc_id", F.explode("grams").alias("g"))
timed("B_persist_explode", b)

# C: explode of a cheap array (split only) — explode cost floor
timed("C_split_explode", lambda: docs.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("g")))

# D: inline explode of hash arrays (longs)
timed("D_hash_explode", lambda: DD.doc_shingle_hashes(docs, "doc_id", "text").select("doc_id", F.explode("hs64").alias("g")))
