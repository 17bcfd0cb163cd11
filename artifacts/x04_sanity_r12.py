import time
from pyspark.sql import functions as F
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators import dedup as DD
import __spark_entry__ as e

spark = get_spark(driver_memory="16g")
SF = "/root/testdata/sf0.1"
docs = load_table(spark, SF, "documents")
qs = e.queries()

def timed(name, build, n=3):
    runs = []
    for i in range(n):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"sanity:{name}:{i}")
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    print(name, min(runs), runs, flush=True)

timed("docs_scan", lambda: docs.select("doc_id", "text"))
timed("tokens", lambda: docs.select(F.size(DD.tokens("text")).alias("n")))
timed("shingles_str", lambda: DD.doc_shingles(docs, "doc_id", "text"))
timed("shingles_hash", lambda: DD.doc_shingle_hashes(docs, "doc_id", "text"))
timed("explode_str", lambda: DD.doc_shingles(docs, "doc_id", "text").select("doc_id", F.explode("grams").alias("g")))
timed("x02_full", lambda: qs["x02_dedup_minhash"](spark, SF))
