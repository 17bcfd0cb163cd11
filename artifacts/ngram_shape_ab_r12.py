import json, time
from pyspark.sql import functions as F
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.functions.text import tokens, word_ngrams

spark = get_spark(driver_memory="16g")
SF = "/root/testdata/sf0.1"
docs = load_table(spark, SF, "documents")

def word_ngrams_zip(toks, n):
    L = F.size(toks)
    cnt = L - n + 1
    acc = F.slice(toks, 1, cnt)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, k + 1, cnt),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(L >= n, acc).otherwise(F.array().cast("array<string>"))

out = {}
def timed(name, build, n=3):
    runs = []
    for i in range(n):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"ngab:{name}:{i}")
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = [min(runs), runs]
    print(name, out[name], flush=True)

# equality check first (whole corpus, n=5 and n=2 and n=8)
for n in (2, 5, 8):
    cur = docs.select("doc_id", word_ngrams(tokens("text"), n).alias("g"))
    new = docs.select("doc_id", word_ngrams_zip(tokens("text"), n).alias("g"))
    j = cur.alias("a").join(new.alias("b"), "doc_id")
    mism = j.filter(~F.col("a.g").eqNullSafe(F.col("b.g"))).count()
    print(f"n={n} mismatches:", mism, flush=True)
    assert mism == 0

# inline-expression consumer (the decontaminate shape, n=5)
timed("cur_inline_n5", lambda: docs.select("doc_id", F.array_distinct(word_ngrams(tokens("text"), 5)).alias("g")))
timed("zip_inline_n5", lambda: docs.select("doc_id", F.array_distinct(word_ngrams_zip(tokens("text"), 5)).alias("g")))
# n=3 (dedup family)
timed("cur_inline_n3", lambda: docs.select("doc_id", F.array_distinct(word_ngrams(tokens("text"), 3)).alias("g")))
timed("zip_inline_n3", lambda: docs.select("doc_id", F.array_distinct(word_ngrams_zip(tokens("text"), 3)).alias("g")))
# attribute-input consumer (the fenced x33 shape, n=4)
fence = lambda c: F.when(F.monotonically_increasing_id() >= -1, c)
def attr(fn, n):
    return (docs.select("doc_id", fence(tokens("text")).alias("toks"))
                .select("doc_id", fence(fn(F.col("toks"), n)).alias("g")))
timed("cur_attr_n4", lambda: attr(word_ngrams, 4))
timed("zip_attr_n4", lambda: attr(word_ngrams_zip, 4))
timed("cur_attr_n8", lambda: attr(word_ngrams, 8))
timed("zip_attr_n8", lambda: attr(word_ngrams_zip, 8))
json.dump(out, open("artifacts/NGRAM_SHAPE_AB_r12.json", "w"), indent=1)
