import json, time
from pyspark.sql import functions as F
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.operators import similarity as SIM
from database_query_processor_spark.operators.similarity import (
    HYPERPLANES, NUM_HYPERPLANES, DUP_BANDS, hyperplane_bucket, dot_d)

spark = get_spark(driver_memory="16g")
emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")

def dot_flat(a, b, dim):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return acc

def dup_pairs(dotf):
    df, id_col, vec_col, threshold = emb, "vec_id", "embedding", 0.5
    bits = NUM_HYPERPLANES // DUP_BANDS
    mask = (1 << bits) - 1
    bands_df = df.select(
        F.col(id_col), F.col(vec_col),
        F.sqrt(dotf(F.col(vec_col), F.col(vec_col))).alias("nrm"),
        hyperplane_bucket(F.col(vec_col), HYPERPLANES).alias("_hb"),
    ).select(
        F.col(id_col), F.col(vec_col), "nrm",
        F.explode(F.array(*[F.struct(F.lit(j).alias("band"),
            F.shiftright(F.col("_hb"), bits * j).bitwiseAND(mask).alias("bval"))
            for j in range(DUP_BANDS)])).alias("bk"),
    ).select(F.col(id_col), F.col(vec_col), "nrm", F.col("bk.band"), F.col("bk.bval"))
    a = bands_df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na"), "band", "bval")
    b = bands_df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb"), "band", "bval")
    cos = dotf(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (a.join(b, ["band", "bval"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos")).filter(F.col("cos") >= 0.5).distinct())

# equality of the two forms on the full result
cur = dup_pairs(dot_d)
new = dup_pairs(lambda a, b: dot_flat(a, b, 64))
mism = cur.alias("x").join(new.alias("y"), ["id_a", "id_b"], "full")
bad = mism.filter(~F.col("x.cos").eqNullSafe(F.col("y.cos"))).count()
print("mismatches:", bad, "rows:", cur.count(), flush=True)

out = {}
def timed(name, build, n=3):
    runs = []
    for i in range(n):
        spark.catalog.clearCache(); spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"dotab:{name}:{i}")
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = [min(runs), runs]
    print(name, out[name], flush=True)

timed("fold_dot", lambda: dup_pairs(dot_d))
timed("flat_dot", lambda: dup_pairs(lambda a, b: dot_flat(a, b, 64)))
json.dump(out, open("artifacts/DOT_SHAPE_AB_r12.json", "w"), indent=1)

# cost attribution: trivial per-pair expression instead of the dot
timed("trivial_pair_expr", lambda: dup_pairs(lambda a, b: F.get(a, 0).cast("double") * F.get(b, 0).cast("double")))
# fused fold without the zip_with intermediate array
def dot_seq(a, b):
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0.0),
        lambda acc, i: acc + F.get(a, i).cast("double") * F.get(b, i).cast("double"),
    )
timed("seq_fold_dot", lambda: dup_pairs(dot_seq))
json.dump(out, open("artifacts/DOT_SHAPE_AB_r12.json", "w"), indent=1)
