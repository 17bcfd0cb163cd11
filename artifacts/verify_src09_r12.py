import io, contextlib
import __spark_entry__ as e
from database_query_processor_spark.session import get_spark
from database_query_processor_spark.catalog import load_table
from pyspark.sql import functions as F
from tests.oracle import compare, duckdb_run

spark = get_spark(driver_memory="16g")
spark.sparkContext.setJobDescription("verify_src09_r12")
qs, os_ = e.queries(), e.oracle_sql()

for sf in ("sf0.001", "sf0.01", "sf0.1"):
    d = f"/root/testdata/{sf}"
    name = "src09_compaction"
    if name in os_:
        probs = compare(qs[name](spark, d), duckdb_run(os_[name], d))
        print(sf, name, "MATCH" if not probs else probs)
    else:
        print(sf, name, "rows:", qs[name](spark, d).count())

# plan capture: fragment-write child plan before (round-robin) vs after (hash split)
d = "/root/testdata/sf0.1"
ev = load_table(spark, d, "events").select("event_id", "ts", "event_type", "value")
def dump(df, path):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    open(path, "w").write(buf.getvalue())
dump(ev.repartition(64), "plans/r12/src09_compaction_before.txt")
dump(ev.repartition(64, F.xxhash64("event_id")), "plans/r12/src09_compaction_after.txt")
print("plans written")
