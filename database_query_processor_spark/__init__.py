"""PySpark-native analytics engine with the capability surface of
joel-lim/database-query-processor, rebuilt Spark-first.

The reference (/root/reference) is a single-threaded Volcano-iterator
query processor (scan / select / project / distinct / NLJ-BNJ-SMJ join /
external sort; aggregates parse but abort — see SURVEY.md §2). This
package re-expresses that surface — plus real aggregates, set ops,
windows, streaming, and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) — as declarative DataFrame /
Spark SQL plans so Catalyst + Tungsten pick the physical strategy.

Layout:
    session      SparkSession factory tuned for local[32] and for scale
    catalog      parquet table registration (testdata star schema)
    operators/   relational + extension operators (composable fns)
    functions/   scalar/text function library
    plans/       reference-dialect SQL translator, plan inspection
    sources/     readers/writers (parquet, tab-text ingest)
    streaming/   Structured Streaming windowed/sessionized ops
"""

from database_query_processor_spark.session import get_spark
from database_query_processor_spark.catalog import TABLES, load_table, register_tables

__all__ = ["get_spark", "register_tables", "load_table", "TABLES"]
