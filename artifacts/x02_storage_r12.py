#!/usr/bin/env python
"""x02 persisted-intermediate storage evidence (r12 item 2): build the
dedup pipeline's cached shingle intermediate both ways at sf0.1 and
report the materialized storage bytes, plus isolated x02 timings.

    PYTHONPATH=/root/repo python artifacts/x02_storage_r12.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from database_query_processor_spark.operators.dedup import (  # noqa: E402
    doc_shingle_hashes,
    doc_shingles,
)
from database_query_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def _cached_bytes(spark, df) -> tuple[int, int]:
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.write.format("noop").mode("overwrite").save()
    sc = spark.sparkContext
    mem = disk = 0
    for info in sc._jsc.sc().getRDDStorageInfo():
        mem += info.memSize()
        disk += info.diskSize()
    df.unpersist(blocking=True)
    return mem, disk


def main() -> None:
    spark = get_spark(app_name="dqps-x02-storage-r12",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = {}
    spark.sparkContext.setJobDescription("x02 storage: gram strings")
    g_mem, g_disk = _cached_bytes(spark, doc_shingles(docs, "doc_id", "text"))
    spark.sparkContext.setJobDescription("x02 storage: hash64 arrays")
    h_mem, h_disk = _cached_bytes(spark, doc_shingle_hashes(docs, "doc_id", "text"))
    out["gram_strings"] = {"mem_bytes": g_mem, "disk_bytes": g_disk}
    out["hash64_arrays"] = {"mem_bytes": h_mem, "disk_bytes": h_disk}
    out["ratio_mem"] = round(g_mem / max(h_mem, 1), 2)
    path = os.path.join(REPO, "artifacts", "X02_STORAGE_r12.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
