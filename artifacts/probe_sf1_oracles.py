#!/usr/bin/env python
"""Probe: which x-family DuckDB oracles complete at sf1 within a
timeout? Writes artifacts/SF1_ORACLE_PROBE.json. Usage:
  PYTHONPATH=/root/repo python artifacts/probe_sf1_oracles.py [timeout_s]
"""
import json
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, "/root/repo")
from database_query_processor_spark.catalog import TABLES  # noqa: E402
from database_query_processor_spark.workload import all_specs  # noqa: E402

SF1 = "/tmp/dqps_sf1"
TIMEOUT = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0

out = {}
for spec in all_specs():
    if not spec.name.startswith("x") or spec.oracle is None:
        continue
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        p = os.path.join(SF1, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    timer = threading.Timer(TIMEOUT, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        n = len(con.execute(spec.oracle).fetchall())
        out[spec.name] = {"status": "ok", "rows": n, "sec": round(time.time() - t0, 1)}
    except Exception as ex:
        status = "timeout" if time.time() - t0 >= TIMEOUT - 1 else "error"
        out[spec.name] = {"status": status, "err": f"{type(ex).__name__}: {str(ex)[:120]}",
                          "sec": round(time.time() - t0, 1)}
    finally:
        timer.cancel()
        con.close()
    print(spec.name, out[spec.name], flush=True)

with open("artifacts/SF1_ORACLE_PROBE.json", "w") as f:
    json.dump(out, f, indent=1)
