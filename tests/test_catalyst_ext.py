"""The custom Catalyst rule (SparkSessionExtensions hook) must load
into a fresh JVM, rewrite redundant case-normalization, and preserve
results. Runs in a subprocess because the extension classpath has to
be set before the driver JVM starts — the shared test session can't
pick it up."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import textwrap

import pytest

from database_query_processor_spark.plans.catalyst_ext import ensure_compiled

pytestmark = pytest.mark.skipif(shutil.which("javac") is None, reason="no javac")


PROBE = textwrap.dedent(
    """
    import json
    from pyspark.sql import SparkSession, functions as F
    from database_query_processor_spark.plans.catalyst_ext import extension_confs

    b = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2"))
    for k, v in extension_confs().items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    s = F.col("id").cast("string")
    df = spark.range(5).select(
        F.upper(F.upper(F.lower(s))).alias("u"),   # -> upper(s)
        F.lower(F.lower(s)).alias("l"),            # -> lower(s)
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    rows = [tuple(r) for r in df.collect()]
    expected = [tuple(r) for r in spark.range(5).select(
        F.upper(s).alias("u"), F.lower(s).alias("l")).collect()]
    print(json.dumps({
        "upper_calls": opt.count("upper("),
        "lower_calls": opt.count("lower("),
        "rows_ok": rows == expected,
    }))
    """
)


def test_rule_rewrites_and_preserves_results():
    ensure_compiled()
    out = subprocess.run(
        [sys.executable, "-c", PROBE], capture_output=True, text=True, timeout=300, cwd="/root/repo"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    # upper(upper(lower(x))) collapses to ONE upper; lower(lower(x)) to ONE lower.
    assert result["upper_calls"] == 1, result
    assert result["lower_calls"] == 1, result
    assert result["rows_ok"] is True
