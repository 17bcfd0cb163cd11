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
    import json, sys
    from pyspark.sql import SparkSession, functions as F

    with_rule = sys.argv[1] == "with"
    b = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2"))
    if with_rule:
        from database_query_processor_spark.plans.catalyst_ext import extension_confs
        for k, v in extension_confs().items():
            b = b.config(k, v)
    spark = b.getOrCreate()

    s = F.concat(F.lit("  "), F.col("id").cast("string"), F.lit(" \\t"))
    df = spark.range(5).select(
        F.trim(F.trim(s)).alias("t"),            # -> trim(s)
        F.ltrim(F.ltrim(F.ltrim(s))).alias("l"), # -> ltrim(s)
        F.rtrim(F.trim(s)).alias("r"),           # -> trim(s)  (outer no-op)
        F.expr("trim(BOTH 'x' FROM trim(BOTH 'x' FROM cast(id AS string)))").alias("c"),
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    rows = [tuple(r) for r in df.collect()]
    expected = [tuple(r) for r in spark.range(5).select(
        F.trim(s).alias("t"), F.ltrim(s).alias("l"), F.trim(s).alias("r"),
        F.expr("trim(BOTH 'x' FROM trim(BOTH 'x' FROM cast(id AS string)))").alias("c"),
    ).collect()]
    print(json.dumps({
        "trim_calls": opt.count("trim("),
        "rows_ok": rows == expected,
    }))
    """
)


def _probe(mode: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", PROBE, mode],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_rule_rewrites_and_preserves_results():
    """WITH the extension: trim(trim(x)) -> trim(x), the ltrim chain
    collapses, rtrim(trim(x)) -> trim(x); the custom-trim-set pair
    ('x' trims, composition NOT idempotent) is left alone. Counted
    calls: t=1, l=1, r=1, c=2 -> 5 total (opt.count('trim(') counts
    ltrim/rtrim via their substring too, which is exactly why the
    collapsed total is the right gate)."""
    ensure_compiled()
    result = _probe("with")
    assert result["trim_calls"] == 5, result
    assert result["rows_ok"] is True


def test_rule_is_not_redundant_with_builtin_catalyst():
    """The same plan WITHOUT the extension keeps every redundant trim
    (t=2, l=3, r=2, c=2 -> 9): Catalyst 4 has no built-in trim
    idempotence (SimplifyCaseConversionExpressions covers only
    upper/lower), so the rewrite above is attributable to OUR rule —
    this pins the rule against silently going vacuous if a future
    Spark adds the simplification (the round-6 case rule was exactly
    that: redundant with a built-in, its rewrite test passing without
    it)."""
    result = _probe("without")
    assert result["trim_calls"] == 9, result
    assert result["rows_ok"] is True
