"""Custom Catalyst optimizer rules via SparkSessionExtensions.

SURVEY.md §4.3's verdict is that reference parity needs ZERO custom
Catalyst rules — predicate pushdown, pruning, join reordering and
strategy choice are built in (the reference's whole RandomOptimizer,
src/qp/optimizer/RandomOptimizer.java:126-216, collapses into
Catalyst). This module is the optional demonstration that the
extension hook works end-to-end from pip-installed PySpark: Java
sources under java/dqps/ are compiled with javac against the bundled
Spark jars and registered through spark.sql.extensions.

Shipped rule: dqps.TrimIdempotenceRule — whitespace-trim idempotence
(trim(trim(x)) → trim(x), ltrim(trim(x)) → trim(x), ...), an
algebraic simplification Catalyst genuinely lacks (its built-in
SimplifyCaseConversionExpressions covers the upper/lower analog but
nothing covers trims — verified against the unextended optimizer,
tests/test_catalyst_ext.py asserts the rewrite does NOT fire without
the extension). Redundant defensive trims arise when every stage of
a composed text-cleaning pipeline trims its input. Measured honestly
(artifacts/CATALYST_RULE_BENCH.json, bench_catalyst_rule.py): the
rewrite is plan-visible but runtime-NEUTRAL at bench scales (1.06×
min-of-7, medians equal, over 500k docs) — UTF8String.trim is an
offset view that scans only edge whitespace, not a body copy, so the
rule's value is proving the extension hook, not throughput.

The extension must be on the driver classpath BEFORE the JVM starts,
so it cannot be enabled on an already-running session — use
`extension_confs()` when building a fresh one.
"""

from __future__ import annotations

import glob
import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
JAVA_SRC = os.path.join(_REPO, "java", "dqps")
CLASSES_DIR = os.path.join(_REPO, "java", "classes")
EXTENSION_CLASS = "dqps.DqpsExtensions"


def _spark_jars() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def ensure_compiled() -> str:
    """Compile java/dqps/*.java → java/classes if missing or stale.
    Returns the classes dir. Raises FileNotFoundError if no javac."""
    srcs = sorted(glob.glob(os.path.join(JAVA_SRC, "*.java")))
    if not srcs:
        raise FileNotFoundError(f"no Java sources under {JAVA_SRC}")
    marker = os.path.join(CLASSES_DIR, "dqps", "DqpsExtensions.class")
    if os.path.exists(marker) and all(
        os.path.getmtime(marker) >= os.path.getmtime(s) for s in srcs
    ):
        return CLASSES_DIR
    proc = subprocess.run(
        ["javac", "-cp", os.path.join(_spark_jars(), "*"), "-d", CLASSES_DIR, *srcs],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:  # surface the actual compiler diagnostics
        raise RuntimeError(f"javac failed:\n{proc.stderr}")
    return CLASSES_DIR


def extension_confs() -> dict[str, str]:
    """SparkSession builder configs that activate the custom rules
    (compiles the Java sources on first use)."""
    return {
        "spark.driver.extraClassPath": ensure_compiled(),
        "spark.sql.extensions": EXTENSION_CLASS,
    }
