"""Custom Catalyst optimizer rules via SparkSessionExtensions.

SURVEY.md §4.3's verdict is that reference parity needs ZERO custom
Catalyst rules — predicate pushdown, pruning, join reordering and
strategy choice are built in (the reference's whole RandomOptimizer,
src/qp/optimizer/RandomOptimizer.java:126-216, collapses into
Catalyst). This module is the optional demonstration that the
extension hook works end-to-end from pip-installed PySpark: Java
sources under java/dqps/ are compiled with javac against the bundled
Spark jars and registered through spark.sql.extensions.

Shipped rule: dqps.CaseNormalizationRule — case-normalization
idempotence (upper(upper(x)) → upper(x), lower(upper(x)) → lower(x)),
an algebraic simplification Catalyst lacks that removes one full
string copy per row per redundant call in composed text-cleaning
pipelines.

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
