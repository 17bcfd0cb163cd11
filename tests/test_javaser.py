"""Round-trip gate for the Java-serialization bridge: generate a table
with the REFERENCE'S OWN RandomDB + ConvertTxtToTbl (javac'd from
/root/reference), then decode the `.md`/`.tbl` byte-for-byte with
sources/javaser.py and compare against the reference's own `.txt`
dump of the same rows. This is the check that a reference-produced
dataset loads verbatim — no regeneration from .det specs."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from database_query_processor_spark.sources import javaser

REF = os.environ.get("SPARK_GRAFT_REF_DIR", "/root/reference")
ROWS = 500
DET = (
    "4\n100\ncartid INTEGER {pk} PK 4\ncid INTEGER {pk} FK 4\n"
    "status STRING 8 NK 16\nremarks STRING 38 NK 76\n"
)

needs_java = pytest.mark.skipif(
    shutil.which("javac") is None or not os.path.isdir(REF),
    reason="reference sources or JDK unavailable",
)


@pytest.fixture(scope="module")
def ref_table(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("javaser"))
    classes = os.path.join(work, "classes")
    os.makedirs(classes)
    subprocess.run(
        ["javac", "-d", classes, "-sourcepath", os.path.join(REF, "src"),
         os.path.join(REF, "src", "ConvertTxtToTbl.java"),
         os.path.join(REF, "src", "RandomDB.java")],
        check=True, capture_output=True,
    )
    env = dict(os.environ, CLASSPATH=f"{classes}:.")
    with open(os.path.join(work, "CART.det"), "w") as f:
        f.write(DET.format(pk=2 * ROWS))
    subprocess.run(["java", "RandomDB", "CART", str(ROWS)], cwd=work, env=env,
                   check=True, capture_output=True)
    subprocess.run(["java", "ConvertTxtToTbl", "CART"], cwd=work, env=env,
                   check=True, capture_output=True)
    return work


def _txt_rows(work):
    rows = []
    with open(os.path.join(work, "CART.txt")) as f:
        for line in f:
            parts = line.split("\t")[:4]  # RandomDB emits a trailing \t
            rows.append([int(parts[0]), int(parts[1]), parts[2], parts[3]])
    return rows


@needs_java
def test_schema_decodes(ref_table):
    with open(os.path.join(ref_table, "CART.md"), "rb") as f:
        cols = javaser.read_schema(f.read())
    assert cols == [
        ("cartid", javaser.ATTR_INT),
        ("cid", javaser.ATTR_INT),
        ("status", javaser.ATTR_STRING),
        ("remarks", javaser.ATTR_STRING),
    ]


@needs_java
def test_tuples_match_reference_txt(ref_table):
    with open(os.path.join(ref_table, "CART.tbl"), "rb") as f:
        rows = javaser.read_tuples(f.read())
    assert rows == _txt_rows(ref_table)


@needs_java
def test_custom_datasource(spark, ref_table):
    """spark.read.format('javaser') through the registered Python
    DataSource must reproduce the reference's rows with the .md-derived
    schema, one partition per .tbl file."""
    from database_query_processor_spark.sources.javaser_source import JavaSerDataSource

    try:
        spark.dataSource.register(JavaSerDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("javaser")
        .option("md", os.path.join(ref_table, "CART.md"))
        .option("path", os.path.join(ref_table, "CART.tbl"))
        .load()
    )
    assert df.rdd.getNumPartitions() == 1  # one file -> one partition
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(tuple(r) for r in _txt_rows(ref_table))


@needs_java
def test_distributed_read(spark, ref_table):
    df = javaser.read_tbl_dataset(
        spark,
        os.path.join(ref_table, "CART.md"),
        os.path.join(ref_table, "CART.tbl"),
    )
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in _txt_rows(ref_table))
    assert got == want
    assert df.schema.fieldNames()[0].endswith("cartid")
