"""`spark.read.format("javaser")` — the reference's native table
format as a first-class Spark data source (Python DataSource API,
Spark 4).

Where sources/javaser.py::read_tbl_dataset is a helper that composes
binaryFile + mapInPandas, this registers the same decoder as a REAL
source: schema discovery from the `.md` sidecar happens at plan time,
each `.tbl` shard becomes one InputPartition (the format is a
non-splittable serialization stream, so file granularity is the
correct parallelism — same contract as gzip'd JSON), and rows are
decoded executor-side inside the scan itself.

Usage:
    spark.dataSource.register(JavaSerDataSource)
    df = (spark.read.format("javaser")
          .option("md", "/data/CART.md")
          .option("path", "/data/CART*.tbl").load())

Reference format: RandomDB.java:27,114 writes `<T>.md` (serialized
qp.utils.Schema); ConvertTxtToTbl.java:30,69 writes `<T>.tbl`
(serialized qp.utils.Tuple stream); Scan.java:49 is the reference's
own reader.
"""

from __future__ import annotations

import glob

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from database_query_processor_spark.sources.javaser import read_tuples, schema_ddl


class _TblPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _JavaSerReader(DataSourceReader):
    def __init__(self, paths: list[str]):
        self._paths = paths

    def partitions(self) -> list[InputPartition]:
        # one whole .tbl file per task: the stream is not splittable,
        # so a sharded dataset parallelizes at file granularity
        return [_TblPartition(p) for p in self._paths]

    def read(self, partition: _TblPartition):
        with open(partition.path, "rb") as fh:
            data = fh.read()
        for row in read_tuples(data):
            yield tuple(row)


class JavaSerDataSource(DataSource):
    """Options: `md` = path to the `.md` schema sidecar (read once,
    driver-side, at plan time); `path` = glob of `.tbl` shards."""

    @classmethod
    def name(cls) -> str:
        return "javaser"

    def schema(self) -> str:
        with open(self.options["md"], "rb") as fh:
            return schema_ddl(fh.read())

    def reader(self, schema) -> DataSourceReader:
        paths = sorted(glob.glob(self.options["path"]))
        if not paths:
            raise FileNotFoundError(f"no .tbl files match {self.options['path']!r}")
        return _JavaSerReader(paths)
