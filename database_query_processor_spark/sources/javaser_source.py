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

Filesystem contract: shards are listed and read through
`pyarrow.fs.FileSystem.from_uri`, so the source works anywhere a
driver-side path may not be executor-visible — local paths, file://,
hdfs://, s3:// (any scheme pyarrow's FS layer supports in the
deployment) — instead of assuming a filesystem mounted identically on
driver and executors. Glob wildcards are supported in the FILENAME
component only (`/data/CART*.tbl`); pyarrow's FS API has directory
listing but no recursive glob, and shard sets are flat by
construction (RandomDB writes `<T>.tbl` siblings).

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

import fnmatch
import posixpath

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from database_query_processor_spark.sources.javaser import read_tuples, schema_ddl


def _read_bytes(uri: str) -> bytes:
    from pyarrow import fs as pafs

    filesystem, path = pafs.FileSystem.from_uri(uri)
    with filesystem.open_input_file(path) as fh:
        return fh.read()


def _resolve_shards(pattern: str) -> tuple[str, list[str]]:
    """Expand `<dir>/<name-glob>` against the pattern's filesystem.
    Returns (filesystem-reconstruction URI, fs-internal shard paths)."""
    from pyarrow import fs as pafs

    filesystem, path = pafs.FileSystem.from_uri(pattern)
    base, name = posixpath.split(path)
    if any(ch in base for ch in "*?["):
        raise ValueError(
            "javaser: glob wildcards are only supported in the filename "
            f"component, got {pattern!r}"
        )
    infos = filesystem.get_file_info(pafs.FileSelector(base))
    shards = sorted(
        i.path
        for i in infos
        if i.type == pafs.FileType.File
        and fnmatch.fnmatch(posixpath.basename(i.path), name)
    )
    # Executors reconstruct the FILESYSTEM from this URI and discard
    # its path part (shard paths are fs-internal), so the original
    # pattern string is the one URI guaranteed to resolve the same
    # filesystem. Deriving a prefix by byte-length subtraction broke
    # whenever from_uri percent-decoded the path ('%20' -> ' '
    # shortens it, truncating the scheme arithmetic).
    return pattern, shards


class _TblPartition(InputPartition):
    def __init__(self, base_uri: str, path: str):
        self.base_uri = base_uri
        self.path = path


class _JavaSerReader(DataSourceReader):
    def __init__(self, base_uri: str, paths: list[str]):
        self._base_uri = base_uri
        self._paths = paths

    def partitions(self) -> list[InputPartition]:
        # one whole .tbl file per task: the stream is not splittable,
        # so a sharded dataset parallelizes at file granularity
        return [_TblPartition(self._base_uri, p) for p in self._paths]

    def read(self, partition: _TblPartition):
        from pyarrow import fs as pafs

        # reconstruct the filesystem from the base URI on the executor —
        # partition.path is already fs-internal
        filesystem, _ = pafs.FileSystem.from_uri(partition.base_uri)
        with filesystem.open_input_file(partition.path) as fh:
            data = fh.read()
        for row in read_tuples(data):
            yield tuple(row)


class JavaSerDataSource(DataSource):
    """Options: `md` = path/URI of the `.md` schema sidecar (read
    once, driver-side, at plan time); `path` = shard pattern —
    directory URI + filename glob (wildcards in the filename only)."""

    @classmethod
    def name(cls) -> str:
        return "javaser"

    def schema(self) -> str:
        return schema_ddl(_read_bytes(self.options["md"]))

    def reader(self, schema) -> DataSourceReader:
        base_uri, paths = _resolve_shards(self.options["path"])
        if not paths:
            raise FileNotFoundError(f"no .tbl files match {self.options['path']!r}")
        return _JavaSerReader(base_uri, paths)
