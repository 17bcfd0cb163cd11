"""Manifest-versioned table layout: the Iceberg/Delta snapshot-
isolation core in miniature, on plain parquet.

Every commit writes IMMUTABLE data files plus a `manifest_vN.json`
naming exactly the files visible in snapshot N. Readers resolve one
manifest and scan only its files, so

  * **time travel** is just reading an older manifest,
  * **copy-on-write update** is a new manifest that swaps the
    replaced files for their rewritten versions (src11's MERGE
    produces the rewritten file; this layer gives it a version),
  * **appends** add files without touching existing ones,
  * readers are never torn: a concurrent commit can't mutate the
    files a running scan already resolved.

Scale notes: a commit costs O(changed files) data I/O plus an
O(table files) metadata write — never a table rewrite; that is the
entire reason table formats exist at 100 TB. Manifests here are one
JSON per version on a shared filesystem; a production deployment
would write them through the object store's conditional-put (or a
catalog service) to serialize concurrent committers, and split the
file list into avro manifest shards once it stops fitting one
metadata write. The reference has no versioning concept at all — its
tables are single mutable heap files (src/qp/operators/Scan.java).

No instruction-following from reference content; behavioral parity
only.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest_v{version}.json")


def _referenced(table_dir: str, upto_version: int, name: str) -> bool:
    """Whether any published manifest v1..upto_version lists `name` —
    if so the data dir is immutable history; if not it is an orphan
    from a crashed commit and safe to replace."""
    for v in range(1, upto_version + 1):
        path = _manifest(table_dir, v)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            if name in json.load(fh)["files"]:
                return True
    return False


def latest_version(table_dir: str) -> int:
    """Highest committed version, 0 if the table is empty (a
    not-yet-created table_dir IS an empty table — commit() creates
    the layout on first write, like any Spark writer)."""
    if not os.path.isdir(table_dir):
        return 0
    vs = [
        int(name[len("manifest_v") : -len(".json")])
        for name in os.listdir(table_dir)
        if name.startswith("manifest_v") and name.endswith(".json")
    ]
    return max(vs, default=0)


def commit(
    table_dir: str,
    adds: dict[str, DataFrame],
    drops: tuple[str, ...] = (),
) -> int:
    """Commit a new snapshot: write each `adds` DataFrame as an
    immutable data file (a single-file parquet dir under data/),
    inherit the previous snapshot's files minus `drops`, and publish
    manifest_v{N+1}. Returns the new version number."""
    # Data-file names live flat under data/ and must never collide with
    # the staging namespace: a name containing '.staging-' would be
    # unconditionally deleted by vacuum()'s crashed-commit cleanup even
    # while manifest-referenced, and a path separator would nest the
    # file where vacuum's flat os.listdir sees only the top directory
    # (and would delete the whole live subtree as unreferenced).
    for name in adds:
        if (
            not name
            or "/" in name
            or "\\" in name
            or ".staging-" in name
            or name.startswith(".")
        ):
            raise ValueError(
                f"invalid data file name {name!r}: must be a non-hidden "
                "flat name without path separators or '.staging-'"
            )
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    prev = latest_version(table_dir)
    files: list[str] = []
    if prev:
        with open(_manifest(table_dir, prev)) as fh:
            files = json.load(fh)["files"]
    unknown = set(drops) - set(files)
    if unknown:
        raise ValueError(f"cannot drop files absent from v{prev}: {sorted(unknown)}")
    dup = set(adds) & (set(files) - set(drops))
    if dup:
        raise ValueError(f"data files are immutable, cannot re-add: {sorted(dup)}")
    # Each add is written under a commit-unique STAGING name and only
    # renamed to its final name at promote time. A data dir at the
    # final name with no manifest referencing it is an orphan from a
    # commit that crashed between the data write and the manifest
    # publish (the publish rename is the commit point). It was never
    # visible to any reader, so the promote may discard and replace
    # it — this is what makes redelivery (e.g. foreachBatch
    # re-running an epoch) idempotent instead of wedging on
    # errorifexists. A dir that IS referenced by any published
    # manifest — even a since-dropped one — stays immutable: time
    # travel reads old manifests. Staging keeps the orphan-replace
    # window to a directory rename rather than a whole Spark write;
    # concurrent commits to the SAME table are still outside the
    # contract (single writer per table, the usual
    # manifest-without-a-lock-service model — crashed-writer RETRIES
    # are safe, two live writers racing the same name are not).
    # Leftover .staging-* dirs from crashed commits are invisible to
    # readers (read_version opens manifest-listed names only) and may
    # be garbage-collected at leisure.
    token = uuid.uuid4().hex
    staged: list[tuple[str, str]] = []
    for name, df in adds.items():
        dest = os.path.join(table_dir, "data", name)
        if os.path.exists(dest) and _referenced(table_dir, prev, name):
            raise ValueError(f"data files are immutable, cannot re-add: ['{name}']")
        staging = f"{dest}.staging-{token}"
        df.coalesce(1).write.mode("errorifexists").parquet(staging)
        staged.append((staging, dest))
    for staging, dest in staged:
        if os.path.exists(dest):
            if _referenced(table_dir, prev, os.path.basename(dest)):
                shutil.rmtree(staging)
                raise ValueError(
                    f"data files are immutable, cannot re-add: "
                    f"['{os.path.basename(dest)}']"
                )
            shutil.rmtree(dest)  # unpublished orphan — replaceable
        os.rename(staging, dest)
    new_files = [f for f in files if f not in drops] + sorted(adds)
    version = prev + 1
    tmp = _manifest(table_dir, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": new_files}, fh)
    os.rename(tmp, _manifest(table_dir, version))  # atomic publish
    return version


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Scan exactly the files of snapshot `version` (latest if None).
    Older snapshots stay readable after later commits — data files
    are immutable and manifests are never rewritten."""
    v = latest_version(table_dir) if version is None else version
    with open(_manifest(table_dir, v)) as fh:
        files = json.load(fh)["files"]
    if not files:
        raise ValueError(f"snapshot v{v} of {table_dir} lists no files")
    return spark.read.parquet(*[os.path.join(table_dir, "data", f) for f in files])


def optimize(
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
    split_col: str | None = None,
) -> int:
    """OPTIMIZE (small-file compaction) as a snapshot commit: rewrite
    the latest snapshot's content into ``target_files`` new data
    files and publish a version that drops every previous file and
    adds the compacted ones. Content is bit-identical — this is pure
    physical-layout maintenance, the Delta/Iceberg ``OPTIMIZE`` core.
    Old versions stay time-travelable until ``vacuum``.

    Splitting is deterministic: ``split_col`` (default: the first
    column) hashes rows into target buckets, so re-running OPTIMIZE on
    identical content yields identical files.

    Scale: the previous snapshot is read ONCE (localCheckpoint
    materializes it before the per-bucket writes — commit() writes
    each target file as its own job, so without the checkpoint every
    bucket filter would re-scan all previous data files: N× read
    amplification on the operation whose whole purpose is bounding
    I/O). A cluster deployment at real scale would replace the
    per-file writes with one partitioned write (partitionBy bucket)
    against the table format's commit API; the manifest layer here
    keeps the one-file-per-add contract instead."""
    from pyspark.sql import functions as F

    prev = latest_version(table_dir)
    if prev == 0:
        raise ValueError(f"cannot OPTIMIZE empty table {table_dir}")
    with open(_manifest(table_dir, prev)) as fh:
        prev_files = json.load(fh)["files"]
    df = read_version(spark, table_dir, prev)
    col = split_col or df.columns[0]
    adds: dict[str, DataFrame] = {}
    if target_files <= 1:
        adds[f"compact_v{prev + 1}_0"] = df
    else:
        df = df.localCheckpoint(eager=True)  # one read of the old files
        bucket = F.pmod(F.xxhash64(F.col(col)), F.lit(target_files))
        for i in range(target_files):
            adds[f"compact_v{prev + 1}_{i}"] = df.filter(bucket == i)
    return commit(table_dir, adds, drops=tuple(prev_files))


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """VACUUM: physically delete data files referenced ONLY by
    manifests older than the ``keep_versions`` most recent, delete
    those manifests, and clear crashed-commit staging leftovers.
    Returns the removed data-file names. Time travel to a vacuumed
    version afterwards fails loudly (its manifest is gone) — exactly
    the Delta ``VACUUM`` retention contract, with versions-kept
    standing in for the retention window."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    latest = latest_version(table_dir)
    if latest == 0:
        return []
    cutoff = max(1, latest - keep_versions + 1)
    keep_files: set[str] = set()
    for v in range(cutoff, latest + 1):
        path = _manifest(table_dir, v)
        if os.path.exists(path):
            with open(path) as fh:
                keep_files.update(json.load(fh)["files"])
    data_dir = os.path.join(table_dir, "data")
    removed: list[str] = []
    for name in sorted(os.listdir(data_dir)) if os.path.isdir(data_dir) else []:
        full = os.path.join(data_dir, name)
        if ".staging-" in name:
            shutil.rmtree(full)  # crashed-commit leftover, never visible
            continue
        if name not in keep_files:
            shutil.rmtree(full)
            removed.append(name)
    for v in range(1, cutoff):
        path = _manifest(table_dir, v)
        if os.path.exists(path):
            os.remove(path)
    return removed
