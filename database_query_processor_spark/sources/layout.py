"""Physical data layout: bucketing and partitioned writes.

The reference has one layout — a heap file of serialized tuples per
table (src/qp/operators/Scan.java:30-55); every join re-reads and
re-materializes (NestedJoin.java:69-93). At 100 TB, layout IS the
optimization:

  * **Bucketing** pre-shuffles a table ONCE at write time into N
    hash-buckets on the join/agg key. Two tables bucketed the same way
    join with ZERO exchange — the per-query shuffle the reference pays
    on every join disappears into the write. Use for fact tables
    joined repeatedly on the same key (orders⋈lineitem on orderkey).
  * **Partitioned writes** (`partitionBy`) turn predicates on the
    partition column into directory pruning — a filtered scan never
    opens non-matching files. Use for low-cardinality scan keys
    (date, event_type, ivf cell).

Both are asserted shuffle-free / pruned in tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Write as a bucketed (optionally sorted) catalog table. Joins and
    aggregations on bucket_cols against an equally-bucketed table run
    exchange-free; sortBy additionally removes the per-task sort for
    sort-merge joins."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Directory-partitioned parquet: predicates on partition_cols
    become PartitionFilters (pruning at file-listing time, before any
    I/O)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def compact(
    df: DataFrame,
    path: str,
    range_col: str,
    target_files: int = 4,
    max_records_per_file: int = 0,
) -> None:
    """Small-file compaction — the table-maintenance pass every
    streaming/incremental ingest needs: micro-batches and per-task
    writes leave thousands of KB-sized files, and at 100 TB the
    scan's task-scheduling and footer-reading overhead (one open +
    footer parse per file) comes to dominate actual I/O. Rewrite into
    ``target_files`` range-partitioned, internally sorted files:

      * `repartitionByRange(range_col)` gives files DISJOINT value
        ranges, so a range predicate prunes at the row-group/file
        level (min/max footer stats) — compaction doubles as
        coarse clustering;
      * `sortWithinPartitions` makes pages internally ordered for
        page-level stats and better encodings (delta, RLE);
      * `maxRecordsPerFile` caps file size instead of file count
        when rows-per-byte varies (0 = no cap).

    At cluster scale target_files derives from total bytes / 1 GB —
    see SCALE.md's layout recipe."""
    w = df.repartitionByRange(target_files, range_col).sortWithinPartitions(range_col)
    out = w.write.mode("overwrite")
    if max_records_per_file:
        out = out.option("maxRecordsPerFile", max_records_per_file)
    out.parquet(path)


ZORDER_BITS = 16


def zorder_key(col_a, col_b, bits: int = ZORDER_BITS):
    """Morton (Z-order) interleave of two already-bucketed non-negative
    int columns: bit i of each input lands at output bits 2i / 2i+1,
    so sorting by the key clusters BOTH dimensions at once — files get
    tight min/max footer ranges in a AND b, and a 2-D predicate prunes
    files that a single-column sort must read (a sort on ts leaves
    user_id scattered across every file).

    Pure JVM bitwise expression (2·bits static terms, whole-stage
    codegen); inputs must already be quantized to ``bits`` bits —
    callers bucket raw values first (e.g. epoch-hour, id >> k).
    This is the same clustering Delta/Iceberg expose as ZORDER BY /
    sort-order transforms, expressed with nothing but shifts."""
    from pyspark.sql import functions as F

    a = col_a.cast("long").bitwiseAND((1 << bits) - 1)
    b = col_b.cast("long").bitwiseAND((1 << bits) - 1)
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(1), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` clustered by the Morton key of (col_a, col_b):
    range-partition on z (disjoint z-ranges per file), sort within,
    drop the key. Read-back with predicates on either or both
    dimensions skips non-overlapping files via footer stats.

    Both columns are min-max normalized to ``bits`` bits first —
    interleaving RAW values gives whichever column has the wider
    magnitude all the high-order bits, degenerating to a 1-D sort on
    that column (a 4-bit user_id interleaved with a 17-bit epoch-hour
    is just an hour sort). Real ZORDER BY implementations interleave
    range-ranks for the same reason. The min/max pass is a 1-row
    aggregate, collected and folded into the scan-side expression —
    the same broadcast-stats shape as IVF's codebook."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(col_a).alias("amin"), F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"), F.max(col_b).alias("bmax"),
    ).first()
    if stats["amin"] is None or stats["bmin"] is None:
        # empty input (or all-NULL cluster column): nothing to
        # cluster — write as-is instead of TypeError on int(None)
        df.write.mode("overwrite").parquet(path)
        return
    top = (1 << bits) - 1

    def norm(col, lo, hi):
        span = max(int(hi) - int(lo), 1)
        # divide in DOUBLE before scaling: (col - lo) * top in long
        # arithmetic overflows once the value span exceeds ~1.4e14
        # (e.g. epoch-micros over a decade) — an ANSI ArithmeticException
        # under the session's pinned mode, or a silent wrap-to-0 curve
        # degeneration without it
        scaled = (
            (col.cast("long") - int(lo)).cast("double") / span * top
        ).cast("long")
        # clamp: int() truncation of fractional min/max plus double
        # rounding could nudge boundary rows past [0, top], where the
        # interleave mask would WRAP them to the far end of the curve
        return F.greatest(F.lit(0), F.least(F.lit(top), scaled))

    z = df.withColumn(
        "_z",
        zorder_key(
            norm(F.col(col_a), stats["amin"], stats["amax"]),
            norm(F.col(col_b), stats["bmin"], stats["bmax"]),
            bits,
        ),
    )
    (
        z.repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
