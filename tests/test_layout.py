"""Physical layout: bucketed joins must be exchange-free, partitioned
reads must prune. These are the at-scale claims in SCALE.md, asserted
on real plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.plans.inspect import explain_str
from database_query_processor_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, df, mode: str = "simple") -> str:
    return explain_str(df, mode)


def test_bucketed_join_is_exchange_free(spark):
    """orders⋈lineitem both bucketed on the join key: the sort-merge
    join must consume bucket outputs directly — no Exchange on either
    side."""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"),
                   "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "t_lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(spark, j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_agg_is_exchange_free(spark):
    """groupBy on the bucket key reuses the bucket partitioning."""
    orders = load_table(spark, SF, "orders")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"),
                   "t_orders_b2", ["o_orderkey"], 8)
    try:
        agg = spark.table("t_orders_b2").groupBy("o_orderkey").agg(
            F.count("*").alias("n")
        )
        plan = _plan(spark, agg)
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b2")


def test_partitioned_read_prunes(spark, tmp_path):
    """A filter on the partition column must show up as a
    PartitionFilter and reduce the files read."""
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])
    filtered = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(spark, filtered, "formatted")
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    # pruned scan returns exactly the clicks
    n_clicks = events.filter(F.col("event_type") == "click").count()
    assert filtered.count() == n_clicks


def _file_ranges(path, col):
    """(min, max) of ``col`` per data file, from parquet footer stats."""
    import glob as g

    import pyarrow.parquet as pq

    out = []
    for f in sorted(g.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((f, lo, hi))
    return out


def test_compaction_produces_few_disjoint_sorted_files(spark, tmp_path):
    """compact() must collapse a 64-fragment table into target_files
    range-partitioned files whose ts ranges are pairwise DISJOINT —
    that disjointness is what turns a ts predicate into file-level
    skipping after compaction."""
    from database_query_processor_spark.sources.layout import compact

    e = load_table(spark, SF, "events").select("event_id", "ts", "value")
    frag = str(tmp_path / "frag")
    e.repartition(64).write.parquet(frag)
    import glob as g

    assert len(g.glob(f"{frag}/part-*.parquet")) == 64
    out = str(tmp_path / "compacted")
    compact(spark.read.parquet(frag), out, "ts", target_files=4)
    ranges = _file_ranges(out, "ts")
    assert len(ranges) <= 4
    spans = sorted((lo, hi) for _, lo, hi in ranges if lo is not None)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, spans
    # content preserved
    assert spark.read.parquet(out).count() == e.count()


def test_zorder_skips_more_files_than_linear_sort_on_2d_box(spark, tmp_path):
    """The data-skipping claim behind src10: for a predicate on BOTH
    dimensions, a Z-ordered layout must leave fewer files whose
    (user_id) footer range overlaps the box than a pure ts-sorted
    layout with the same file count (where user_id is scattered
    everywhere, so every file overlaps)."""
    from database_query_processor_spark.sources.layout import write_zordered

    e = load_table(spark, SF, "events").select("event_id", "ts", "user_id")
    b = e.withColumn("_hour", (F.unix_timestamp("ts") / 3600).cast("long"))
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(b, zpath, "user_id", "_hour", files=8)
    (
        b.repartitionByRange(8, "ts").sortWithinPartitions("ts")
        .write.parquet(lpath)
    )

    def overlapping(path, lo, hi):
        return sum(
            1
            for _, mn, mx in _file_ranges(path, "user_id")
            if mn is not None and not (mx < lo or mn > hi)
        )

    n_files = len(_file_ranges(lpath, "user_id"))
    box_lo, box_hi = 0, 3  # sf0.001 has user_id 0..14; box = bottom quarter
    z_hit = overlapping(zpath, box_lo, box_hi)
    l_hit = overlapping(lpath, box_lo, box_hi)
    assert l_hit == n_files  # 1-D sort scatters user_id: no skipping
    assert z_hit < l_hit, (z_hit, l_hit)


def test_bloom_filter_written_and_skips(spark, tmp_path):
    """The data-skipping claim behind src15: on a layout where user_id
    is scattered (hash-distributed on event_id), footer min/max stats
    cannot prune a point lookup — every file's range contains the
    probe — but the split-block bloom filter (a) exists for the
    indexed column, (b) hits for a present key in at least one file,
    and (c) proves absence of an out-of-domain key in EVERY file,
    which is exactly the row-group skip decision parquet-mr's reader
    makes. Probes hash the plain-encoded (little-endian int64) value,
    matching the writer's hashing of INT64 columns."""
    import glob
    import struct

    out = str(tmp_path / "bloom")
    e = load_table(spark, SF, "events").select("event_id", "ts", "user_id", "value")
    (
        e.repartition(4, "event_id")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        .option("parquet.bloom.filter.expected.ndv#user_id", "100000")
        .option("parquet.enable.dictionary#user_id", "false")
        .parquet(out)
    )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def probe(bf, v):
        b = jvm.org.apache.parquet.io.api.Binary.fromConstantByteArray(
            bytearray(struct.pack("<q", v))
        )
        return bf.findHash(bf.hash(b))

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    present_hits, absent_hits, stat_prunable = 0, 0, 0
    for f in files:
        inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        r = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
        try:
            blocks = r.getFooter().getBlocks()
            for bi in range(blocks.size()):
                cols = blocks.get(bi).getColumns()
                chunk = next(
                    cols.get(ci)
                    for ci in range(cols.size())
                    if cols.get(ci).getPath().toDotString() == "user_id"
                )
                assert chunk.getBloomFilterOffset() >= 0, f
                st = chunk.getStatistics()
                mn, mx = st.genericGetMin(), st.genericGetMax()
                if not (mn <= 7 <= mx):  # stats could prune the probe
                    stat_prunable += 1
                bf = r.readBloomFilter(chunk)
                if probe(bf, 7):
                    present_hits += 1
                if probe(bf, 10**9 + 7):
                    absent_hits += 1
        finally:
            r.close()
    assert stat_prunable == 0  # min/max never helps on this layout
    assert present_hits >= 1  # present key found
    assert absent_hits == 0  # absent key: bloom skips every row group


def test_src09_hash_fragmenter_populates_all_64_fragments(spark):
    """src09's fragment step hash-splits on xxhash64(event_id) instead
    of keyless repartition(64) (which pays a sortBeforeRepartition
    local sort of every input row). The full-entropy key must keep the
    scenario intact: exactly 64 NON-EMPTY fragments (hashing a 64-value
    bucket column instead would leave ~1/e of partitions empty)."""
    e = load_table(spark, SF, "events").select("event_id")
    parts = (
        e.repartition(64, F.xxhash64("event_id"))
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count()
    )
    rows = parts.collect()
    assert len(rows) == 64
    assert min(r["count"] for r in rows) >= 1
