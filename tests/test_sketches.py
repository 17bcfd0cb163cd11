"""Sketch aggregates: approx_count_distinct (HLL++) has no
cross-engine oracle (sketch internals differ), so its correctness
check is an error bound against the exact count — the contract that
makes it usable as the 100 TB distinct-count path."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF, "lineitem")
    row = (
        li.agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
            F.count_distinct("l_partkey").alias("exact"),
        )
    ).first()
    rel_err = abs(row.approx - row.exact) / row.exact
    # rsd=0.01 → ~1% standard deviation; 5% is a generous hard bound
    assert rel_err < 0.05, (row.approx, row.exact, rel_err)


def test_grouped_approx_matches_exact_ordering(spark):
    """Grouped sketch counts must preserve the coarse structure: same
    groups, each within the error bound."""
    li = load_table(spark, SF, "lineitem")
    approx = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("n"))
        .collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05, (k, approx[k], exact[k])


def test_approx_percentile_within_rank_error(spark):
    """c24's GK-sketch percentiles: each approximate quantile must sit
    within ±1% RANK distance of the requested quantile in the exact
    sorted order (accuracy=10000 → ε=1/10000; 1% is a generous hard
    bound covering partition merge loss)."""
    li = load_table(spark, SF, "lineitem")
    qs = [0.25, 0.5, 0.75, 0.9]
    approx = li.agg(
        F.percentile_approx("l_extendedprice", qs, 10000).alias("a")
    ).first().a
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    n = len(vals)
    for q, a in zip(qs, approx):
        import bisect

        rank = bisect.bisect_left(vals, a) / n
        assert abs(rank - q) <= 0.01, (q, a, rank)


def test_hll_sketch_rollup_error_bound(spark):
    """Daily estimates from union-merged hourly HLL sketches must
    track exact per-day COUNT(DISTINCT) within the lgConfigK=12
    error envelope (~1.6% rsd; assert 5% = ~3 sigma)."""
    from database_query_processor_spark.workload.completions import hll_daily_estimates

    approx = {
        r["day"]: r["approx_users"]
        for r in hll_daily_estimates(load_table(spark, SF, "events")).collect()
    }
    e = load_table(spark, SF, "events")
    exact = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for m, est in approx.items():
        assert abs(est - exact[m]) / exact[m] < 0.05, (m, est, exact[m])


def test_hll_merge_equals_direct_sketch(spark):
    """Union of daily sketches must estimate the same as one sketch
    built over the whole month — mergeability is what makes the
    incremental rollup valid."""
    e = load_table(spark, SF, "events")
    direct = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est"))
    )
    from database_query_processor_spark.workload.completions import hll_daily_estimates

    merged = hll_daily_estimates(e)
    d = {r["day"]: r["est"] for r in direct.collect()}
    m = {r["day"]: r["approx_users"] for r in merged.collect()}
    assert d == m


def test_kll_rollup_rank_error(spark):
    """Daily p50/p95 from folded hourly KLL sketches must sit within
    a small RANK error of exact: the value at the estimated rank may
    differ, but its true rank must be within epsilon of the target
    (k=200 -> eps ~1.3%; assert 3%)."""
    from database_query_processor_spark.workload.completions import kll_daily_quantiles

    e = load_table(spark, SF, "events")
    approx = {r["day"]: (r["median_value"], r["p95_value"])
              for r in kll_daily_quantiles(e).collect()}
    rows = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .collect()
    )
    for r in rows:
        vals = r["vals"]
        n = len(vals)
        for target, est in zip((0.5, 0.95), approx[r["day"]]):
            import bisect
            rank = bisect.bisect_right(vals, est) / n
            assert abs(rank - target) < 0.03, (r["day"], target, est, rank)


def test_theta_set_ops_track_exact(spark):
    """Theta intersection/difference estimates vs exact set sizes: at
    150 distinct users the sketch (default lgK=12, 4096 slots) is in
    exact mode — estimates must equal the true counts."""
    from database_query_processor_spark.workload.completions import theta_estimates

    e = load_table(spark, SF, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    row = theta_estimates(e).collect()[0]
    click = {r["user_id"] for r in e.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    buy = {r["user_id"] for r in e.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    assert round(row["both"]) == len(click & buy), (row["both"], len(click & buy))
    assert round(row["click_only"]) == len(click - buy), (row["click_only"], len(click - buy))
