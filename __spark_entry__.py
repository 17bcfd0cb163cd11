"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full declared workload (see
database_query_processor_spark/workload/ — one QuerySpec per
capability in SURVEY.md §2 + completions + extensions). The driver
runs each Spark query against its DuckDB oracle at sf0.01 and
hash-compares (row count + schema + order-insensitive value hash).

Verification-budget routing lives HERE (harness policy, not library
behavior — the library's all_specs() is fixed declaration order):
the driver verifies a bounded prefix of queries() per round, so we
order (1) queries with no green driver row yet — highest-risk
families first — then (2) previously-green queries rotated by round
count, so every green query is periodically re-verified and a
regression cannot hide forever behind its old green row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from database_query_processor_spark.workload import QuerySpec, all_specs

# Highest-risk-first ordering for the not-yet-verified block: streaming
# topologies, source/sink round-trips, the reference dialect, temporal
# ops, then the lower-risk TPC-H/completions tail.
_RISK_PREFIXES = ("s0", "src", "d0", "d1", "t0", "t1", "x", "c", "p")


def _latest_green() -> set[str]:
    """Names whose LATEST driver CORRECTNESS row is hash-green.

    Later rounds override earlier ones per query, so a query that
    regresses in round N re-enters the front of the sweep in round
    N+1 even if round N-1 had it green."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent
    reports = []
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.stem)
        if m:
            reports.append((int(m.group(1)), p))
    latest: dict[str, bool] = {}
    for _, report in sorted(reports):
        try:
            data = json.loads(report.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if isinstance(row, dict):
                latest[name] = bool(row.get("hash_match"))
    return {name for name, ok in latest.items() if ok}


def _sweep_order() -> list[QuerySpec]:
    specs = all_specs()
    green = _latest_green()

    def risk(s: QuerySpec) -> int:
        # Rows-only-by-design queries (no oracle) can never turn green,
        # so they sort LAST in the front block: a permanent rows-only
        # check must not displace a convertible query from the
        # driver's bounded verification budget.
        if s.oracle is None:
            return len(_RISK_PREFIXES) + 1
        for i, pre in enumerate(_RISK_PREFIXES):
            if s.name.startswith(pre):
                return i
        return len(_RISK_PREFIXES)

    front = sorted((s for s in specs if s.name not in green), key=risk)
    back = [s for s in specs if s.name in green]
    # Rotate the green block by a round-dependent stride so successive
    # rounds re-verify different green queries with leftover budget.
    import re
    from pathlib import Path

    n_rounds = len(
        [p for p in Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")
         if re.search(r"r(\d+)", p.stem)]
    )
    if back:
        k = (17 * n_rounds) % len(back)
        back = back[k:] + back[:k]
    return front + back


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 4-way join + range
    band + ORDER BY (reference testcases/query10.sql shape)."""
    from pyspark.sql import functions as F

    from database_query_processor_spark.workload.parity import join4_band

    return join4_band(spark, "/root/testdata/sf0.001").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {spec.name: spec.build for spec in _sweep_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    non-SQL-expressible ops — driver records rows-only checks there)."""
    return {spec.name: spec.oracle for spec in _sweep_order() if spec.oracle is not None}
