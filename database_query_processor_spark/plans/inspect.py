"""Plan inspection: programmatic access to the physical plan
properties that matter at scale.

The reference's introspection is Debug.PPrint tree dumps
(src/qp/operators/Debug.java:80-134). Here the interesting facts are
Catalyst's choices — where the exchanges are, what reached the scan,
what stayed in codegen — surfaced as plain Python so tests and users
can assert on them (tests/test_plans.py, tests/test_layout.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The df.explain output as a string (modes: simple, extended,
    codegen, cost, formatted)."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTRIBUTING shuffle exchanges in the plan. Two
    deliberate exclusions: broadcast exchanges (they move dims, not
    data volume) and `Exchange SinglePartition` (a global collapse —
    gates assert its ABSENCE via 'SinglePartition' checks, so counting
    it here would double-book the same plan property)."""
    # \bExchange\b does not match inside "BroadcastExchange" (no word
    # boundary between 't' and 'E'), so this counts shuffles only.
    plan = explain_str(df, "simple")
    return len(re.findall(r"\bExchange\b(?! SinglePartition)", plan))


def _split_depth0(s: str) -> list[str]:
    """Split a filter list on commas at bracket depth 0 only —
    parameterized filters (EqualTo(a,x), In(a,[1,2])) carry commas of
    their own and must come back whole."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the data source (parquet row-group /
    page-level pruning)."""
    plan = explain_str(df, "formatted")
    out: list[str] = []
    for ln in plan.splitlines():
        if "PushedFilters:" in ln:
            body = ln.split("PushedFilters:", 1)[1].strip()
            if body.startswith("[") and body != "[]":
                out.extend(p for p in _split_depth0(body[1:-1]) if p)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Per-scan ReadSchema strings — what each source actually reads
    (column pruning evidence)."""
    plan = explain_str(df, "formatted")
    return [
        ln.split("ReadSchema:", 1)[1].strip()
        for ln in plan.splitlines()
        if "ReadSchema:" in ln
    ]


def join_strategies(df: DataFrame) -> list[str]:
    plan = explain_str(df, "simple")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def uses_python(df: DataFrame) -> bool:
    """True if any Python-evaluation operator appears (row-at-a-time
    UDF or pandas path) — the hot-path smell the plan gates forbid
    outside explicitly-pandas operators."""
    plan = explain_str(df, "simple")
    return any(
        m in plan
        for m in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )


def audit(df: DataFrame) -> dict:
    """One-call scale audit of a plan."""
    return {
        "exchanges": count_exchanges(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "join_strategies": join_strategies(df),
        "uses_python": uses_python(df),
    }
