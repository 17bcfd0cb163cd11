"""Iterative graph analytics over relational edge sets.

Beside `operators/corpus.py:connected_components` (min-label
propagation for dedup-cluster resolution), this module holds the
numeric-iteration family — algorithms whose per-round state is a
weighted score rather than a label. No reference analog (the
reference has no iteration construct at all; its one loop is the
optimizer's annealing walk, /root/reference/src/qp/optimizer/
RandomOptimizer.java:126-216, which SURVEY §4.3 delegates to
Catalyst).

Cross-engine determinism: PageRank's per-round update is a SUM of
per-edge contributions — as floating-point that sum is
order-dependent and would never hash-match another engine. All
arithmetic here is FIXED-POINT over BIGINT (scale 1e12): integer
sums are associative, so Spark's unordered shuffle reduce and
DuckDB's sequential aggregate produce bit-identical ranks. The cost
is deterministic floor-rounding per edge — bounded by
edges/SCALE ≈ 1e-12-per-unit error, far below anything a ranking
consumer can observe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

PR_SCALE = 10**12  # fixed-point scale for rank mass
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as a ratio
PR_ITERS = 5


def pagerank_fixedpoint(
    edges: DataFrame, iters: int = PR_ITERS, scale: int = PR_SCALE
) -> DataFrame:
    """PageRank over an UNDIRECTED edge set (id_a, id_b), fixed
    iteration count, fixed-point arithmetic. Returns
    (node_id, rank) with rank in units of 1/`scale`.

    Every round is one shuffle: contributions flow src→dst over the
    symmetrized edge list (rank DIV degree per edge — integer floor),
    are summed per dst (bigint, order-free), then damped:

        r'(v) = (15·scale/100) DIV n  +  (85·Σ contrib(v)) DIV 100

    Nodes = every endpoint of an edge; an undirected graph has no
    dangling nodes (degree ≥ 1), so no leaked-mass correction term
    is needed. Per-round `localCheckpoint` keeps lineage O(1), the
    connected_components pattern. At 100 TB the edge list is the
    only large operand — it is hash-partitioned once on src and
    every round's join reuses that partitioning; ranks are
    node-cardinality (small side) and broadcast while they fit."""
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node_id"))
    n = nodes.count()
    base = (15 * scale // 100) // n
    ranks = nodes.select("node_id", F.lit(scale // n).alias("rank"))
    for _ in range(iters):
        contrib = (
            sym.join(deg, "src")
            .join(ranks, sym.src == ranks.node_id)
            .select("dst", F.expr("rank DIV deg").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = nodes.join(
            incoming, nodes.node_id == incoming.dst, "left"
        ).select(
            "node_id",
            (
                F.lit(base)
                + F.expr(
                    f"({PR_DAMP_NUM} * coalesce(inc, 0L)) DIV {PR_DAMP_DEN}"
                )
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def sql_pagerank(edges_sql: str, iters: int = PR_ITERS, scale: int = PR_SCALE) -> str:
    """DuckDB oracle mirroring pagerank_fixedpoint bit-for-bit: the
    fixed iteration count unrolls into one CTE stage per round
    (aggregation inside a recursive member is restricted; unrolling
    sidesteps it and keeps the oracle pure SQL)."""
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS (SELECT id_a AS src, id_b AS dst FROM e
                   UNION SELECT id_b, id_a FROM e)""",
        "deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src)",
        "n AS (SELECT count(*) AS n FROM deg)",
        f"""r0 AS (SELECT src AS node_id, {scale} // n AS rank FROM deg, n)""",
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
  SELECT d.src AS node_id,
         ((15 * {scale} // 100) // n)
           + ({PR_DAMP_NUM} * coalesce(inc, 0)) // {PR_DAMP_DEN} AS rank
  FROM deg d CROSS JOIN n
  LEFT JOIN (SELECT dst, sum(c) AS inc FROM (
               SELECT s.dst, r.rank // d2.deg AS c
               FROM sym s JOIN deg d2 ON s.src = d2.src
                          JOIN r{i} r ON s.src = r.node_id) GROUP BY dst) t
    ON d.src = t.dst)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node_id, CAST(rank AS BIGINT) AS rank FROM r{iters}"
    )
