"""ETL-surface workload: the reference's datagen path exposed as a
declared capability (RandomDB, src/RandomDB.java:17-176 → distributed
deterministic generation in sources/randomdb.py).

Rows-only check: the non-key columns derive from xxhash64, which
DuckDB lacks — the generator's invariants (PK uniqueness, ranges,
charset, partitioning-independence) are pinned exactly in
tests/test_sources.py instead.
"""

from __future__ import annotations

from database_query_processor_spark.sources import generate_table, parse_det
from database_query_processor_spark.workload import QuerySpec

# Same layout as the reference's testcases/CUSTOMER.det:1-7.
_ACCOUNT_DET = """\
4
32
aid INTEGER 50000 PK 4
branch INTEGER 16 NK 4
owner STRING 8 NK 16
balance REAL 1000 NK 4
"""


def randomdb_generate(spark, sf_dir):
    """Generate 10k rows of the ACCOUNT spec — scan-free pure-map
    datagen (sf_dir unused: the generator is its own source)."""
    return generate_table(spark, parse_det(_ACCOUNT_DET), 10_000, seed=42)


SPECS = [
    QuerySpec("src01_randomdb_generate", randomdb_generate, None,
              "distributed .det-spec datagen (RandomDB equivalent): "
              "deterministic hash cells, affine-permutation PKs"),
]
