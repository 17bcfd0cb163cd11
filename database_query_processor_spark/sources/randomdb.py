"""Distributed synthetic datagen from a `.det` spec — the reference's
RandomDB re-designed for scale.

The reference generates rows in a single driver loop with
`java.util.Random`, tracking PK uniqueness in an in-memory occupancy
bitmap and FK distincts in a HashSet (src/RandomDB.java:117-175) —
O(range) driver memory and zero parallelism. Here generation is a
pure map over ``spark.range(n)``: every cell is a deterministic
function of (row id, column name, seed), so the output is identical
for any partitioning / executor count, needs no driver state, no
shuffle, and scales to billions of rows.

Value semantics mirror the reference:
  * PK INTEGER: unique values in [0, range) — reference: rejection
    sampling against a bitmap (src/RandomDB.java:127-132); here an
    affine permutation ``(a*id + b) mod range`` with gcd(a, range)=1,
    which is exactly unique with no coordination.
  * non-key INTEGER: uniform in [0, range)
    (src/RandomDB.java:133-139).
  * REAL: uniform in [0, range) (src/RandomDB.java:122-123).
  * STRING: random lowercase a-z of length ``range``
    (src/RandomDB.java:179-184).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_query_processor_spark.sources.det import ColumnSpec, TableSpec


def _coprime(range_: int, seed: int) -> int:
    """Smallest multiplier ≥ the seed-derived candidate that is
    coprime with ``range_`` (stride of the PK permutation)."""
    a = (seed * 2654435761 + 1) % range_ or 1
    while math.gcd(a, range_) != 1:
        a += 1
    return a


def _u32(*cols) -> F.Column:
    """Deterministic uniform 32-bit value from the given columns."""
    return F.xxhash64(*cols).bitwiseAND(F.lit(0xFFFFFFFF))


def _column(c: ColumnSpec, seed: int) -> F.Column:
    rid = F.col("id")
    salt = F.lit(f"{c.name}:{seed}")
    if c.coltype == "INTEGER" and c.keytype == "PK":
        # per-column seed: (seed, range) alone made two same-range PK
        # columns byte-identical; hashing the column name keeps each
        # an independent permutation (a stays coprime -> bijective).
        # A real hash, not sum(name.encode()): byte sums are
        # order-insensitive, so anagram column names (AID/DIA) would
        # still collide into identical key streams.
        import zlib

        col_seed = seed + zlib.crc32(f"{c.name}:{seed}".encode())
        a = _coprime(c.range, col_seed)
        b = (col_seed * 40503) % c.range
        return ((rid * a + F.lit(b)) % F.lit(c.range)).cast("int")
    if c.coltype == "INTEGER":
        return (_u32(rid, salt) % F.lit(c.range)).cast("int")
    if c.coltype == "REAL":
        return (_u32(rid, salt) / F.lit(float(2**32)) * F.lit(float(c.range))).cast("float")
    # STRING of length c.range, chars a-z, one hash per position.
    # Length 0 is the empty string — sequence(0, -1) would count DOWN
    # (implicit step -1) and emit 2 chars.
    if c.range <= 0:
        return F.lit("")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(c.range - 1)),
            lambda j: F.char(F.lit(97) + _u32(rid, salt, j) % F.lit(26)),
        ),
        "",
    )


def generate_table(
    spark: SparkSession,
    spec: TableSpec,
    num_rows: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate ``num_rows`` rows for ``spec``. PK columns require
    ``num_rows <= range`` (same invariant the reference's bitmap
    sampler silently depends on — it would spin forever otherwise)."""
    for c in spec.columns:
        if c.keytype == "PK" and num_rows > c.range:
            raise ValueError(
                f"PK column {c.name}: num_rows={num_rows} exceeds key range {c.range}"
            )
    base = spark.range(0, num_rows, numPartitions=num_partitions)
    out = base.select(*[_column(c, seed).alias(c.name) for c in spec.columns])
    # Cast keeps det-declared types; non-null per reference data model.
    return out
