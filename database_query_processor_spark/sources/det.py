"""`.det` table-definition parser.

The reference describes each table in a text spec consumed by its
datagen (format parsed at src/RandomDB.java:41-111; examples
testcases/CUSTOMER.det:1-7, experiment/FLIGHTS.det:1-8):

    line 1: number of columns
    line 2: tuple size in bytes
    then per column: ``name TYPE range KEY bytes``

with TYPE ∈ {INTEGER, STRING, REAL}, KEY ∈ {PK, FK, NK}. For STRING
columns ``range`` is the string length; for numeric columns it is the
exclusive upper bound of the uniform value range.

We keep the spec as the human-facing table description but map it to
a self-describing StructType — the serialized `<T>.md` Schema sidecar
(src/RandomDB.java:112-115) has no Spark analog because parquet
carries its own schema.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_TYPES = {"INTEGER": IntegerType(), "STRING": StringType(), "REAL": FloatType()}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    coltype: str  # INTEGER | STRING | REAL
    range: int  # value upper bound (numeric) or string length
    keytype: str  # PK | FK | NK
    bytes: int


@dataclass(frozen=True)
class TableSpec:
    columns: tuple[ColumnSpec, ...]
    tuple_bytes: int

    @property
    def schema(self) -> StructType:
        # Reference semantics: no NULLs exist anywhere in its data
        # model (SURVEY.md §1.2), so generated/ingested columns are
        # non-nullable.
        return StructType(
            [StructField(c.name, _TYPES[c.coltype], nullable=False) for c in self.columns]
        )

    @property
    def primary_key(self) -> str | None:
        for c in self.columns:
            if c.keytype == "PK":
                return c.name
        return None


def parse_det(text: str) -> TableSpec:
    """Parse `.det` content. Mirrors the reference's tokenizer loop
    (src/RandomDB.java:62-111): whitespace-split lines, strict types,
    unknown TYPE is an error."""
    lines = [ln for ln in (raw.strip() for raw in text.splitlines()) if ln]
    num_cols = int(lines[0])
    tuple_bytes = int(lines[1])
    cols = []
    for ln in lines[2 : 2 + num_cols]:
        name, coltype, rng, keytype, nbytes = ln.split()[:5]
        if coltype not in _TYPES:
            raise ValueError(f"invalid data type {coltype!r} in det line {ln!r}")
        if keytype not in ("PK", "FK", "NK"):
            raise ValueError(f"invalid key type {keytype!r} in det line {ln!r}")
        cols.append(ColumnSpec(name, coltype, int(rng), keytype, int(nbytes)))
    if len(cols) != num_cols:
        raise ValueError(f"det declares {num_cols} columns, found {len(cols)}")
    return TableSpec(columns=tuple(cols), tuple_bytes=tuple_bytes)


def parse_det_file(path: str) -> TableSpec:
    with open(path, encoding="utf-8") as fh:
        return parse_det(fh.read())
