"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
build and the oracle SQL on the same parquet dir, sort columns by name,
and compare row count + values (exact; floats must be bit-equal under
the exact-decimal contract in operators/aggregates.py)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from database_query_processor_spark.catalog import TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written dataset (e.g. the sf1 scratch)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _align_dtypes(a: pd.DataFrame, b: pd.DataFrame) -> None:
    """When ONE side returns a column numerically and the other as
    objects (Spark DecimalType → decimal.Decimal objects vs DuckDB
    float64 is the common case), _canon would sort one side
    lexicographically and the other numerically — misaligning rows
    and reporting spurious diffs on identical data (or crashing on
    None). Coerce the object side to numeric IFF every non-null value
    parses AND every non-null value is an actual numeric object
    (decimal.Decimal / int / float) — genuinely-string columns, even
    numeric-looking ones like '0123', stay uncoerced on BOTH sides so
    string-vs-numeric engine drift still surfaces as a diff."""
    import decimal
    import numbers

    for c in a.columns:
        na = pd.api.types.is_numeric_dtype(a[c])
        nb = pd.api.types.is_numeric_dtype(b[c])
        if na == nb:
            continue
        obj = b if na else a
        nonnull = obj[c].dropna()
        if not all(
            isinstance(v, (decimal.Decimal, numbers.Number)) for v in nonnull
        ):
            continue
        coerced = pd.to_numeric(obj[c], errors="coerce")
        if coerced.notna().sum() == len(nonnull):
            obj[c] = coerced


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    probs: list[str] = []
    spdf = spark_df.toPandas()
    oracle_pdf = oracle_pdf.copy()
    if len(spdf) != len(oracle_pdf):
        probs.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        probs.append(f"columns: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return probs
    if probs:
        return probs
    _align_dtypes(spdf, oracle_pdf)
    a, b = _canon(spdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            bad = ~((av == bv) | (av.isna() & bv.isna()))
            if bad.any():
                i = bad.idxmax()
                diff = abs(av[i] - bv[i]) if not (math.isnan(av[i]) or math.isnan(bv[i])) else float("nan")
                probs.append(f"col {c}: {int(bad.sum())} diffs, first@{i}: {av[i]!r} vs {bv[i]!r} (|Δ|={diff})")
        else:
            if not av.astype(str).equals(bv.astype(str)):
                bad = av.astype(str) != bv.astype(str)
                i = bad.idxmax()
                probs.append(f"col {c}: {int(bad.sum())} diffs, first@{i}: {av[i]!r} vs {bv[i]!r}")
    return probs
