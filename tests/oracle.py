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


def duck_connect(sf_dir: str):
    """DuckDB connection with the standard table views registered.

    Big-scale sweeps set DUCKDB_MEMLIMIT (e.g. '48GB') so a quadratic
    oracle fails as a DuckDB exception (an ERROR row) instead of
    driving the host into the OOM killer; unset, DuckDB's default
    (80% of RAM) applies — the driver-mirror behavior. Shared by the
    pandas path (duckdb_run) and the big-scale path (hashed_compare)
    alike: hashed_compare is precisely the path used at the scales
    the OOM guard was added for."""
    con = duckdb.connect()
    lim = os.environ.get("DUCKDB_MEMLIMIT")
    if lim:
        con.execute(f"SET memory_limit='{lim}'")
        # An in-memory connection has NO temp_directory, so operators
        # that hit the limit FAIL with 'Failed to allocate block'
        # instead of spilling — the exact x50-at-sf10 ERROR rows in
        # SWEEP_SF10_TEXT_r09.txt. Give the limited connection a spill
        # path (bounded so a quadratic oracle still dies loudly rather
        # than filling the disk).
        # per-process spill path: concurrent oracle runners (the sf10
        # SF10T_SECTIONS sweeps) must not share one directory and one
        # budget, or a heavy section can starve a neighbor. The cap is
        # PER PROCESS, so N concurrent runners can spill N*cap —
        # DUCKDB_SPILL_BUDGET sizes it (total_disk_budget / n_runners)
        # when running more than the default single sweep; crashed
        # runners' dirs are reaped at the next connect (best-effort,
        # same tempdir, so orphans never accumulate past one sweep).
        import shutil
        import tempfile

        tmp = tempfile.gettempdir()
        for d in os.listdir(tmp):
            if d.startswith("dqps_duck_spill_"):
                try:
                    pid = int(d.rsplit("_", 1)[1])
                    os.kill(pid, 0)  # raises if that pid is gone
                except (ValueError, ProcessLookupError):
                    shutil.rmtree(os.path.join(tmp, d), ignore_errors=True)
                except PermissionError:
                    pass  # live pid owned by someone else: leave it
        spill = os.path.join(tmp, f"dqps_duck_spill_{os.getpid()}")
        os.makedirs(spill, exist_ok=True)
        import atexit

        atexit.register(shutil.rmtree, spill, ignore_errors=True)
        con.execute(f"SET temp_directory='{spill}'")
        budget = os.environ.get("DUCKDB_SPILL_BUDGET", "60GiB")
        con.execute(f"SET max_temp_directory_size='{budget}'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written dataset (e.g. the sf1 scratch)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    return duck_connect(sf_dir).execute(sql).fetchdf()


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


# --- streaming (in-engine) compare for results too large for pandas ---

_SEP = "\x1f"  # unit separator between canonicalized columns
_NULLS = "\x02N"  # NULL sentinel (concat_ws SKIPS null args in BOTH engines)


def _spark_canon(col, dtype):
    """Canonical string for one Spark column, by type. The per-type
    rules are mirrored EXACTLY by _duck_canon so both engines hash
    identical row strings:

    - integers / strings / dates: plain string cast (identical text).
    - doubles/floats/decimals: ROUND(x, 6) -> DECIMAL(28,6) -> string,
      both engines. 6 dp is EXACT for the relational family (the
      exact-decimal contract makes its float outputs 2-dp money), and
      cutting at 6 dp stays inside the ~16 reliable significant
      digits, where Spark's shortest-repr double->decimal conversion
      and DuckDB's binary-expansion conversion can diverge. Values
      whose INTEGER part alone approaches that boundary (|x| >= 1e9:
      9+ digits + 6 dp > 15) are rescaled FIRST — /1e6 (tag 'M'), or
      /1e12 for |x| >= 1e15 (tag 'T') — so the rounded total stays
      <= 15 significant digits, where both conversions are exact.
      The sf10 decade is what exposed this: c02's 2.8e11 sums are
      bit-identical doubles cross-engine, yet 6-dp canon strings
      diverged in digit 16+ (…415900 vs …415904). The branch is
      chosen from the same double in both engines, and the tag keeps
      a rescaled big value from ever colliding with a small value's
      plain string. Comparison strength for big values is ~12-15
      significant digits — far below any real engine divergence,
      far above ulp noise.
    - timestamps: epoch micros (cross-engine text formats differ).
    - booleans: int cast (text forms differ in case conventions).
    - binary: lowercase hex.
    Arrays/structs/maps are unsupported: those queries are small
    aggregates — keep them on the bit-exact pandas path."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = col.cast("double")
        six = lambda c: F.round(c, 6).cast("decimal(28,6)").cast("string")  # noqa: E731
        return (
            F.when(F.abs(d) >= 1e15, F.concat(F.lit("T"), six(d / 1e12)))
            .when(F.abs(d) >= 1e9, F.concat(F.lit("M"), six(d / 1e6)))
            .otherwise(six(d))
        )
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("string")
    if isinstance(dtype, T.BooleanType):
        return col.cast("int").cast("string")
    if isinstance(dtype, T.BinaryType):
        return F.lower(F.hex(col))
    if isinstance(dtype, (T.ArrayType, T.StructType, T.MapType)):
        raise ValueError(f"hashed compare: unsupported Spark type {dtype}")
    return col.cast("string")


def _duck_canon(name, type_name):
    """DuckDB expression mirroring _spark_canon for column ``name`` of
    DESCRIBE type ``type_name``."""
    t = type_name.upper()
    q = f'"{name}"'

    def _six(expr: str) -> str:
        # the magnitude-branched mirror of _spark_canon's float rule:
        # rescale before the 6-dp round so total significant digits
        # stay <= 15, where both engines' double->decimal conversions
        # are exact (see _spark_canon docstring / the c02-at-sf10 case).
        # The 6-dp round itself is VARCHAR-bridged, NOT ROUND():
        # Spark's F.round(double) rounds the SHORTEST-REPR decimal
        # (BigDecimal.valueOf) HALF_UP, while DuckDB's ROUND() rounds
        # the BINARY expansion — for a double whose shortest repr sits
        # exactly on a 6-dp half (x57-at-sf10's doc 91317, score
        # -1.0149445, binary a hair below the half) they split
        # (-1.014945 vs -1.014944) even though the engines' doubles
        # are bit-identical. DuckDB's double->VARCHAR is shortest-repr
        # and VARCHAR->DECIMAL rounds half-away-from-zero = HALF_UP,
        # so this bridge reproduces Spark's two-step exactly
        # (verified on half points, negative zero, exponent-notation
        # smalls; pinned in test_oracle_parity.py).
        # VERSION DEPENDENCY: the bridge assumes DuckDB's
        # double->VARCHAR is shortest-round-trip (true since ~0.9;
        # older DuckDB used %g-style formatting) and the JVM's
        # Double.toString is shortest-repr (true in spirit always,
        # exactly minimal since JDK 19's Ryu port — earlier JDKs
        # occasionally emit one extra digit). An engine upgrade that
        # breaks either silently re-opens the half-point seam;
        # test_hashed_compare_half_point_floats is the tripwire, and
        # this note is where to start when it fires.
        s = lambda e: f"CAST(CAST(CAST(({e}) AS VARCHAR) AS DECIMAL(28,6)) AS VARCHAR)"  # noqa: E731
        return (
            f"CASE WHEN abs({expr}) >= 1e15 THEN 'T' || {s(f'({expr}) / 1e12')} "
            f"WHEN abs({expr}) >= 1e9 THEN 'M' || {s(f'({expr}) / 1e6')} "
            f"ELSE {s(expr)} END"
        )

    if t.startswith("DECIMAL"):
        # DuckDB's direct DECIMAL->DOUBLE cast double-rounds
        # (int128/10^scale = two float roundings) and drifts 1 ulp at
        # >=16 significant digits — the exact c02-at-sf1 bug class.
        # Bridge through VARCHAR: string->double is correctly rounded
        # in both engines and equals Spark's BigDecimal.doubleValue.
        return _six(f"CAST(CAST({q} AS VARCHAR) AS DOUBLE)")
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return _six(f"CAST({q} AS DOUBLE)")
    if t.startswith("TIMESTAMP"):
        return f"CAST(epoch_us({q}) AS VARCHAR)"
    if t == "BOOLEAN":
        return f"CAST(CAST({q} AS INT) AS VARCHAR)"
    if t == "BLOB":
        return f"lower(hex({q}))"
    if t.startswith("STRUCT") or t.endswith("[]") or t.startswith("MAP"):
        raise ValueError(f"hashed compare: unsupported DuckDB type {type_name}")
    return f"CAST({q} AS VARCHAR)"


def hashed_compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Order-insensitive compare WITHOUT materializing rows: each
    engine aggregates (COUNT(*), SUM(md5-prefix row hash)) over the
    canonicalized row strings internally, and only the two scalars
    cross the harness boundary. SUM of 60-bit row hashes is exact in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and commutative, so the
    comparison is row-order-free — the same row-count + value-hash
    strength as the driver's check, for results (d06/d07's 6M-row
    SELECT-* stars at sf1) where the pandas path OOMs."""
    from pyspark.sql import functions as F

    cols = sorted(spark_df.columns)

    # --- Spark side ---
    by_name = {f.name: f.dataType for f in spark_df.schema.fields}
    parts = [
        F.coalesce(_spark_canon(F.col(c), by_name[c]), F.lit(_NULLS)) for c in cols
    ]
    row = F.concat_ws(_SEP, *parts)
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("decimal(38,0)")
    n_s, sum_s = spark_df.select(h.alias("h")).agg(
        F.count(F.lit(1)), F.sum("h")
    ).first()

    # --- DuckDB side ---
    con = duck_connect(sf_dir)
    desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle_sql}) q").fetchall()
    o_types = {r[0]: r[1] for r in desc}
    if sorted(o_types) != cols:
        return [f"columns: spark={cols} oracle={sorted(o_types)}"]
    o_parts = [
        f"COALESCE({_duck_canon(c, o_types[c])}, '{_NULLS}')" for c in cols
    ]
    o_row = "concat_ws('" + _SEP + "', " + ", ".join(o_parts) + ")"
    nib = "+".join(
        f"((strpos('0123456789abcdef', substr(md5({o_row}), {i + 1}, 1)) - 1)::BIGINT << {4 * (14 - i)})"
        for i in range(15)
    )
    n_o, sum_o = con.execute(
        f"SELECT COUNT(*), SUM({nib}) FROM ({oracle_sql}) q"
    ).fetchone()

    probs: list[str] = []
    if int(n_s) != int(n_o):
        probs.append(f"row count: spark={n_s} oracle={n_o}")
    sv = None if sum_s is None else int(sum_s)
    ov = None if sum_o is None else int(sum_o)
    if sv != ov:
        probs.append(f"value hash: spark={sv} oracle={ov}")
    return probs
