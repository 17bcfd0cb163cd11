"""Tab-delimited text ingest — the reference's ConvertTxtToTbl.

Reference: reads `<T>.txt` (tab-separated rows, no header), types each
field per the serialized `<T>.md` schema, writes serialized `Tuple`s
(src/ConvertTxtToTbl.java:18-73). Here the typed read is a single
distributed csv scan with the det-derived schema, and the sink is
parquet — self-describing, columnar, splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_query_processor_spark.sources.det import TableSpec


def read_text_table(
    spark: SparkSession, path: str, spec: TableSpec, validate: bool = True
) -> DataFrame:
    """`<T>.txt` + spec → typed DataFrame. FAILFAST mirrors the
    reference's exit-on-bad-field (src/ConvertTxtToTbl.java:60-65) —
    but only for UNPARSEABLE tokens: Spark file sources force the
    user schema nullable, and an EMPTY token parses to NULL rather
    than erroring (the reference's Integer.parseInt("") would exit).
    ``validate`` closes that gap with one post-read scan that raises
    on any NULL cell, enforcing the reference's no-NULLs data model
    (det.py) that downstream operators assume."""
    # quote/escape disabled: the reference splits rows on raw tabs
    # (no quoting concept) — with univocity quoting on, a field
    # STARTING with a double quote would strip quotes or swallow tabs
    # inside the "quoted" region, mis-parsing rows the reference
    # accepts verbatim.
    df = spark.read.csv(
        path,
        sep="\t",
        header=False,
        schema=spec.schema,
        mode="FAILFAST",
        quote="",
        escape="",
    )
    if validate:
        from pyspark.sql import functions as F

        anynull = None
        for f in spec.schema.fields:
            c = F.col(f.name).isNull()
            anynull = c if anynull is None else (anynull | c)
        bad = df.filter(anynull).limit(1).collect()
        if bad:
            raise ValueError(
                f"{path}: NULL field in row {tuple(bad[0])} — empty tokens "
                "violate the reference's no-NULLs data model"
            )
    return df


def ingest_text_table(
    spark: SparkSession, txt_path: str, spec: TableSpec, parquet_path: str
) -> DataFrame:
    """Full ConvertTxtToTbl equivalent: text in, columnar table out."""
    df = read_text_table(spark, txt_path, spec)
    df.write.mode("overwrite").parquet(parquet_path)
    return spark.read.parquet(parquet_path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Read newline-delimited JSON training shards (the format
    `sources/sink.write_jsonl` + `operators/corpus.to_jsonl` export).

    An explicit schema skips Spark's whole-file inference scan — at
    100 TB schema inference is a full extra pass, so production reads
    must pass one. JSON source splits by line, so parallelism follows
    file count × block size exactly like text."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
