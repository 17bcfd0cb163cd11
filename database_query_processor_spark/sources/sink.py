"""Result sink — the reference's QueryMain output stage.

Reference: pulls root batches and writes a header row plus
tab-delimited tuples, printing ``-NULL-`` for null cells
(src/QueryMain.java:162-226). Spark form: a csv write with the same
separator / header / null token. ``single_file=True`` coalesces to
one partition to mirror the reference's single result file — leave it
False at scale (one file per partition, written in parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

NULL_TOKEN = "-NULL-"


def write_result(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true")
        .option("nullValue", NULL_TOKEN)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, line_col: str = "json_line") -> None:
    """Training-shard export: one JSON object per line (the
    `operators/corpus.to_jsonl` serialization), written as plain text
    so the bytes are exactly the serialized lines — one file per
    partition, written in parallel at scale."""
    df.select(line_col).write.mode("overwrite").text(path)
