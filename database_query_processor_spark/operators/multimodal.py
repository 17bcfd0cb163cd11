"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted via Arrow-batched Pandas UDFs.

No reference analog (three scalar types only). The pattern this
demonstrates is the real one for 100 TB image/audio/video pipelines:

  * payloads travel as `binary` columns inside parquet row groups;
  * metadata (size, format, dims) lives in sibling typed columns so
    filters prune WITHOUT touching payload bytes (column pruning —
    a scan selecting only metadata never reads the blob pages);
  * per-batch decode runs in `mapInPandas` — Arrow hands the UDF a
    zero-copy batch of payloads, Python only at the edges;
  * decode is partition-parallel and stateless → linear scale-out.

The actual image/audio codecs are NOT in this container, so
`decode_image_batch` STUBS the codec behind a deterministic fake
(documented below); the Spark-side plumbing — schema, batching,
partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, fake_width long, fake_height long, n_frames long"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed
    metadata columns (what an image ingest would carry)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real codec. A real deployment
    replaces this body with PIL/libav decode; everything around it
    stays identical."""
    n = len(payload)
    return 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 8


def real_decode(payload: bytes):  # pragma: no cover - documented stub
    """Real codec entry point — image/audio libraries are not available
    in this environment."""
    raise NotImplementedError(
        "image/audio codecs unavailable in this container; "
        "swap _fake_decode for PIL.Image.open / av.open in deployment"
    )


def decode_image_batch(df_bin: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches of (doc_id, payload) in,
    typed feature rows out. Partition-parallel, no shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "fake_width": dims.map(lambda d: d[0]).astype("int64"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int64"),
                    "n_frames": dims.map(lambda d: d[2]).astype("int64"),
                }
            )

    return df_bin.select("doc_id", "payload").mapInPandas(decode, DECODED_SCHEMA)
