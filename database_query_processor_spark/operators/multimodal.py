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

Two codec paths coexist: `decode_image_batch` keeps a deterministic
FAKE codec (SQL-expressible, so the whole pipeline carries a value
oracle), while `decode_media_batch`/`real_decode` run a REAL
dependency-free decode — pixel-accurate PNG (stdlib zlib + scanline
unfilter) and WAV header probing via functions/codecs.py. The
Spark-side plumbing — schema, batching, partitioning, UDF signature —
is identical in both.
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


def real_decode(payload: bytes) -> dict:
    """REAL codec entry point, dependency-free: dispatches on magic
    bytes to the stdlib-only codecs in functions/codecs.py — PNG gets
    a pixel-accurate DEFLATE + unfilter decode, WAV a header probe.
    Returns a uniform media dict; unknown formats raise ValueError
    (route to quarantine in production, the src13 pattern). A
    deployment adding JPEG/video swaps in PIL/libav behind the same
    dispatch without touching the Arrow plumbing."""
    from database_query_processor_spark.functions import codecs

    if payload is None:
        raise ValueError("null payload")
    if codecs.is_png(payload):
        w, h, ch, px = codecs.decode_png(payload)
        return {
            "kind": "image", "width": w, "height": h, "channels": ch,
            "n_frames": 1, "sample_rate": None,
            "mean_val": sum(px) / len(px) if px else 0.0,
        }
    if codecs.is_wav(payload):
        ch, rate, frames, _width = codecs.decode_wav(payload)
        return {
            "kind": "audio", "width": None, "height": None, "channels": ch,
            "n_frames": frames, "sample_rate": rate, "mean_val": None,
        }
    raise ValueError("unsupported media format (not PNG or WAV)")


MEDIA_SCHEMA = (
    "doc_id long, kind string, width long, height long, channels long, "
    "n_frames long, sample_rate long, mean_val double"
)


def decode_media_batch(df_bin: DataFrame) -> DataFrame:
    """mapInPandas over REAL payload bytes (PNG pixels, WAV frames):
    the same Arrow-batched, partition-parallel, shuffle-free shape as
    decode_image_batch, with real_decode as the per-payload body —
    the fake-codec path beside it keeps the SQL-expressible oracle,
    this one decodes actual media."""

    _quarantined = {
        "kind": None, "width": None, "height": None, "channels": None,
        "n_frames": None, "sample_rate": None, "mean_val": None,
    }

    def _decode_or_quarantine(payload):
        # the src13 quarantine pattern IN the batch body: a NULL,
        # corrupt, or unknown-format payload becomes an all-NULL row
        # (kind IS NULL = quarantined) — one bad payload must not
        # fail the whole 100 TB stage
        try:
            return real_decode(payload)
        except ValueError:
            return _quarantined

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["payload"].map(_decode_or_quarantine)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": media.map(lambda m: m["kind"]),
                    "width": media.map(lambda m: m["width"]).astype("Int64"),
                    "height": media.map(lambda m: m["height"]).astype("Int64"),
                    "channels": media.map(lambda m: m["channels"]).astype("Int64"),
                    "n_frames": media.map(lambda m: m["n_frames"]).astype("Int64"),
                    "sample_rate": media.map(lambda m: m["sample_rate"]).astype("Int64"),
                    "mean_val": media.map(lambda m: m["mean_val"]).astype("float64"),
                }
            )

    return df_bin.select("doc_id", "payload").mapInPandas(decode, MEDIA_SCHEMA)


def decode_image_batch(df_bin: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches of (doc_id, payload) in,
    typed feature rows out. Partition-parallel, no shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # na_action='ignore' propagates a NULL payload as SQL NULL
            # outputs (exactly what the SQL oracle computes over NULL
            # text) instead of a TypeError killing the stage
            dims = pdf["payload"].map(_fake_decode, na_action="ignore")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len, na_action="ignore").astype("Int64"),
                    "fake_width": dims.map(lambda d: d[0], na_action="ignore").astype("Int64"),
                    "fake_height": dims.map(lambda d: d[1], na_action="ignore").astype("Int64"),
                    "n_frames": dims.map(lambda d: d[2], na_action="ignore").astype("Int64"),
                }
            )

    return df_bin.select("doc_id", "payload").mapInPandas(decode, DECODED_SCHEMA)


RESIZE_MAX_DIM = 128
RESIZED_SCHEMA = "doc_id long, width long, height long, out_width long, out_height long"


def resize_image_batch(df_bin: DataFrame, max_dim: int = RESIZE_MAX_DIM) -> DataFrame:
    """mapInPandas resize: decode dims, scale so max(w, h) ≤ max_dim
    preserving aspect ratio (factor = min(1, max_dim/max(w, h))). The
    fake decode supplies dims; a real deployment resizes the pixel
    buffer in the same batch loop and emits the re-encoded payload."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_decode, na_action="ignore")
            out = []
            for d in dims:
                if d is None or (isinstance(d, float) and pd.isna(d)):
                    out.append((None, None, None, None))
                    continue
                w, h = d[0], d[1]
                f = min(1.0, float(max_dim) / max(w, h))
                out.append((w, h, int(w * f), int(h * f)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([r[0] for r in out], dtype="Int64"),
                    "height": pd.Series([r[1] for r in out], dtype="Int64"),
                    "out_width": pd.Series([r[2] for r in out], dtype="Int64"),
                    "out_height": pd.Series([r[3] for r in out], dtype="Int64"),
                }
            )

    return df_bin.select("doc_id", "payload").mapInPandas(resize, RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long"


def sample_frames(df_bin: DataFrame, every: int = 2) -> DataFrame:
    """mapInPandas frame sampling: one output row per kept frame
    (indexes 0, every, 2·every, … below n_frames) — the variable-fanout
    shape of video decode. Partition-parallel; fanout ≤ 8 per doc here,
    bounded by the codec's frame count in deployment."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames = pdf["payload"].map(
                lambda p: _fake_decode(p)[2] if p is not None else 0
            )
            ids, idxs = [], []
            for doc_id, nf in zip(pdf["doc_id"], n_frames):
                for i in range(0, int(nf), every):
                    ids.append(doc_id)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int64")})

    return df_bin.select("doc_id", "payload").mapInPandas(sample, FRAMES_SCHEMA)


FEATURE_DIM = 8
FEATURES_SCHEMA = "doc_id long, features array<double>"


def extract_features_batch(df_bin: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction: fixed-dim embedding per payload.
    The fake 'model' is a deterministic arithmetic function of the
    byte length (feature_i = ((n·(i+3)) mod 97)/97), chosen to be
    SQL-expressible so even this stubbed path keeps a full value-hash
    oracle; a real deployment runs the vision/audio encoder over the
    Arrow batch here (batch inference is exactly this shape)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len, na_action="ignore")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": n.map(
                        lambda nb: [float((int(nb) * (i + 3)) % 97) / 97.0 for i in range(dim)],
                        na_action="ignore",
                    ),
                }
            )

    return df_bin.select("doc_id", "payload").mapInPandas(extract, FEATURES_SCHEMA)
