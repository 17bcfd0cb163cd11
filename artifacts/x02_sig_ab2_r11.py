#!/usr/bin/env python
"""x02 signature-stage A/B (r11): current 64-pass HOF min-fold vs
(a) fused single-pass aggregate+zip_with HOF and (b) mapInArrow+numpy
vectorized fold. Times the signature stage isolated with the noop sink
(guide §1.4) and exact-checks signature equality against current.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import ArrayType, LongType, StructField, StructType  # noqa: E402

from database_query_processor_spark.catalog import load_table  # noqa: E402
from database_query_processor_spark.operators import dedup as D  # noqa: E402
from database_query_processor_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
P = D.MERSENNE_P
A = np.array([a for a, _ in D.PERMS], dtype=np.uint64).reshape(-1, 1)
B = np.array([b for _, b in D.PERMS], dtype=np.uint64).reshape(-1, 1)

spark = get_spark(driver_memory="16g", extra_conf={"spark.ui.showConsoleProgress": "false"})


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn, n=5):
    ts = []
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: {ts} min={min(ts)}", flush=True)


SIG_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("sig", ArrayType(LongType()))]
)


def sig_arrow(grams_df):
    """mapInArrow over (doc_id, hs): flatten all gram-hashes in the batch,
    one 64×total uint64 matrix op, segment-min via minimum.reduceat."""
    with_hashes = grams_df.select(
        "doc_id",
        F.transform("grams", lambda g: F.xxhash64(g).bitwiseAND(F.lit(0xFFFFFFFF))).alias("hs"),
    )

    def fold(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            hs_col = tbl.column("hs").combine_chunks()
            arr = hs_col.chunk(0) if hasattr(hs_col, "chunk") else hs_col
            flat = arr.values.to_numpy(zero_copy_only=False).astype(np.uint64)
            offsets = arr.offsets.to_numpy(zero_copy_only=False)
            lens = np.diff(offsets)
            sigs = np.empty((len(doc_ids), len(A)), dtype=object)
            if flat.size:
                mat = (A * flat[None, :] + B) % np.uint64(P)  # 64 × total
                nonempty = lens > 0
                starts = offsets[:-1][nonempty]
                mins = np.minimum.reduceat(mat, starts, axis=1)
                # reduceat folds from each start to the next start — but
                # consecutive starts of nonempty segments span exactly one
                # segment each ONLY if there are no empty segments between;
                # empty segments were filtered from starts so each reduceat
                # slice [starts[k], starts[k+1]) covers segment k exactly.
                out = [None] * len(doc_ids)
                k = 0
                for i in range(len(doc_ids)):
                    if nonempty[i]:
                        out[i] = mins[:, k].astype(np.int64).tolist()
                        k += 1
                    else:
                        out[i] = [None] * len(A)
            else:
                out = [[None] * len(A)] * len(doc_ids)
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, type=pa.int64()), pa.array(out, type=pa.list_(pa.int64()))],
                names=["doc_id", "sig"],
            )

    return with_hashes.mapInArrow(fold, SIG_SCHEMA)


def sig_fused(grams_df):
    """Single aggregate() pass; acc = 64-array of running mins."""
    with_hashes = grams_df.select(
        "doc_id",
        F.transform("grams", lambda g: F.xxhash64(g).bitwiseAND(F.lit(0xFFFFFFFF))).alias("hs"),
    )
    consts_a = F.array(*[F.lit(a) for a, _ in D.PERMS])
    consts_b = F.array(*[F.lit(b) for _, b in D.PERMS])
    init = F.expr(f"array_repeat(CAST(NULL AS BIGINT), {len(D.PERMS)})")
    sig = F.aggregate(
        "hs",
        init,
        lambda acc, h: F.zip_with(
            F.zip_with(consts_a, consts_b, lambda a, b: (a * h + b) % F.lit(P)),
            acc,
            lambda v, m: F.least(v, m),
        ),
    )
    return with_hashes.select("doc_id", sig.alias("sig"))


docs = load_table(spark, SF, "documents")
grams = D.doc_shingles(docs, "doc_id", "text")

t("sig_current", lambda: noop(D._signature_from_shingles(grams)))
t("sig_fused", lambda: noop(sig_fused(grams)))
t("sig_arrow", lambda: noop(sig_arrow(grams)))

cur = D._signature_from_shingles(grams)
for name, alt in (("fused", sig_fused(grams)), ("arrow", sig_arrow(grams))):
    j = cur.alias("a").join(alt.alias("b"), "doc_id", "full")
    bad = j.filter(
        ~(
            F.col("a.sig").eqNullSafe(F.col("b.sig"))
            | (F.col("a.sig")[0].isNull() & F.col("b.sig")[0].isNull())
        )
    ).count()
    tot = cur.count()
    print(f"equality[{name}]: mismatches={bad} of {tot}", flush=True)

spark.stop()
