#!/usr/bin/env python
"""Synthesize an sf1 dataset for the relational scaling probe by
deterministic 10x replication of /root/testdata/sf0.1 with key-range
offsets (referential structure preserved: each copy i shifts every
key domain by i * (max_key + 1), so orders still join their lineitems
and customers, and per-key group sizes stay constant while key
cardinality and row count scale 10x — the growth profile a real
sf-scaled TPC-H has).

nation/region stay fixed (constant-size dims in TPC-H at every sf).

documents/embeddings (round 6): the text analog of key-shifted
replication. Exact 10x text replication would flood the dup
detectors (every doc would gain 9 verbatim twins — dup mass 100x),
so each copy i >= 1 rewrites every CONTENT token t -> t + 'q{i}x'
(one alnum run stays one token), a bijective token remap: within a
copy, shingle sets / fingerprints / df distributions / k-gram chains
are exactly isomorphic to the originals (per-cluster dup structure
preserved, like per-key group sizes in the relational tables), while
cross-copy token universes are disjoint (no new dup pairs — dup mass
scales 10x, linear). STOPWORDS and the retrieval query terms are
EXEMPT from the remap: language-ID profiles hold per copy and BM25
hits scale 10x with the corpus, exactly as a real 10x web corpus
behaves (function-word df grows with corpus size).

embeddings: per-copy ORTHOGONAL transform (dimension rotation by 7i
+ deterministic sign flips) — an isometry, so every within-copy
cosine (near-dup pairs, cluster structure) is preserved bit-exact in
geometry, while cross-copy cosines are near-random for a spread
corpus (E[cos] ~ N(0, 1/64), far below the 0.9-ish dup thresholds).
vec_id shifts by the domain span like every other key.

Output: /tmp/dqps_sf1/*.parquet (regenerable scratch, never
committed). Usage: python artifacts/gen_sf1.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/dqps_sf1"
COPIES = 10

# table -> columns sharing each key domain
KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "user": [("events", "user_id")],
    "event": [("events", "event_id")],
}


def main() -> None:
    spark = get_spark(
        app_name="dqps-gen-sf1",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(DST, exist_ok=True)

    # key-domain spans measured once from the source tables
    spans: dict[str, int] = {}
    cache = {}
    for dom, cols in KEY_DOMAINS.items():
        hi = 0
        for table, col in cols:
            if table not in cache:
                cache[table] = load_table(spark, SRC, table)
            hi = max(hi, cache[table].agg(F.max(col)).first()[0])
        spans[dom] = int(hi) + 1

    shifted_cols = {
        (table, col): spans[dom]
        for dom, cols in KEY_DOMAINS.items()
        for table, col in cols
    }

    for table in ["region", "nation"]:
        load_table(spark, SRC, table).write.mode("overwrite").parquet(
            f"{DST}/{table}.parquet"
        )

    for table in ["customer", "supplier", "part", "orders", "lineitem", "events"]:
        df = cache.get(table) or load_table(spark, SRC, table)
        rep = df.withColumn(
            "_copy", F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        )
        for col in df.columns:
            span = shifted_cols.get((table, col))
            if span is not None:
                rep = rep.withColumn(col, F.col(col) + F.col("_copy") * span)
        rep = rep.drop("_copy")
        if table == "events":
            # the streaming topologies read the sf dir with
            # pathGlobFilter='events.parquet', which matches FILE names
            # only — consolidate to a single file like the driver
            # testdata layout (1M rows, trivially single-file)
            import glob
            import shutil

            tmp_dir = f"{DST}/_events_tmp"
            rep.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
            part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
            dest = f"{DST}/events.parquet"
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            shutil.move(part, dest)
            shutil.rmtree(tmp_dir)
        else:
            rep.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(f"{table}: written")

    _write_documents(spark)
    _write_embeddings()

    for table in ["lineitem", "orders", "customer", "events", "documents",
                  "embeddings"]:
        n = spark.read.parquet(f"{DST}/{table}.parquet").count()
        print(f"{table}: {n} rows")


def _write_documents(spark) -> None:
    from database_query_processor_spark.functions.text import STOPWORDS
    from database_query_processor_spark.workload.extensions import BM25_TERMS

    import re as _re

    exempt = sorted({w for ws in STOPWORDS.values() for w in ws} | set(BM25_TERMS))
    # Token boundaries must match the ENGINE's tokenizer ([^a-z0-9]+
    # split), not Java's \b (which treats '_' as a word char — 'foo_bar'
    # would keep 'foo'/'bar' identical across copies and silently break
    # the cross-copy disjointness the scaling numbers depend on). So:
    # explicit [a-z0-9] lookarounds, case-insensitive, escaped exempts.
    alts = "|".join(_re.escape(w) for w in exempt)
    pat = (
        r"(?i)(?<![a-z0-9])(?!(?:" + alts + r")(?![a-z0-9]))([a-z0-9]+)(?![a-z0-9])"
    )

    src = load_table(spark, SRC, "documents")
    span = int(src.agg(F.max("doc_id")).first()[0]) + 1
    # a raw token already shaped like a copy suffix (…q3x) would
    # collide with copy 3's remapped tokens — assert the precondition
    n_preshaped = src.filter(
        F.lower("text").rlike(r"(?<![a-z0-9])[a-z0-9]+q[1-9]x(?![a-z0-9])")
    ).count()
    if n_preshaped:
        raise RuntimeError(
            f"{n_preshaped} source docs already contain q<i>x-shaped tokens; "
            "pick a different copy-suffix scheme"
        )
    parts = []
    for i in range(COPIES):
        d = src.withColumn("doc_id", F.col("doc_id") + F.lit(i * span))
        if i > 0:
            d = d.withColumn(
                "text", F.regexp_replace("text", pat, f"$1q{i}x")
            ).withColumn("n_chars", F.length("text"))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    # hard invariant: dup mass must scale EXACTLY 10x (cross-copy token
    # universes disjoint) — fail loudly instead of quietly invalidating
    # every scaling number measured on this corpus
    dup = lambda df: df.count() - df.select("text").distinct().count()  # noqa: E731
    d_src, d_out = dup(src), dup(spark.read.parquet(f"{DST}/documents.parquet"))
    if d_out != COPIES * d_src:
        raise RuntimeError(
            f"sf1 dup-mass invariant broken: {d_out} != {COPIES} * {d_src}"
        )
    print(f"documents: written (dup surplus {d_src} -> {d_out}, exactly {COPIES}x)")


def _write_embeddings() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = np.asarray(t["vec_id"])
    labels = np.asarray(t["label"])
    emb = t["embedding"].combine_chunks()
    n = len(emb)
    dim = len(emb[0])
    vecs = np.asarray(emb.flatten(), dtype=np.float32).reshape(n, dim)
    span = int(vec_ids.max()) + 1
    rng = np.random.default_rng(20260815)
    signs = rng.choice([1.0, -1.0], size=(COPIES, dim)).astype(np.float32)
    ids_out, lab_out, vec_out = [], [], []
    for i in range(COPIES):
        ids_out.append(vec_ids + i * span)
        lab_out.append(labels)
        if i == 0:
            vec_out.append(vecs)
        else:
            vec_out.append(np.roll(vecs, 7 * i, axis=1) * signs[i])
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids_out), pa.int64()),
            "embedding": pa.array(
                [v for block in vec_out for v in block], pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(lab_out), pa.int32()),
        }
    )
    pq.write_table(table, f"{DST}/embeddings.parquet")
    print("embeddings: written")


if __name__ == "__main__":
    main()
