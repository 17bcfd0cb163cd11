#!/usr/bin/env python
"""Synthesize the sf10 EMBEDDINGS table (200k vectors) so the
similarity family — specifically x28's round-9 scale-bounded exact
k-NN join — gets a third-decade check: 10 copies of /tmp/dqps_sf1's
embeddings (themselves gen_sf1.py's isometric 10x of sf0.1), each
copy j >= 1 applying an ORTHOGONAL transform (dimension roll by 11*j
+ deterministic sign flips — a different roll stride and rng seed
than gen_sf1's 7*i, so stacked copies stay decorrelated). Isometry
preserves every within-copy cosine bit-exact in geometry; cross-copy
cosines are near-random for a spread corpus (E[cos] ~ N(0, 1/64)).
vec_id shifts by the measured domain span per copy, like every other
key in the scale probes.

Output: /tmp/dqps_sf10/embeddings.parquet (regenerable scratch,
never committed).
Usage: PYTHONPATH=/root/repo python -u artifacts/gen_embeddings_sf10.py
(requires /tmp/dqps_sf1 from gen_sf1.py)
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/tmp/dqps_sf1"
DST = "/tmp/dqps_sf10"
COPIES = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = np.asarray(t["vec_id"])
    labels = np.asarray(t["label"])
    emb = t["embedding"].combine_chunks()
    n = len(emb)
    dim = len(emb[0])
    vecs = np.asarray(emb.flatten(), dtype=np.float32).reshape(n, dim)
    span = int(vec_ids.max()) + 1
    rng = np.random.default_rng(20260816)
    signs = rng.choice([1.0, -1.0], size=(COPIES, dim)).astype(np.float32)
    ids_out, lab_out, vec_out = [], [], []
    for j in range(COPIES):
        ids_out.append(vec_ids + j * span)
        lab_out.append(labels)
        if j == 0:
            vec_out.append(vecs)
        else:
            vec_out.append(np.roll(vecs, 11 * j, axis=1) * signs[j])
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
    # isometry sanity: norms preserved bit-tolerantly per copy
    out = pq.read_table(f"{DST}/embeddings.parquet")
    assert out.num_rows == COPIES * n, (out.num_rows, n)
    print(f"embeddings sf10: {out.num_rows} rows x {dim} dims -> {DST}")


if __name__ == "__main__":
    main()
