#!/usr/bin/env python
"""Generate the 10x skew-probe corpus (round-4 scale audit): ~50k
documents + ~20k embeddings in the driver testdata shape, with the
SAME hazard profile the guards exist for — near-dup clusters for the
banding/index paths, a flood-skew block (verbatim copies) for x55's
k-gram chains, and clustered embeddings for the LSH/cell paths.
Deterministic (seed fixed); output parquet under artifacts/probe10x/
(gitignored). Usage: python artifacts/gen_probe10x.py
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "probe10x")
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

WORDS = (
    "batch part spark line column order small sort fast value scan stream "
    "vector query agg table hash key group filter customer slow join shard "
    "page cache disk merge split probe build stage task codec row skew"
).split()


def gen_documents(rng: random.Random) -> pa.Table:
    texts, langs, sources = [], [], []
    flood = " ".join(rng.choices(WORDS, k=60))  # verbatim-copy block
    near_base = [" ".join(rng.choices(WORDS, k=50)) for _ in range(500)]
    for i in range(N_DOCS):
        r = rng.random()
        if r < 0.004:  # ~200 verbatim copies: x55 flood skew
            t = flood
        elif r < 0.12:  # near-dup cluster: base +- small edits
            base = near_base[rng.randrange(len(near_base))].split()
            k = rng.randrange(0, 4)
            for _ in range(k):
                base[rng.randrange(len(base))] = rng.choice(WORDS)
            t = " ".join(base)
        else:
            t = " ".join(rng.choices(WORDS, k=rng.randrange(15, 90)))
        texts.append(t)
        langs.append(rng.choices(["en", "zh", "de", "fr"], [8, 1, 1, 1])[0])
        sources.append(f"src{rng.randrange(20)}")
    return pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(seed: int) -> pa.Table:
    """Spread corpus (one isotropic gaussian per vector — the
    realistic regime where true near-dup pairs are SPARSE) plus
    injected structure: every 40th vector is a tiny perturbation of
    its predecessor (the pairs a dedup must find), and labels mark 8
    soft regions for grouping queries. A heavily-clustered corpus is
    the wrong probe for near-dup ops: with a few coarse modes the
    TRUE pair set is itself quadratic, so no blocking scheme can be
    sub-quadratic in output."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 8, N_VECS)
    vecs = rng.normal(size=(N_VECS, DIM))
    for i in range(40, N_VECS, 40):
        vecs[i] = vecs[i - 1] + rng.normal(scale=0.01, size=DIM)
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(424242)
    pq.write_table(gen_documents(rng), os.path.join(OUT, "documents.parquet"))
    pq.write_table(gen_embeddings(424242), os.path.join(OUT, "embeddings.parquet"))
    print(f"wrote {N_DOCS} docs + {N_VECS} vecs to {OUT}")


if __name__ == "__main__":
    main()
