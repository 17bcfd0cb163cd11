#!/usr/bin/env python
"""Generate the 100x skew-probe corpus (round-4 scale audit, third
scaling point after sf0.1 and the 10x probe): ~500k documents +
~100k embeddings in the driver testdata shape, with the SAME hazard
profile as gen_probe10x.py — one flood-skew block of verbatim copies
(x55), near-dup clusters (banding/index paths), spread embeddings
with planted near-dups (LSH/cell paths).

Scaling discipline: the near-dup CLUSTER SIZE stays constant (~12
members — base count scales with N) so the true pair set grows
LINEARLY with the corpus; a fixed base count would grow clusters to
~120 members and make the true output itself quadratic, which no
blocking scheme can beat. The flood block stays at 200 copies —
absolute skew, not proportional (a single pathological page does not
get 10x more copies because the crawl got bigger).

Deterministic (seed fixed); output parquet under artifacts/probe100x/
(gitignored). Usage: python artifacts/gen_probe100x.py
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "probe100x")
N_DOCS = 500_000
N_VECS = 100_000
N_NEAR_BASES = 5_000  # N_DOCS/100, same cluster-size profile as 10x
N_FLOOD = 200  # absolute, matches the 10x probe's flood block
DIM = 64

WORDS = (
    "batch part spark line column order small sort fast value scan stream "
    "vector query agg table hash key group filter customer slow join shard "
    "page cache disk merge split probe build stage task codec row skew"
).split()


def gen_documents(rng: random.Random) -> pa.Table:
    texts, langs, sources = [], [], []
    flood = " ".join(rng.choices(WORDS, k=60))
    near_base = [" ".join(rng.choices(WORDS, k=50)) for _ in range(N_NEAR_BASES)]
    flood_left = N_FLOOD
    for i in range(N_DOCS):
        r = rng.random()
        if flood_left > 0 and r < N_FLOOD / N_DOCS * 2:
            t = flood
            flood_left -= 1
        elif r < 0.12:
            base = near_base[rng.randrange(len(near_base))].split()
            for _ in range(rng.randrange(0, 4)):
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
    """Same regime as the 10x probe: isotropic spread + every-40th
    perturbation pairs (sparse true near-dups, the regime where
    blocking can win)."""
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
    rng = random.Random(434343)
    pq.write_table(gen_documents(rng), os.path.join(OUT, "documents.parquet"))
    pq.write_table(gen_embeddings(434343), os.path.join(OUT, "embeddings.parquet"))
    print(f"wrote {N_DOCS} docs + {N_VECS} vecs to {OUT}")


if __name__ == "__main__":
    main()
