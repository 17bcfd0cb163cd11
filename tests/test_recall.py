"""Recall quality of the approximate similarity operators against
their exact counterparts on planted near-duplicates — the evidence
that the LSH shortcuts are USEFUL approximations, not just
self-consistent ones. All data is seeded and the operators are
deterministic, so these assertions are exact replays, not flaky
probability claims."""

from __future__ import annotations

import numpy as np
import pytest

from database_query_processor_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def planted(spark):
    """100 random unit-ish vectors + a tiny-noise copy of each:
    pairs (i, i+100) have cosine ≥ 0.99; unrelated pairs ~0."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(100, SIM._EMB_DIM)).astype("float32")
    noisy = base + 0.03 * rng.normal(size=base.shape).astype("float32")
    rows = [(i, v.tolist()) for i, v in enumerate(base)] + [
        (i + 100, v.tolist()) for i, v in enumerate(noisy)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_banded_dedup_recall_on_planted_pairs(planted):
    """The banded-LSH default path must recover essentially all planted
    near-identical pairs found by the exact O(n²) path at cos ≥ 0.9."""
    exact = {
        (r.id_a, r.id_b)
        for r in SIM.embedding_dup_pairs(
            planted, "vec_id", "embedding", threshold=0.9, exact=True
        ).collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in SIM.embedding_dup_pairs(
            planted, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    assert len(exact) >= 100  # every planted pair clears the threshold
    assert banded <= exact  # blocking can only lose pairs, never invent them
    recall = len(banded & exact) / len(exact)
    assert recall >= 0.95, (len(banded), len(exact), recall)


def test_ann_lsh_finds_planted_neighbor(planted):
    """For most query vectors, the single-bucket LSH top-k must contain
    the planted copy that exact search ranks first."""
    hits = 0
    for qid in range(10):
        ex = [r.vec_id for r in SIM.cosine_topk(planted, "vec_id", "embedding", qid, k=1).collect()]
        assert ex == [qid + 100]  # exact search: the copy is the 1-NN
        lsh = [r.vec_id for r in SIM.ann_lsh_topk(planted, "vec_id", "embedding", qid, k=10).collect()]
        hits += qid + 100 in lsh
    # P(all 6 sign bits agree) ≈ 0.76 per pair at cos≈0.995; seeded data
    # makes the realized count a fixed replay — bound it loosely below
    assert hits >= 6, hits


def test_ivf_kmeans_codebook_recall(planted):
    """The KMeans codebook path must run the same IVF plumbing as the
    deterministic 'ids' codebook and beat/match its recall vs the
    exact cosine top-k: the planted near-copy of the query shares the
    query's cell under any reasonable codebook, so it must appear in
    a 2-of-8-cell probe."""
    query_id = 7
    exact_ids = [
        r.vec_id
        for r in SIM.cosine_topk(planted, "vec_id", "embedding", query_id, k=10).collect()
    ]
    got = [
        r.vec_id
        for r in SIM.ann_ivf_topk(
            planted, "vec_id", "embedding", query_id, k=10, codebook="kmeans"
        ).collect()
    ]
    # the planted near-duplicate (cos >= 0.99) must be found
    assert query_id + 100 in got
    # recall@10 vs exact must clear the useful-approximation bar
    recall = len(set(got) & set(exact_ids)) / len(exact_ids)
    assert recall >= 0.5, (recall, got, exact_ids)


def test_ivf_bad_codebook_rejected(planted):
    with pytest.raises(ValueError):
        SIM.ann_ivf_topk(planted, "vec_id", "embedding", 1, codebook="nope")


def test_semantic_dedup_drops_planted_twins_keeps_singletons(planted):
    """SemDeDup on the planted corpus: every noisy copy (cos ≥ 0.99 to
    its base, far above tau) must be DROPPED whenever it lands in the
    same Voronoi cell as its base, and the verdict must partition the
    corpus (one row per vector, kept XOR dropped)."""
    out = SIM.semantic_dedup(planted, "vec_id", "embedding", tau=0.9)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == 200  # one verdict per vector
    co_cell_twins = [
        i for i in range(100) if rows[i].cell == rows[i + 100].cell
    ]
    assert len(co_cell_twins) >= 90  # near-identical pairs co-locate
    for i in co_cell_twins:
        assert not rows[i + 100].kept, (i, rows[i + 100])
    # a dropped vector always has a lower-id co-cell neighbor >= tau,
    # so the LOWEST id in every cell is always kept
    import collections
    lowest = {}
    for vid, r in rows.items():
        if r.cell not in lowest or vid < lowest[r.cell]:
            lowest[r.cell] = vid
    for cell, vid in lowest.items():
        assert rows[vid].kept, (cell, vid)


def test_banded_dedup_scaled_resolution_recall(planted):
    """The production-scale banding (more planes per band, measured in
    SCALE.md's 10x probe — the demo default's 4 buckets/band goes
    quadratic past ~10x) must keep the same recall contract: subset
    of exact, >= 95% of planted pairs recovered. 24 planes / 3 bands
    = 256 buckets per band."""
    exact = {
        (r.id_a, r.id_b)
        for r in SIM.embedding_dup_pairs(
            planted, "vec_id", "embedding", threshold=0.9, exact=True
        ).collect()
    }
    scaled = {
        (r.id_a, r.id_b)
        for r in SIM.embedding_dup_pairs(
            planted, "vec_id", "embedding", threshold=0.9,
            num_planes=24, bands=3,
        ).collect()
    }
    assert scaled <= exact
    assert len(scaled & exact) / len(exact) >= 0.95


def test_banded_dedup_resolution_validation(planted):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide"):
        SIM.embedding_dup_pairs(
            planted, "vec_id", "embedding", num_planes=7, bands=3
        )
    with _pytest.raises(ValueError, match="overflow"):
        SIM.embedding_dup_pairs(
            planted, "vec_id", "embedding", num_planes=33, bands=3
        )


def test_assign_cells_vectorized_matches_literal(spark):
    """The Arrow argmax path (large codebooks) must assign the same
    cells as the literal-expression path on well-separated data —
    the literal path cliffs past ~hundreds of centroid expression
    trees (measured: cells=316 at 100k vectors stalls planning for
    tens of minutes), which is exactly when the vectorized path
    takes over."""
    import numpy as np

    from database_query_processor_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(400, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = S._ids_codebook(df, "vec_id", "embedding", cells=12)
    lit = {
        r.vec_id: r.cell
        for r in S._assign_cells(df, "vec_id", "embedding", cents).collect()
    }
    orig = S._ASSIGN_LITERAL_MAX
    try:
        S._ASSIGN_LITERAL_MAX = 1  # force the Arrow path
        vec = {
            r.vec_id: r.cell
            for r in S._assign_cells(df, "vec_id", "embedding", cents).collect()
        }
    finally:
        S._ASSIGN_LITERAL_MAX = orig
    diff = sum(1 for k in lit if lit[k] != vec[k])
    # isotropic gaussians: exact cosine ties are measure-zero; allow
    # at most an ulp-tie stragglers margin
    assert diff <= 1, f"{diff}/400 assignments differ"


def test_sq8_rerank_recall(spark):
    """SQ8 prefilter + exact rerank must recover (nearly all of) the
    exact cosine top-10: quantization error can drop a true neighbor
    from the 50-pool only near the pool boundary."""
    from database_query_processor_spark.operators.similarity import (
        ann_sq8_rerank,
        cosine_topk,
    )
    from database_query_processor_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = [r.vec_id for r in cosine_topk(emb, "vec_id", "embedding", 0, k=10).collect()]
    sq8 = [r.vec_id for r in ann_sq8_rerank(emb, "vec_id", "embedding", 0, k=10).collect()]
    overlap = len(set(exact) & set(sq8))
    assert overlap >= 9, (exact, sq8)


def test_pq_rerank_recall(spark):
    """PQ-ADC pool + exact rerank at the documented recall sizing
    (pool scaled to the quantizer's coarseness: 16-centroid
    ids-codebooks are a coarse quantizer, so the pool must be sized
    up — measured 10/10 at pool=150 vs 5/10 at pool=50 on this
    corpus; the docstring's pool/codebook-quality knobs)."""
    from database_query_processor_spark.catalog import load_table
    from database_query_processor_spark.operators.similarity import (
        ann_pq_rerank,
        cosine_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = [r.vec_id for r in cosine_topk(emb, "vec_id", "embedding", 0, k=10).collect()]
    pq = [
        r.vec_id
        for r in ann_pq_rerank(emb, "vec_id", "embedding", 0, k=10, pool=150).collect()
    ]
    overlap = len(set(exact) & set(pq))
    assert overlap >= 9, (exact, pq)


def test_pq_identical_vector_ranks_first_with_zero_approx(spark):
    """A corpus vector IDENTICAL to the query encodes to the query's
    own codes, so its ADC distance is exactly the sum of the query's
    own table entries at those codes — and the exact rerank must put
    it first at cos 1.0."""
    import numpy as np

    from database_query_processor_spark.operators.similarity import ann_pq_rerank

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype("float32")
    vecs[23] = vecs[0]  # planted twin of the query
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = ann_pq_rerank(df, "vec_id", "embedding", query_id=0, k=3).collect()
    assert rows[0].vec_id == 23 and rows[0].cos == 1.0


def test_pq_absent_query_and_bad_dim(spark):
    """Absent query id -> empty frame (the IVF/LSH contract); a dim
    not divisible into subspaces fails loudly."""
    import pytest

    from database_query_processor_spark.operators.similarity import ann_pq_rerank

    df = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    assert ann_pq_rerank(df, "vec_id", "embedding", query_id=999).count() == 0
    bad = spark.createDataFrame(
        [(i, [float(i)] * 60) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        ann_pq_rerank(bad, "vec_id", "embedding", query_id=0)
