"""Semantic invariants of the retrieval/LM-scoring operators (x40,
x41) beyond the DuckDB hash parity: ranking behavior and scoring
structure that must hold at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_query_processor_spark.operators.retrieval import (
    bm25_topk,
    unigram_logprob_scores,
)


def _docs(spark):
    rows = [
        (1, "hash join hash join hash join"),          # dense in query terms
        (2, "hash join"),                              # short, both terms
        (3, "hash table scan filter window order"),    # one term
        (4, "scan filter window order group value"),   # no query terms
        (5, "hash join hash join hash join"),          # duplicate of 1
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_bm25_only_matching_docs_scored(spark):
    out = bm25_topk(_docs(spark), "doc_id", "text", ["hash", "join"], k=10).collect()
    ids = {r.doc_id for r in out}
    assert 4 not in ids          # zero matching terms -> no row
    assert {1, 2, 3, 5} == ids


def test_bm25_duplicate_docs_tie_and_rank(spark):
    out = bm25_topk(_docs(spark), "doc_id", "text", ["hash", "join"], k=10).collect()
    score = {r.doc_id: r.score for r in out}
    assert score[1] == score[5]  # identical docs, identical score
    # two-term docs outrank the one-term doc
    assert min(score[1], score[2]) > score[3]
    # deterministic tie-break: doc 1 before doc 5
    order = [r.doc_id for r in out]
    assert order.index(1) < order.index(5)


def test_unigram_lm_duplicate_docs_equal_and_rare_penalized(spark):
    rows = [(i, "value " * 20 + "table") for i in range(8)] + [
        (100, "value " * 20 + "table"),       # same as the common shape
        (101, "zzyzx " * 20 + "qwvkj"),       # all-rare tokens
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in unigram_logprob_scores(df, "doc_id", "text").collect()}
    assert out[100].nll == out[0].nll          # identical docs -> identical score
    assert out[101].nll > out[0].nll           # rare tokens -> higher NLL
    assert out[0].n_toks == 21


def test_unigram_lm_nll_is_proper_mean(spark):
    """A single-doc corpus: every token prob is tf/total, and the NLL
    must equal the entropy of the empirical distribution."""
    import math

    df = _docs(spark).filter(F.col("doc_id") == 1)  # hash x3, join x3
    row = unigram_logprob_scores(df, "doc_id", "text").collect()[0]
    assert row.n_toks == 6
    assert abs(row.nll - (-math.log(0.5))) < 1e-9


def test_hybrid_rrf_fuses_both_rankers(spark):
    """A doc retrieved by BOTH systems outranks docs either system
    retrieved alone at comparable depth, and rank columns are NULL
    for the system that missed the doc."""
    from database_query_processor_spark.operators.retrieval import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [
            (0, "query anchor text"),
            (1, "hash join hash join hash join"),   # strong lexical
            (2, "hash join sort"),                  # lexical + dense
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    import numpy as np

    rng = np.random.default_rng(3)
    q = rng.normal(size=8)
    near = (q + 0.01 * rng.normal(size=8)).tolist()
    far = rng.normal(size=8).tolist()
    emb = spark.createDataFrame(
        [(0, q.tolist()), (1, far), (2, near), (3, rng.normal(size=8).tolist())],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_rrf_topk(docs, emb, ["hash", "join", "sort"], query_id=0, k=4).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 2 is in both candidate lists -> highest fused score
    assert out[0]["doc_id"] == 2
    assert by_id[2]["lex_rank"] is not None and by_id[2]["dense_rank"] is not None
    # doc 3 has no query term -> lexical miss -> NULL lex_rank
    assert by_id[3]["lex_rank"] is None and by_id[3]["dense_rank"] is not None


def test_bigram_lm_exact_value_and_ordering(spark):
    """Hand-computed interpolated bigram NLL on a 3-doc corpus, plus
    the ranking property the filter relies on: a doc made of corpus-
    common bigrams scores lower NLL than one pairing the same tokens
    in never-seen orders."""
    import math

    from database_query_processor_spark.operators.retrieval import (
        BIGRAM_LAMBDA,
        bigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [
            (0, "hash join hash join"),
            (1, "hash join"),
            (2, "join hash"),  # reversed order: bigram (join,hash) seen twice (doc0 interior, doc2)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob_scores(docs, "doc_id", "text").collect()}
    # corpus: unigrams hash=4 join=4 total=8; bigrams (hash,join)=3, (join,hash)=2
    lam = BIGRAM_LAMBDA
    p_hj = lam * 3 / 4 + (1 - lam) * 4 / 8
    p_jh = lam * 2 / 4 + (1 - lam) * 4 / 8
    exp0 = round(-(math.log(p_hj) + math.log(p_jh) + math.log(p_hj)) / 3, 9)
    assert out[0].n_bigrams == 3
    assert abs(out[0].nll - exp0) < 1e-12
    assert out[1].nll == round(-math.log(p_hj), 9)
    # common-order doc scores better (lower NLL) than the rare order
    assert out[1].nll < out[2].nll
