"""Similarity search over embedding columns (array<float>).

No reference analog (the reference has exactly three scalar types,
src/qp/utils/Attribute.java:11-13); this is the LLM-pipeline ANN
extension surface.

Scale design:
  * Brute-force cosine top-k: broadcast the query vector, scan-side
    dot products (JVM higher-order functions, no Python), and a
    TakeOrderedAndProject top-k — per-partition heaps + driver merge
    of k rows, never a global sort. Linear scan; the correct baseline
    and the exact oracle.
  * Random-hyperplane LSH (ann_lsh_topk): bucket = sign-bit vector of
    H hyperplane projections. Candidate set is one bucket (≈ n/2^H
    docs) → top-k within. At 100 TB: partition by bucket, broadcast
    the hyperplanes, and the scan prunes to matching partitions. An
    IVF variant would swap sign-buckets for k-means cells — same
    plumbing.

All float math is done as float→double casts with sequential
aggregation, which both Spark and DuckDB evaluate bit-identically
(verified: 500/500 exact matches) — so even the LSH path has a full
value-hash oracle.
"""

from __future__ import annotations

import random

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUM_HYPERPLANES = 6
_EMB_DIM = 64


def _hyperplanes(num: int = NUM_HYPERPLANES, dim: int = _EMB_DIM, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num)]


HYPERPLANES = _hyperplanes()


def dot_d(a: Column, b: Column) -> Column:
    """Σ double(a_i)·double(b_i), sequential — bit-stable across
    engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (comparison-neutral, matching DuckDB's
    x/0 = NULL) for zero-norm vectors — an unguarded divide would be a
    job-killing DIVIDE_BY_ZERO under the session's pinned ANSI mode."""
    return F.try_divide(
        dot_d(a, b), F.sqrt(dot_d(a, a)) * F.sqrt(dot_d(b, b))
    )


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in v])


def hyperplane_bucket(vec: Column, planes: list[list[float]] | None = None) -> Column:
    """LSH bucket id: bit j = sign(vec · hyperplane_j).

    The vector dimension must equal the planes' dimension: zip_with
    pads a shorter array with NULLs, every plane dot would go NULL,
    and EVERY vector would silently land in bucket 0 — collapsing the
    LSH blocking into one corpus-wide mega-bucket (brute-force scan /
    quadratic pair space with no error). Fails loudly instead."""
    dim = len((planes if planes is not None else HYPERPLANES)[0])
    guard = F.assert_true(
        F.size(vec) == dim,
        F.concat(
            F.lit(f"hyperplane_bucket: vector dim != plane dim {dim}: got "),
            F.size(vec).cast("string"),
        ),
    )
    # assert_true yields NULL on success; summing its int cast keeps
    # the guard in the expression tree (a branch whose arms are equal
    # would be constant-folded away, silently dropping the check).
    bucket = F.coalesce(guard.cast("int"), F.lit(0))
    for j, h in enumerate(planes if planes is not None else HYPERPLANES):
        bucket = bucket + F.when(dot_d(vec, _lit_vec(h)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_id: int, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors of one corpus vector (excluding
    itself), deterministic tie-break on id."""
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    return (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_lsh_topk(
    df: DataFrame, id_col: str, vec_col: str, query_id: int, k: int = 10
) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's hyperplane
    bucket, then exact cosine within. Same output columns as
    cosine_topk plus the bucket id."""
    with_bucket = df.select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(F.col(vec_col)).alias("bucket")
    )
    q = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        with_bucket.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(F.col(id_col), F.col("bucket"), cosine(F.col(vec_col), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _q8(vec: Column, scale: Column) -> Column:
    """Symmetric int8-range scalar quantization with a corpus-global
    scale: floor(x · 127 / scale) as BIGINTs. floor (not round) —
    round-half rules differ across engines; floor is exact in both."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * 127 / scale).cast("long")
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i over integer arrays — exact, order-free."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_sq8_rerank(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    pool: int = 50,
) -> DataFrame:
    """ANN via scalar quantization: int8-range quantized vectors give
    a cheap integer-dot prefilter (the SQ8 path every production
    vector store ships — 4x less memory bandwidth, SIMD int8 dots),
    an approximate-cosine pool cut, then EXACT float cosine reranking
    of the constant-size pool. Recall loss is bounded by quantization
    error; the rerank restores exact ordering within the pool.

    Cross-engine exactness: quantized values are floor(x·127/s) with
    a corpus-global scale s = max|x| (no arithmetic in the max, so s
    is bit-identical in both engines); integer dots/norms are exact
    and order-free; approx = dot / sqrt(nq·nv) is a 3-IEEE-op chain
    (no reordered float sums), ROUND 9 before the pool cut with id
    tie-break.

    Scale shape: ONE corpus pass for the scale aggregate (broadcast
    back), one quantized scan for the pool cut (TakeOrderedAndProject
    per-partition heaps), exact rerank on ≤pool rows. At 100 TB the
    quantized representation would be materialized once as an int8
    column, making the prefilter scan ~4x lighter than float32."""
    # greatest(·, 1e-300) guards the all-zero-corpus edge: sc = 0 would
    # make the _q8 divide a job-killing ANSI DIVIDE_BY_ZERO (same class
    # as the nq*nv norm guard below). Identity on any real corpus, and
    # the degenerate case quantizes to all-zero vectors in both engines.
    scale = df.agg(
        F.greatest(
            F.max(F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))),
            F.lit(1e-300),
        ).alias("sc")
    )
    q = (
        df.filter(F.col(id_col) == query_id)
        .crossJoin(F.broadcast(scale))
        .select(
            F.col(vec_col).alias("qv"),
            _q8(F.col(vec_col), F.col("sc")).alias("q8"),
            F.col("sc"),
        )
    )
    base = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.col(vec_col),
            "qv",
            _q8(F.col(vec_col), F.col("sc")).alias("v8"),
            "q8",
        )
    )
    nq = _int_dot(F.col("q8"), F.col("q8"))
    nv = _int_dot(F.col("v8"), F.col("v8"))
    approx = F.round(
        _int_dot(F.col("v8"), F.col("q8")).cast("double")
        / F.sqrt(F.greatest(nq * nv, F.lit(1)).cast("double")),
        9,
    )
    cand = (
        base.select(F.col(id_col), F.col(vec_col), "qv", approx.alias("approx"))
        .orderBy(F.col("approx").desc(), F.col(id_col).asc())
        .limit(pool)
    )
    return (
        cand.select(
            F.col(id_col),
            "approx",
            F.round(cosine(F.col(vec_col), F.col("qv")), 9).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sql_ann_sq8_rerank(query_id: int, k: int = 10, pool: int = 50) -> str:
    """DuckDB oracle mirroring ann_sq8_rerank: same global scale, same
    floor quantization, exact integer dots, identical 3-op approx
    chain, ROUND 9 + id tie-break at both cuts."""
    q8 = "[CAST(floor(CAST(x AS DOUBLE) * 127 / sc) AS BIGINT) for x in embedding]"
    idot = (
        "CAST(list_sum([{a}[i] * {b}[i] for i in range(1, len({a}) + 1)]) AS BIGINT)"
    )
    nq = idot.format(a="q8", b="q8")
    nv = idot.format(a="v8", b="v8")
    dq = idot.format(a="v8", b="q8")
    return f"""
WITH s AS (SELECT greatest(MAX(list_max([abs(x) for x in embedding])), 1e-300) AS sc
           FROM embeddings),
q AS (SELECT embedding AS qv, {q8} AS q8
      FROM embeddings, s WHERE vec_id = {query_id}),
base AS (SELECT vec_id, embedding, qv, {q8} AS v8, q8
         FROM embeddings, s, q WHERE vec_id <> {query_id}),
cand AS (
  SELECT vec_id, embedding, qv,
         ROUND(CAST({dq} AS DOUBLE)
               / sqrt(CAST(greatest({nq} * {nv}, 1) AS DOUBLE)), 9) AS approx
  FROM base
  ORDER BY approx DESC, vec_id ASC LIMIT {pool})
SELECT vec_id, approx,
       ROUND({sql_cosine('embedding', 'qv')}, 9) AS cos
FROM cand
ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


IVF_CELLS = 8
IVF_NPROBE = 2


def _py_dot(a, b) -> float:
    """Driver-side double dot product, sequential — bit-identical to
    dot_d / sql_dot (same fold order, same IEEE ops)."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _py_cos(a, b) -> float:
    import math

    nrm = math.sqrt(_py_dot(a, a)) * math.sqrt(_py_dot(b, b))
    # zero-norm vector: cosine is undefined — treat as no similarity
    # (0.0) instead of a driver-side ZeroDivisionError; the Spark-side
    # `cosine` expression degrades the same comparison-neutral way.
    return _py_dot(a, b) / nrm if nrm else 0.0


def _ids_codebook(df: DataFrame, id_col: str, vec_col: str, cells: int) -> list[tuple[int, list[float]]]:
    """Deterministic codebook: the vectors of the ``cells`` smallest
    ids (oracle-reproducible in plain SQL)."""
    rows = (
        df.orderBy(F.col(id_col).asc())
        .limit(cells)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv"))
        .collect()
    )
    return [(r["cent_id"], [float(x) for x in r["cv"]]) for r in rows]


def _kmeans_codebook(
    df: DataFrame, vec_col: str, cells: int, seed: int = 42, sample_cap: int = 100_000
) -> list[tuple[int, list[float]]]:
    """KMeans-trained codebook (pyspark.ml) — the production centroid
    quality path. Fit runs on a bounded deterministic sample (the fit
    is iterative over its input, so cap it; centroid quality needs a
    representative sample, not the corpus), and only the ``cells``
    centers ever leave the JVM. cent_id = center index."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = df.count()
    sample = df if n <= sample_cap else df.sample(fraction=sample_cap / n, seed=seed)
    feats = sample.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=cells, seed=seed, featuresCol="features").fit(feats)
    return [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]


def _resolve_codebook(
    df: DataFrame, id_col: str, vec_col: str, cells: int, codebook: str
) -> list[tuple[int, list[float]]]:
    """Codebook dispatch shared by ann_ivf_topk and semantic_dedup:
    'ids' (deterministic, oracle-reproducible) or 'kmeans' (balanced
    cells, the production knob)."""
    if codebook == "kmeans":
        return _kmeans_codebook(df.select(vec_col), vec_col, cells)
    if codebook == "ids":
        return _ids_codebook(df, id_col, vec_col, cells)
    raise ValueError(f"unknown codebook {codebook!r} (want 'ids' or 'kmeans')")


_ASSIGN_LITERAL_MAX = 64  # beyond this, the expression-tree form cliffs


def _assign_cells(
    df: DataFrame, id_col: str, vec_col: str, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """argmax-cosine Voronoi assignment of every vector to its nearest
    centroid; ties break to the smaller cent_id. Both paths are
    scan-side (no shuffle); the split is about EXPRESSION size:

    * ≤ _ASSIGN_LITERAL_MAX (64) cells: literal argmax (one cosine
      expression per centroid inside F.greatest) — pure JVM, exactly
      reproducible by the SQL oracle (the oracle-checked default).
    * larger codebooks: the per-centroid expression TREES are what
      cliff — hundreds of aggregate() lambdas in one projection stall
      planning/codegen for tens of minutes (measured: cells=316 on
      100k vectors never finished; the Arrow path does it in
      seconds). The centroid matrix ships in the task closure and
      each Arrow batch is ONE BLAS matmul + argmax. Ties still go to
      the smaller cent_id (rows sorted by cid, np.argmax takes the
      first max), though cosine values may differ from the JVM fold
      in the last ulp — this is the production path, not the
      oracle-parity path."""
    if len(cents) <= _ASSIGN_LITERAL_MAX:
        best = F.greatest(
            *[
                F.struct(
                    cosine(F.col(vec_col), _lit_vec([float(x) for x in cv])).alias("c"),
                    F.lit(-cid).alias("nid"),
                )
                for cid, cv in cents
            ]
        )
        return df.select(
            F.col(id_col), F.col(vec_col), (-best.getField("nid")).alias("cell")
        )

    import numpy as np

    ordered = sorted(cents, key=lambda cc: cc[0])
    cid_arr = np.array([cid for cid, _ in ordered], dtype=np.int64)
    C = np.array([cv for _, cv in ordered], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()
    schema = f"`{id_col}` {id_t}, `{vec_col}` {vec_t}, cell long"

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            best_idx = np.argmax(Vn @ Cn.T, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cell": cid_arr[best_idx],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema)


def ann_ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    codebook: str = "ids",
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into
    ``cells`` Voronoi cells, probe the ``nprobe`` cells nearest the
    query, exact cosine within the probed cells only.

    Codebook (``codebook=``):
      * ``"ids"`` (default): vectors of the ``cells`` smallest ids — a
        deterministic stand-in so the DuckDB oracle can reproduce the
        exact partition (centroid *quality* changes recall, not the
        algebra).
      * ``"kmeans"``: a pyspark.ml KMeans fit on a bounded sample —
        the production centroid-quality path; same plumbing, better
        cell balance (recall pinned vs the exact oracle in
        tests/test_recall.py).

    Scale path (100 TB): centroids are tiny → collected + broadcast
    into a literal argmax expression, so assignment is a pure scan-side
    map (no shuffle, no UDF). Writing the corpus partitioned by
    ``cell`` turns probing into partition pruning: a query touches
    nprobe/cells of the data."""
    cents = _resolve_codebook(df, id_col, vec_col, cells, codebook)
    cent_rows = [{"cent_id": cid, "cv": cv} for cid, cv in cents]
    q_row = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    if q_row is None:
        # Absent query id: empty result, the same contract as
        # cosine_topk/ann_lsh_topk (whose filter-join shape yields
        # zero rows naturally) — not a TypeError on None[0].
        return df.select(
            F.col(id_col),
            F.lit(None).cast("long").alias("cell"),
            F.lit(None).cast("double").alias("cos"),
        ).limit(0)
    qv = [float(x) for x in q_row[0]]
    probe_ids = [
        cid
        for _, cid in sorted(
            ((-_py_cos(qv, [float(x) for x in r["cv"]]), r["cent_id"]) for r in cent_rows)
        )[:nprobe]
    ]
    assigned = _assign_cells(df, id_col, vec_col, cents)
    return (
        assigned.filter(F.col(id_col) != query_id)
        .filter(F.col("cell").isin(probe_ids))
        .select(F.col(id_col), F.col("cell"), cosine(F.col(vec_col), _lit_vec(qv)).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


PQ_M = 8   # subspaces (64-dim -> 8 subvectors of 8)
PQ_K = 16  # centroids per subspace codebook


def _l2sq(a: Column, b: Column) -> Column:
    """Σ (double(a_i) − double(b_i))², sequential fold — the same
    bit-stable shape as dot_d, mirrored by _sql_l2sq_sub."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _py_l2sq(a, b) -> float:
    """Driver-side mirror of _l2sq (same fold order and IEEE ops)."""
    s = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        s += d * d
    return s


def ann_pq_rerank(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    pool: int = 50,
    m: int = PQ_M,
    ncodes: int = PQ_K,
) -> DataFrame:
    """ANN via PRODUCT QUANTIZATION with asymmetric distance (ADC) —
    the memory-bandwidth workhorse of production vector search
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): the vector is split into ``m`` subvectors,
    each coarse-quantized against a per-subspace codebook of
    ``ncodes`` centroids, so a D-dim float32 vector compresses to m
    code bytes (here 64×4 B → 8 B, 32×). The query is NOT quantized:
    per subspace, a table of query↔centroid distances is precomputed
    once, and a corpus vector's approximate distance is m table
    lookups summed — no float math per vector at scan time. The
    approximate pool is then reranked with exact cosine.

    Codebook: the subvectors of the ``ncodes`` smallest-id vectors
    (the IVF ids-codebook trick) — deterministic and reproducible by
    the DuckDB oracle in plain SQL; a k-means codebook is a centroid-
    QUALITY knob (same algebra), like ann_ivf_topk's. RECALL SIZING:
    with the coarse 16-centroid ids-codebooks, the pool must absorb
    the quantization error — measured on the sf0.01 corpus: top-10
    recall 5/10 at pool=50 but 10/10 at pool=150 or ncodes=32+
    (gated in tests/test_recall.py); production tuning is
    per-subspace k-means + pool ≈ 10-20×k.

    Cross-engine exactness: encode is argmin of bit-identical
    sequential L2² folds with code-index tie-break; ADC sums m
    doubles in subspace order (first-element-init fold both sides);
    ROUND 9 + id tie-break before the pool cut; rerank is the proven
    cosine contract.

    Scale shape (100 TB): ONE bounded collect (ncodes rows); encode
    is a scan-side literal expression (m·ncodes small 8-dim folds —
    far below the IVF literal-argmax cliff documented at
    _ASSIGN_LITERAL_MAX); at scale the codes column is materialized
    once and the ADC scan reads m bytes/vector instead of the float
    corpus, with the distance tables riding the task closure."""
    cents = _ids_codebook(df, id_col, vec_col, ncodes)
    q_row = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    if q_row is None:
        return df.select(
            F.col(id_col),
            F.lit(None).cast("double").alias("approx"),
            F.lit(None).cast("double").alias("cos"),
        ).limit(0)
    qv = [float(x) for x in q_row[0]]
    dim = len(qv)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    d = dim // m
    # driver-side query↔centroid distance tables: T[s][j], O(m·ncodes·d)
    tables = [
        [
            _py_l2sq(qv[s * d : (s + 1) * d], cv[s * d : (s + 1) * d])
            for _, cv in cents
        ]
        for s in range(m)
    ]
    # per-subspace encode: argmin L2² over the codebook, ties to the
    # smaller code index; then ADC = left-assoc sum of table lookups
    # in subspace order. Since r12 this runs as an Arrow-batched numpy
    # kernel (guide §4.3) — the expression form was m·ncodes (128)
    # interpreted 8-dim folds per ROW (CodegenFallback), ~8 s of
    # x66's 9 s at sf0.1 (OPTIMIZATION_r12.md §16 has the
    # decomposition). Bit-equality with the expression form: per-(row, code)
    # L2² is the same (x−y)·(x−y) float64 products accumulated by
    # np.cumsum in the fold's left-to-right order; np.argmin returns
    # the FIRST minimum = the sort_array (dist, j) tie-break; the ADC
    # sum adds per-subspace lookups in the same left-assoc order; the
    # distance tables are the same driver-computed float64 values.
    cent_subs = [
        [
            [float(x) for x in cv[s * d : (s + 1) * d]]
            for _, cv in cents
        ]
        for s in range(m)
    ]

    def _encode(batches):
        import numpy as np
        import pandas as pd

        cb = [np.array(cs, dtype=np.float64) for cs in cent_subs]  # m × (ncodes, d)
        tabs = [np.array(t, dtype=np.float64) for t in tables]  # m × (ncodes,)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64, copy=False)
            acc = None
            for s in range(m):
                sub = mat[:, s * d : (s + 1) * d]
                dm = np.empty((len(pdf), len(cb[s])), dtype=np.float64)
                for j in range(len(cb[s])):
                    diff = sub - cb[s][j]
                    dm[:, j] = np.cumsum(diff * diff, axis=1)[:, -1]
                t = tabs[s][np.argmin(dm, axis=1)]
                acc = t if acc is None else acc + t
            yield pd.DataFrame(
                {"_id": pdf["_id"], "_v": pdf["_v"], "_approx": acc}
            )

    encoded = df.filter(F.col(id_col) != query_id).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(
        _encode,
        f"_id {df.schema[id_col].dataType.simpleString()}, "
        f"_v {df.schema[vec_col].dataType.simpleString()}, _approx double",
    )
    cand = (
        encoded.select(
            F.col("_id").alias(id_col), "_v", F.round("_approx", 9).alias("approx")
        )
        .orderBy(F.col("approx").asc(), F.col(id_col).asc())
        .limit(pool)
    )
    return (
        cand.select(
            F.col(id_col),
            "approx",
            F.round(cosine(F.col("_v"), _lit_vec(qv)), 9).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _sql_l2sq_sub(a: str, b: str, s: str, d: int) -> str:
    """DuckDB expression mirroring _l2sq over subspace ``s`` (0-based
    column/expr) of ``a``/``b``: 1-based element indexing, same diff
    product (NOT pow — integer-exponent pow may take a different
    libm path), same sequential fold."""
    diff = f"(cast({a}[{s}*{d}+i] as double) - cast({b}[{s}*{d}+i] as double))"
    return f"list_sum([{diff} * {diff} for i in range(1, {d + 1})])"


def sql_ann_pq_rerank(query_id: int, k: int = 10, pool: int = 50,
                      m: int = PQ_M, ncodes: int = PQ_K, dim: int = _EMB_DIM) -> str:
    """DuckDB oracle mirroring ann_pq_rerank: same ids-codebook, same
    argmin encode (row_number with code tie-break), same per-subspace
    distance tables, ordered ADC fold, ROUND 9 + id tie-break at both
    cuts."""
    d = dim // m
    return f"""
WITH cents AS (SELECT embedding AS cv,
                      row_number() OVER (ORDER BY vec_id) - 1 AS j
               FROM embeddings ORDER BY vec_id LIMIT {ncodes}),
subs AS (SELECT unnest(range({m})) AS s),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id}),
enc AS (
  SELECT e.vec_id, subs.s, cents.j,
         row_number() OVER (PARTITION BY e.vec_id, subs.s
           ORDER BY {_sql_l2sq_sub('e.embedding', 'cents.cv', 'subs.s', d)} ASC,
                    cents.j ASC) AS rn
  FROM embeddings e CROSS JOIN subs CROSS JOIN cents),
codes AS (SELECT vec_id, s, j AS code FROM enc WHERE rn = 1),
qtab AS (SELECT subs.s, cents.j,
                {_sql_l2sq_sub('q.qv', 'cents.cv', 'subs.s', d)} AS t
         FROM q CROSS JOIN subs CROSS JOIN cents),
approx AS (
  SELECT codes.vec_id, ROUND(list_sum(list(qtab.t ORDER BY codes.s)), 9) AS approx
  FROM codes JOIN qtab ON qtab.s = codes.s AND qtab.j = codes.code
  GROUP BY codes.vec_id),
cand AS (SELECT vec_id, approx FROM approx WHERE vec_id <> {query_id}
         ORDER BY approx ASC, vec_id ASC LIMIT {pool})
SELECT cand.vec_id, cand.approx,
       ROUND({sql_cosine('e.embedding', 'qv')}, 9) AS cos
FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id CROSS JOIN q
ORDER BY cos DESC, cand.vec_id ASC LIMIT {k}
"""


DUP_BANDS = 3
_BITS_PER_BAND = NUM_HYPERPLANES // DUP_BANDS


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.5,
    exact: bool = False,
    num_planes: int = NUM_HYPERPLANES,
    bands: int = DUP_BANDS,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold.

    Default path is LSH-banded blocking: ``num_planes`` hyperplane
    sign bits split into ``bands`` bands of num_planes/bands bits;
    two vectors are candidates iff they agree on at least one band,
    and candidates get an exact cosine verify. The blocking key is
    (band, band_value) — one shuffle on a real key, so the pair space
    is Σ_bucket |bucket|² instead of n²: this is the 100 TB path.
    Banding is deterministic (fixed seeded hyperplanes, double math),
    so the DuckDB oracle reproduces the candidate set exactly.
    Recall < 1 by construction (a near-dup pair disagreeing on every
    band is missed).

    VERIFY KERNEL (r12, guide §4.3): the within-bucket pair verify is
    an Arrow-batched numpy kernel (applyInPandas per bucket), not a
    self-join — the r11 join form evaluated an interpreted
    aggregate/zip_with dot per candidate pair (higher-order functions
    are CodegenFallback), measured 13 s of x05's 16 s at sf0.1 with a
    3 s join skeleton (artifacts/DOT_SHAPE_AB_r12.json; a flat 64-term
    codegen chain measured 2x WORSE — it trips the huge-method limit).
    numpy does the same pair space as one vectorized product per
    bucket row block. BIT-EQUALITY with the fold (and so with the
    DuckDB oracle): products are the same float64 multiplies and
    np.cumsum accumulates them in the same left-to-right order as the
    sequential aggregate() — the only divergence is a ±0.0 sign on
    all-zero dots, which the ``cos >= threshold`` gate filters on both
    sides (threshold > 0); zero-norm vectors give nan here vs NULL in
    try_divide, equally excluded. Pinned by
    tests/test_recall.py (banded-vs-exact) and the x05 oracle.

    SIZING (measured, SCALE.md 10x probe): bucket count per band is
    2^(num_planes/bands), a CONSTANT — so expected bucket size grows
    linearly with the corpus and the within-bucket pair space
    quadratically. The demo default (6 planes → 4 buckets/band) is
    right for the sf0.01 oracle corpus and wrong at 10x+; size
    bits-per-band ≈ log2(n / target_bucket) (target a few hundred),
    i.e. planes grow with log n. More bits per band also sharpens
    the match probability curve (fewer false candidates, lower
    per-band recall) — compensate with more bands, which adds a
    linear factor, never a quadratic one.

    ``exact=True`` keeps the all-pairs O(n²) form — the recall oracle
    for tests, never the production path."""
    if exact:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
            .filter(F.col("cos") >= threshold)
        )
    if num_planes % bands:
        raise ValueError("num_planes must divide evenly into bands")
    if num_planes > 30:
        raise ValueError("num_planes > 30 overflows the int bucket id")
    bits_per_band = num_planes // bands
    planes = (
        HYPERPLANES
        if num_planes == NUM_HYPERPLANES
        else _hyperplanes(num=num_planes)
    )
    mask = (1 << bits_per_band) - 1
    # the full num_planes projection is materialized ONCE per row
    # (`_hb`) and bit-sliced per band — inlining hyperplane_bucket
    # inside the explode array would evaluate all num_planes dot
    # products `bands` times per row, and CollapseProject keeps a
    # multiply-referenced non-cheap alias as its own projection, so
    # the hoist survives optimization.
    bands_df = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_bucket(F.col(vec_col), planes).alias("_hb"),
    ).select(
        "_id",
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("_hb"), bits_per_band * j)
                        .bitwiseAND(mask)
                        .alias("bval"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_v", F.col("bk.band").alias("band"), F.col("bk.bval").alias("bval"))

    def _verify(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cos": np.array([], dtype=np.float64),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        order = np.argsort(pdf["_id"].to_numpy(), kind="stable")
        ids = pdf["_id"].to_numpy()[order]
        mat = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64, copy=False)
        # sequential (cumsum) accumulation = the aggregate() fold's
        # left-to-right order — bit-identical survivors (see docstring)
        nrm = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
        out_a, out_b, out_c = [], [], []
        for i in range(m - 1):
            dots = np.cumsum(mat[i] * mat[i + 1 :], axis=1)[:, -1]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (nrm[i] * nrm[i + 1 :])
            keep = cos >= threshold  # nan (zero-norm) fails, like NULL
            if keep.any():
                out_a.append(np.full(int(keep.sum()), ids[i], dtype=np.int64))
                out_b.append(ids[i + 1 :][keep])
                out_c.append(cos[keep])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return (
        bands_df.groupBy("band", "bval")
        .applyInPandas(_verify, "id_a long, id_b long, cos double")
        .distinct()
    )


def knn_join_exact(
    queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Batch k-NN join: for EVERY query vector, its exact top-k cosine
    neighbors from the corpus — the retrieval / embedding-level
    decontamination shape (query batch ≪ corpus). The query side
    broadcasts (a query batch is small by construction), so the corpus
    streams through map-side with NO shuffle of the big side; the only
    shuffle is the per-query window top-k, keyed by query id over
    k·|queries| candidate rows per partition — at 1000 executors the
    window input is |corpus|·|queries|/executors pairs scored locally,
    reduced to top-k per partition by the rank pushdown before the
    exchange."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col), cosine(F.col(vec_col), F.col("qv")).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col(id_col), "cos", "rn")
    )


def knn_join_lsh(
    queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Approximate k-NN join for query batches too big to broadcast:
    hyperplane-bucket BOTH sides and equi-join on the bucket — the
    cross product collapses to within-bucket pairs and the join
    shuffles on a real key, so both sides may be arbitrarily large.
    Recall < 1 by construction (neighbors in other buckets are
    missed); same deterministic scoring as the exact form."""
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col)).alias("bucket"),
    )
    cb = corpus.select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(F.col(vec_col)).alias("cbucket")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cb.join(qb, (F.col("cbucket") == F.col("bucket")) & (F.col(id_col) != F.col("query_id")))
        .select("query_id", F.col(id_col), cosine(F.col(vec_col), F.col("qv")).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col(id_col), "cos", "rn")
    )


# --- DuckDB oracle SQL fragments (shared constants inlined) ---


def sql_dot(a: str, b: str) -> str:
    """DuckDB expression mirroring dot_d bit-for-bit."""
    return (
        f"list_sum([cast({a}[i] as double)*cast({b}[i] as double) "
        f"for i in range(1, len({a})+1)])"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


def sql_hyperplane_bucket(vec: str, planes: list[list[float]] | None = None) -> str:
    """DuckDB expression mirroring hyperplane_bucket (same optional
    ``planes`` override — pass _hyperplanes(num=N) on both sides for
    scale-sized bandings). Float literals use repr() round-tripping
    so both engines parse identical doubles."""
    terms = []
    for j, h in enumerate(HYPERPLANES if planes is None else planes):
        lit = "[" + ", ".join(repr(x) for x in h) + "]"
        terms.append(f"(case when {sql_dot(vec, lit)} > 0 then {1 << j} else 0 end)")
    return "(" + " + ".join(terms) + ")"


SEM_CELLS = 8  # coarse clusters for semantic dedup
SEM_TAU = 0.85  # within-cluster cosine cutoff


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cells: int = SEM_CELLS,
    tau: float = SEM_TAU,
    codebook: str = "ids",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space semantic
    deduplication — coarse-cluster the corpus, then inside each
    cluster drop every vector that has a lower-id neighbor with
    cosine ≥ ``tau``. Returns one row per vector:
    (vec_id, cell, kept).

    Differs from `embedding_dup_pairs` (LSH banding) in blocking
    geometry: Voronoi cells from a codebook give each vector exactly
    ONE block, so the pair join touches each cluster once and the
    output is a per-document keep/drop verdict rather than a pair
    list — the form a curation pipeline consumes directly.

    Drop rule = "∃ lower-id in-cluster neighbor ≥ tau" (not greedy
    chain removal): deterministic, order-free — the published SemDeDup
    approximation. The within-cell pair scan is the same Arrow-batched
    numpy kernel as embedding_dup_pairs' verify (r12, guide §4.3): the
    r11 self-join evaluated THREE interpreted fold dots per candidate
    pair in the join filter (cosine un-hoisted); the kernel does one
    vectorized product block per row with cumsum accumulation —
    bit-identical survivors for tau > 0 (see embedding_dup_pairs'
    docstring for the float-order argument).

    Scale shape (100 TB): codebook is tiny (collected + broadcast
    into a literal argmax — assignment is scan-side, no shuffle);
    the only shuffle is the cell-keyed self-join. Within-cell cost
    is O(size²): production uses enough cells to bound sizes
    (√n rule) via ``codebook="kmeans"`` — the same knob as IVF; the
    "ids" codebook keeps the DuckDB oracle exact. Measured (SCALE.md
    10x probe): cells=8 at 10k vectors is 232s (quadratic within
    cells), cells=√n at 20k is 142s and linear — dominated by the
    assignment argmax, which is O(cells·dim) per row; past ~hundreds
    of cells flip the literal argmax to a broadcast-join of the
    codebook + per-row window-min so the expression stays bounded."""
    cents = _resolve_codebook(df, id_col, vec_col, cells, codebook)
    # assigned feeds BOTH self-join sides and the final verdict join:
    # unpersisted, the O(cells·dim)-per-row argmax assignment (the
    # measured dominant cost at 10x scale, see docstring) re-evaluates
    # once per reference (r12, guide §2.1). Row-bounded by the corpus;
    # cache lifecycle as minhash_dedup_pairs (lazy persist, caller
    # clearCache between queries).
    assigned = _assign_cells(df, id_col, vec_col, cents).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    def _drop(pdf):
        import numpy as np
        import pandas as pd

        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"_dropped_id": np.array([], dtype=np.int64)})
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        mat = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64, copy=False)
        nrm = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
        dropped = np.zeros(m, dtype=bool)
        # pair (i < j): j is dropped if cos(i, j) >= tau — EVERY
        # lower-id i counts, dropped or not (no greedy chaining)
        for i in range(m - 1):
            dots = np.cumsum(mat[i] * mat[i + 1 :], axis=1)[:, -1]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (nrm[i] * nrm[i + 1 :])
            dropped[i + 1 :] |= cos >= tau  # nan (zero-norm) fails, like NULL
        return pd.DataFrame({"_dropped_id": ids[dropped]})

    dropped = assigned.groupBy("cell").applyInPandas(_drop, "_dropped_id long")
    return (
        assigned.join(
            dropped, assigned[id_col] == dropped["_dropped_id"], "left"
        )
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("_dropped_id").isNull().alias("kept"),
        )
    )
