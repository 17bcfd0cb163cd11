"""LLM-data-pipeline extension workload: dedup (exact / MinHash-LSH /
SimHash / n-gram-Jaccard / embedding-cosine), similarity search
(brute-force + hyperplane-LSH ANN), text analysis (language ID,
quality, token counting, fingerprinting), and multimodal binary
plumbing. Mandated by BASELINE.json's north star; no reference analog.

Every oracle mirrors the Spark logic expression-for-expression
(tokenizer regex, stopword lists, hyperplane constants, double-cast
sequential sums) so even the approximate-algorithm pipelines
hash-match where their output is deterministic. ALL queries in this
module are oracle-backed — including SimHash, whose x03 query runs
the md5-based 60-bit parity variant (simhash60_md5) that DuckDB can
reproduce nibble-for-nibble; the xxhash64 production variant is
covered by equivalence tests against it (tests/test_skew.py) since
DuckDB lacks xxhash64. See COVERAGE.md for the per-query oracle map.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_query_processor_spark.catalog import load_table
from database_query_processor_spark.functions import text as TX
from database_query_processor_spark.operators import corpus as CP
from database_query_processor_spark.operators import dedup as DD
from database_query_processor_spark.operators import multimodal as MM
from database_query_processor_spark.operators import similarity as SIM
from database_query_processor_spark.workload import QuerySpec

# --- shared DuckDB fragments (mirror functions/text.py verbatim) ---

TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"
NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
GRAMS_SQL = (
    "list_distinct([array_to_string(list_slice(toks, i, i+2), ' ') "
    "for i in range(1, len(toks)-1)])"
)


def _stop_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang])
    return f"len(list_intersect(list_distinct(toks), [{words}]))"


# Exact Jaccard pair set via the inverted index (equivalent to the
# all-pairs form for any threshold > 0 — pairs sharing no shingle have
# jaccard 0 — but the join cost is sum(df^2) over shingles, not n^2/2
# list intersections).
JACCARD_PAIRS_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS_SQL} AS grams FROM t),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, shared / (sa.n + sb.n - shared) AS jaccard
FROM shared JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
WHERE shared / (sa.n + sb.n - shared) >= 0.5
"""

# Mirrors the df-capped (stopword-filtered) Jaccard in
# ngram_jaccard_pairs: shingles with document frequency > NGRAM_DF_CAP
# are excluded from the similarity universe (neither intersection nor
# set sizes); within it the Jaccard is exact, via the same
# inverted-index self-join shape.
JACCARD_CAPPED_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS_SQL} AS grams FROM t),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
rare AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) <= {DD.NGRAM_DF_CAP}),
idx AS (SELECT doc_id, gram FROM ex JOIN rare USING (gram)),
sizes AS (SELECT doc_id, count(*) AS n FROM idx GROUP BY doc_id),
shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM idx a JOIN idx b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, shared / (sa.n + sb.n - shared) AS jaccard
FROM shared JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
WHERE shared / (sa.n + sb.n - shared) >= 0.5
"""

# Mirrors the banded-LSH blocking in embedding_dup_pairs: same bucket
# bits, same 3 bands of 2 bits, same exact-cosine verify — the oracle
# reproduces the candidate set bit-for-bit (banding is deterministic).
COSINE_PAIRS_SQL = f"""
WITH b AS (SELECT vec_id, embedding,
                  sqrt({SIM.sql_dot('embedding', 'embedding')}) AS nrm,
                  {SIM.sql_hyperplane_bucket('embedding')} AS bucket
           FROM embeddings),
bands AS (SELECT vec_id, embedding, nrm, band, (bucket >> (2 * band)) & 3 AS bval
          FROM b, (SELECT unnest([0, 1, 2]) AS band) t)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       {SIM.sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cos
FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
WHERE {SIM.sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= 0.5
"""

COSINE_TOPK_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {SIM.sql_cosine('embedding', 'qv')} AS cos
FROM embeddings, q WHERE vec_id <> 0
ORDER BY cos DESC, vec_id ASC LIMIT 10
"""

ANN_LSH_SQL = f"""
WITH b AS (SELECT vec_id, embedding, {SIM.sql_hyperplane_bucket('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
SELECT vec_id, bucket, {SIM.sql_cosine('embedding', 'qv')} AS cos
FROM b, q WHERE bucket = qbucket AND vec_id <> 0
ORDER BY cos DESC, vec_id ASC LIMIT 10
"""

ANN_IVF_SQL = f"""
WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
               ORDER BY vec_id LIMIT {SIM.IVF_CELLS}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {SIM.sql_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
probe AS (SELECT cent_id FROM cents, q
          ORDER BY {SIM.sql_cosine('cv', 'qv')} DESC, cent_id LIMIT {SIM.IVF_NPROBE})
SELECT a.vec_id, a.cell, {SIM.sql_cosine('a.embedding', 'qv')} AS cos
FROM assign a, q
WHERE a.vec_id <> 0 AND a.cell IN (SELECT cent_id FROM probe)
ORDER BY cos DESC, a.vec_id ASC LIMIT 10
"""

LANGID_SQL = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
  CASE WHEN text IS NULL THEN NULL
       WHEN regexp_matches(text, '{TX.CJK_RE}') THEN 'zh'
       WHEN {_stop_sql('en')} = 0 AND {_stop_sql('de')} = 0
            AND {_stop_sql('fr')} = 0 AND {_stop_sql('es')} = 0 THEN 'und'
       WHEN {_stop_sql('en')} >= {_stop_sql('de')} AND {_stop_sql('en')} >= {_stop_sql('fr')}
            AND {_stop_sql('en')} >= {_stop_sql('es')} THEN 'en'
       WHEN {_stop_sql('de')} >= {_stop_sql('fr')} AND {_stop_sql('de')} >= {_stop_sql('es')} THEN 'de'
       WHEN {_stop_sql('fr')} >= {_stop_sql('es')} THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM t
"""

_EN_OCC = "len(list_filter(toks, t -> list_contains([{}], t)))".format(
    ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])
)

QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
  len(toks) AS n_tokens,
  (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1) AS punct_ratio,
  {_EN_OCC} / greatest(len(toks), 1) AS stopword_ratio,
  least(1.0, len(toks) / 50.0)
    * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1))
    * (0.5 + 0.5 * ({_EN_OCC} / greatest(len(toks), 1))) AS quality
FROM t
"""

TOKENS_SQL_Q = f"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS ws_tokens,
  len(regexp_extract_all(text, '{TX.BPE_ISH_RE}')) AS bpe_tokens,
  length(text) AS n_chars_calc
FROM documents
"""


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- builds ---


def dedup_exact(spark, sf_dir):
    return DD.exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


def dedup_minhash(spark, sf_dir):
    return DD.minhash_dedup_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text")


def dedup_simhash(spark, sf_dir):
    # bucket_cap=None = the exact-hamming all-pairs form the quadratic
    # DuckDB oracle computes — a TEST-SCALE setting (sf0.01/sf0.1
    # buckets are small enough to pair exhaustively). The FUNCTION
    # default is the capped scale-safe chain (SIMHASH_BUCKET_CAP);
    # test_skew.py proves its candidate bound on a planted mega-bucket.
    return DD.simhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", hash_fn="md5",
        bucket_cap=None,
    )


def _simhash_oracle():
    nibs = (
        "[[strpos('0123456789abcdef', md5(x)[i]) - 1 for i in range(1, 16)] "
        "for x in list_distinct(toks)]"
    )
    return f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents
           WHERE len({TOKS_SQL}) > 0),
n AS (SELECT doc_id, {nibs} AS nibs FROM t),
s AS (SELECT doc_id, {DD.sql_simhash60('nibs')} AS sh FROM n),
bands AS (SELECT doc_id, sh, band, (sh >> (15 * band)) & 32767 AS bits
          FROM s, (SELECT unnest([0, 1, 2, 3]) AS band) tb),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 bit_count(xor(a.sh, b.sh)) AS hamming
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
"""


def dedup_ngram_jaccard(spark, sf_dir):
    return DD.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text")


def dedup_embedding(spark, sf_dir):
    return SIM.embedding_dup_pairs(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")


def sim_cosine_topk(spark, sf_dir):
    return SIM.cosine_topk(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0)


def sim_ann_lsh(spark, sf_dir):
    return SIM.ann_lsh_topk(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0)


def sim_ann_ivf(spark, sf_dir):
    return SIM.ann_ivf_topk(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0)


def text_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.lang_id("text").alias("lang_pred"))


def text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    n_toks = F.size(toks)
    en = F.array(*[F.lit(w) for w in TX.STOPWORDS["en"]])
    sw_ratio = F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / F.greatest(n_toks, F.lit(1))
    pr = TX.punct_ratio("text")
    return d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        pr.alias("punct_ratio"),
        sw_ratio.alias("stopword_ratio"),
        (F.least(F.lit(1.0), n_toks / F.lit(50.0)) * (F.lit(1.0) - pr)
         * (F.lit(0.5) + F.lit(0.5) * sw_ratio)).alias("quality"),
    )


def text_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.ws_token_count("text").alias("ws_tokens"),
        TX.bpe_ish_token_count("text").alias("bpe_tokens"),
        F.length("text").alias("n_chars_calc"),
    )


def text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.content_fingerprint("text").alias("fingerprint"))


def text_scrub(spark, sf_dir):
    """PII scrub parity: inject synthetic email+URL into every 3rd doc
    (deterministic function of doc_id — the corpus itself is
    PII-free), scrub, and report what was removed."""
    d = _t(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com via "),
            F.lit("https://example.org/u/"), F.col("doc_id"),
        ),
    ).otherwise(F.col("text"))
    return d.select(
        "doc_id",
        TX.pii_scrub(injected).alias("clean_text"),
        injected.rlike(TX.EMAIL_RE).alias("had_email"),
        injected.rlike(TX.URL_RE).alias("had_url"),
    )


SCRUB_SQL = f"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || doc_id || '@example.com via '
                   || 'https://example.org/u/' || doc_id
              ELSE text END AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{TX.URL_RE}', '<URL>', 'g'),
                      '{TX.EMAIL_RE}', '<EMAIL>', 'g') AS clean_text,
       regexp_matches(t, '{TX.EMAIL_RE}') AS had_email,
       regexp_matches(t, '{TX.URL_RE}') AS had_url
FROM inj
"""


# --- end-to-end cleaning pipeline (the composition flagship) ---


def pipeline_clean_corpus(spark, sf_dir):
    """The whole training-data prep story as ONE declarative plan:
    language-gate (en) → quality-gate (≥0.3) → PII scrub → exact dedup
    (keep min doc_id per fingerprint) → per-survivor stats. Catalyst
    fuses the gates and scrub into the scan projection; the only
    shuffle is the dedup aggregation.

    r11 shape (guide §2.3: shuffle fewer bytes / aggregate before you
    shuffle): the survivor stats (length + token count of the scrubbed
    text) are computed in the SCAN projection, and the min-doc_id
    dedup is a groupBy(fingerprint) with min(doc_id) + min_by(stat,
    doc_id) — a HashAggregate with a map-side partial (min(struct)
    would fall back to SortAggregate: complex-typed buffer), so the
    exchange carries (fingerprint, 3 ints) instead of the previous
    row_number() window, which shuffled the ENTIRE scrubbed document
    text per row and paid a sort on both sides of the exchange.
    doc_id is unique, so min_by picks exactly the row_number()==1
    row's stats. clean_text sits behind an optimizer fence so the two
    stats read ONE scrubbed string instead of re-inlining the scrub
    regexes."""
    d = _t(spark, sf_dir, "documents")

    clean_fenced = F.when(
        F.monotonically_increasing_id() >= -1, TX.pii_scrub(F.col("text"))
    )
    gated = CP.clean_gate(d, "doc_id", "text", min_quality=0.3).select(
        "doc_id",
        clean_fenced.alias("clean_text"),
        TX.content_fingerprint("text").alias("fingerprint"),
    ).select(
        "fingerprint",
        "doc_id",
        F.length("clean_text").alias("n_chars_clean"),
        F.size(TX.tokens("clean_text")).alias("n_tokens_clean"),
    )
    return gated.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("n_chars_clean", "doc_id").alias("n_chars_clean"),
        F.min_by("n_tokens_clean", "doc_id").alias("n_tokens_clean"),
    ).drop("fingerprint")


_QUALITY_EXPR = (
    f"least(1.0, len(toks) / 50.0)"
    f" * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1))"
    f" * (0.5 + 0.5 * ({_EN_OCC} / greatest(len(toks), 1)))"
)

_LANG_EN_PRED = (
    f"NOT regexp_matches(text, '{TX.CJK_RE}')"
    f" AND NOT ({_stop_sql('en')} = 0 AND {_stop_sql('de')} = 0"
    f"          AND {_stop_sql('fr')} = 0 AND {_stop_sql('es')} = 0)"
    f" AND {_stop_sql('en')} >= {_stop_sql('de')}"
    f" AND {_stop_sql('en')} >= {_stop_sql('fr')}"
    f" AND {_stop_sql('en')} >= {_stop_sql('es')}"
)

PIPELINE_SQL = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents),
gated AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '{TX.URL_RE}', '<URL>', 'g'),
                        '{TX.EMAIL_RE}', '<EMAIL>', 'g') AS clean_text,
         md5({NORM_SQL}) AS fingerprint
  FROM t
  WHERE ({_LANG_EN_PRED}) AND ({_QUALITY_EXPR}) >= 0.3),
kept AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM gated GROUP BY fingerprint)
SELECT g.doc_id, length(g.clean_text) AS n_chars_clean,
       len(list_filter(regexp_split_to_array(lower(g.clean_text), '[^a-z0-9]+'),
                       x -> len(x) > 0)) AS n_tokens_clean
FROM gated g JOIN kept k ON g.fingerprint = k.fingerprint AND g.doc_id = k.doc_id
"""


# --- corpus-level training-data prep (operators/corpus.py) ---

GRAMS5_SQL = (
    "list_distinct([array_to_string(list_slice(toks, i, i+4), ' ') "
    "for i in range(1, len(toks)-3)])"
)

CLUSTERS_SQL = f"""
WITH RECURSIVE t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS_SQL} AS grams FROM t),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
sh AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pr AS MATERIALIZED (
  SELECT id_a, id_b, shared, sa.n AS na, sb.n AS nb
  FROM sh JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id),
e AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pr WHERE shared / (na + nb - shared) >= 0.5
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pr WHERE shared / (na + nb - shared) >= 0.5),
reach(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id)
SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
"""

DECONTAM_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS5_SQL} AS grams FROM t),
bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0),
h AS (SELECT doc_id, count(*) AS n FROM tg JOIN bg USING (gram) GROUP BY doc_id)
SELECT d.doc_id, coalesce(h.n, 0) AS n_bench_grams,
       coalesce(h.n, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d LEFT JOIN h USING (doc_id)
"""

CHUNKS_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             CAST(greatest(1, ceil((len(toks) - {CP.CHUNK_SIZE}) / {float(CP.CHUNK_STRIDE)}) + 1) AS BIGINT) AS n_chunks
      FROM t),
c AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM n)
SELECT doc_id, chunk_idx,
       array_to_string(list_slice(toks, chunk_idx*{CP.CHUNK_STRIDE}+1,
                                  chunk_idx*{CP.CHUNK_STRIDE}+{CP.CHUNK_SIZE}), ' ') AS chunk_text,
       len(list_slice(toks, chunk_idx*{CP.CHUNK_STRIDE}+1,
                      chunk_idx*{CP.CHUNK_STRIDE}+{CP.CHUNK_SIZE})) AS n_chunk_tokens
FROM c
"""

STRATUM_SQL = ("CASE WHEN length(text) < 200 THEN 'short' "
               "WHEN length(text) < 400 THEN 'medium' ELSE 'long' END")
SAMPLE_RATES = {"short": 5, "medium": 20, "long": 60}

SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN {CP.sql_det_hash('doc_id')} % 100 < 5 THEN 'test'
            WHEN {CP.sql_det_hash('doc_id')} % 100 < 10 THEN 'val'
            ELSE 'train' END AS split
FROM documents
"""

SAMPLE_SQL = f"""
SELECT doc_id, {STRATUM_SQL} AS stratum FROM documents
WHERE {CP.sql_det_hash('doc_id')} % 100 <
      CASE {STRATUM_SQL} WHEN 'short' THEN 5 WHEN 'medium' THEN 20 ELSE 60 END
"""

SHUFFLE_SQL = f"""
SELECT doc_id, {CP.sql_det_hash('doc_id')} AS shuffle_key,
       row_number() OVER (ORDER BY {CP.sql_det_hash('doc_id')}, doc_id) AS pos
FROM documents
"""

_WS_COUNT_SQL = "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0))"
JSONL_SQL = f"""
SELECT doc_id,
       '{{"doc_id":' || doc_id || ',"n_tokens":' || {_WS_COUNT_SQL} || ',"text":"' ||
       {CP.sql_json_escape('text')}
       || '"}}' AS json_line
FROM documents
"""


def dedup_clusters(spark, sf_dir):
    """Near-dup pairs (MinHash-LSH + exact verify) resolved to
    canonical clusters via distributed connected components; every
    doc gets a cluster_id = min doc_id of its component."""
    d = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_dedup_pairs(d, "doc_id", "text").select("id_a", "id_b")
    labels = CP.connected_components(d.select("doc_id"), pairs)
    return labels.select(F.col("node_id").alias("doc_id"), "cluster_id")


def dedup_keep_best(spark, sf_dir):
    """x42: the curation step after clustering — near-dup clusters
    (MinHash-LSH + connected components, as x18) resolved to ONE
    canonical document each, chosen by the x09 quality score
    (ties → smallest doc_id)."""
    d = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_dedup_pairs(d, "doc_id", "text").select("id_a", "id_b")
    labels = CP.connected_components(d.select("doc_id"), pairs)
    scores = d.select("doc_id", TX.quality_score("text").alias("score"))
    return CP.keep_best_per_cluster(labels, scores)


KEEP_BEST_SQL = f"""
WITH RECURSIVE t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS_SQL} AS grams FROM t),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
sh AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pr AS MATERIALIZED (
  SELECT id_a, id_b, shared, sa.n AS na, sb.n AS nb
  FROM sh JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id),
e AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pr WHERE shared / (na + nb - shared) >= 0.5
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pr WHERE shared / (na + nb - shared) >= 0.5),
reach(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id),
labels AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
q AS (SELECT doc_id,
             least(1.0, len(toks) / 50.0)
               * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1))
               * (0.5 + 0.5 * ({_EN_OCC} / greatest(len(toks), 1))) AS score
      FROM t),
ranked AS (SELECT cluster_id, l.doc_id, score,
                  row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY score DESC, l.doc_id ASC) AS rn,
                  count(*) OVER (PARTITION BY cluster_id) AS n_docs
           FROM labels l JOIN q ON l.doc_id = q.doc_id)
SELECT cluster_id, doc_id AS keep_doc_id, n_docs, score AS best_score
FROM ranked WHERE rn = 1
"""


def dedup_soft_weights(spark, sf_dir):
    """x45: duplication-aware training weights — soft dedup. Instead
    of dropping near-duplicates, every document gets weight
    1/|cluster| so each content cluster contributes one unit of loss
    mass in training (the common alternative to hard dedup when
    duplicates carry distributional signal). Same cluster machinery
    as x18; the weight is a scan-side map over the labels."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_dedup_pairs(d, "doc_id", "text").select("id_a", "id_b")
    labels = CP.connected_components(d.select("doc_id"), pairs)
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("node_id").alias("doc_id"),
        "cluster_id",
        F.count("*").over(w).alias("n_dup"),
        (F.lit(1.0) / F.count("*").over(w)).alias("weight"),
    )


SOFT_WEIGHTS_SQL = f"""
WITH RECURSIVE t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS_SQL} AS grams FROM t),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
sh AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pr AS MATERIALIZED (
  SELECT id_a, id_b, shared, sa.n AS na, sb.n AS nb
  FROM sh JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id),
e AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pr WHERE shared / (na + nb - shared) >= 0.5
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pr WHERE shared / (na + nb - shared) >= 0.5),
reach(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.id),
labels AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS n_dup,
       1.0::DOUBLE / count(*) OVER (PARTITION BY cluster_id) AS weight
FROM labels
"""


def corpus_decontaminate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return CP.decontaminate(d, "doc_id", "text", F.col("doc_id") % 97 == 0, n=5)


def corpus_fuzzy_decontaminate(spark, sf_dir):
    """x52: near-dup decontamination — train docs with 3-gram Jaccard
    >= 0.5 against ANY benchmark doc (doc_id % 97 == 0) are flagged.
    Exact broadcast inverted-index form, not LSH: a leakage gate
    cannot afford banding's mid-similarity recall loss
    (operators/corpus.py:jaccard_decontaminate)."""
    d = _t(spark, sf_dir, "documents")
    return CP.jaccard_decontaminate(
        d, "doc_id", "text", F.col("doc_id") % 97 == 0, threshold=0.5
    )


FUZZY_DECONTAM_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, doc_id % 97 = 0 AS is_bench, {GRAMS_SQL} AS grams FROM t),
bex AS (SELECT doc_id AS bench_id, len(grams) AS nb, unnest(grams) AS gram
        FROM g WHERE is_bench),
tex AS (SELECT doc_id, len(grams) AS nt, unnest(grams) AS gram
        FROM g WHERE NOT is_bench),
shared AS (SELECT doc_id, bench_id, nt, nb, count(*) AS shared
           FROM tex JOIN bex USING (gram) GROUP BY 1, 2, 3, 4),
best AS (SELECT doc_id, max(shared / (nt + nb - shared)) AS mj
         FROM shared GROUP BY doc_id)
SELECT g.doc_id, coalesce(mj, 0.0) AS max_bench_jaccard,
       coalesce(mj, 0.0) >= 0.5 AS contaminated
FROM g LEFT JOIN best ON g.doc_id = best.doc_id
WHERE NOT is_bench
"""


def corpus_token_drift(spark, sf_dir):
    """x53: token-distribution drift between two document sources —
    top-20 KL-divergence contributions of src0 vs src1 with add-one
    smoothing (operators/corpus.py:token_drift). The "did this crawl
    change under me" monitoring primitive."""
    return CP.token_drift(
        _t(spark, sf_dir, "documents"), "text", "source", "src0", "src1"
    )


TOKEN_DRIFT_SQL = f"""
WITH t AS (SELECT source AS sl, unnest({TOKS_SQL}) AS token
           FROM documents WHERE source IN ('src0', 'src1')),
c AS (SELECT token,
             CAST(SUM(CASE WHEN sl = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS count_a,
             CAST(SUM(CASE WHEN sl = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS count_b
      FROM t GROUP BY token),
tot AS (SELECT CAST(SUM(count_a) AS BIGINT) AS na,
               CAST(SUM(count_b) AS BIGINT) AS nb,
               COUNT(*) AS v FROM c)
SELECT token, count_a, count_b,
       ROUND(((count_a + 1) / CAST(na + v AS DOUBLE))
             * ln(((count_a + 1) / CAST(na + v AS DOUBLE))
                  / ((count_b + 1) / CAST(nb + v AS DOUBLE))), 9) AS drift_contrib
FROM c, tot
ORDER BY drift_contrib DESC, token ASC
LIMIT 20
"""


def corpus_profile(spark, sf_dir):
    """x54: one-pass corpus profile (the dataset-card numbers): per-
    language rows plus the all-corpus rollup row from a single scan —
    doc/source counts, char/token volume, exact median/p95 lengths.
    One shuffle (the rollup aggregate); percentiles use the same
    exact interpolated form as c21."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "lang", "source", "n_chars", F.size(TX.tokens("text")).alias("_nt")
        )
        .rollup("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("_nt").alias("total_tokens"),
            F.expr("percentile(n_chars, 0.5D)").alias("median_chars"),
            F.expr("percentile(n_chars, 0.95D)").alias("p95_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            "n_docs", "n_sources", "total_chars", "total_tokens",
            "median_chars", "p95_chars",
        )
    )


CORPUS_PROFILE_SQL = f"""
SELECT coalesce(lang, '(all)') AS lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len({TOKS_SQL})) AS BIGINT) AS total_tokens,
       quantile_cont(n_chars, 0.5) AS median_chars,
       quantile_cont(n_chars, 0.95) AS p95_chars
FROM documents
GROUP BY ROLLUP(lang)
"""


def corpus_chunks(spark, sf_dir):
    return CP.chunk_documents(_t(spark, sf_dir, "documents"), "doc_id", "text")


def corpus_split(spark, sf_dir):
    return CP.train_val_test_split(_t(spark, sf_dir, "documents"), "doc_id")


def corpus_safe_split(spark, sf_dir):
    """x44: contamination-aware split — the x43 hash-gate split with
    benchmark-overlapping documents (x19's 5-gram test) forced to a
    'quarantine' label so no contaminated document can land in train.
    The flags frame is doc_id + one boolean (broadcast-sized at any
    corpus scale where the benchmark is a fixed slice); the split
    itself stays a scan-side map."""
    d = _t(spark, sf_dir, "documents")
    flags = CP.decontaminate(d, "doc_id", "text", F.col("doc_id") % 97 == 0).select(
        "doc_id", "contaminated"
    )
    split = CP.train_val_test_split(d, "doc_id")
    return (
        split.join(flags, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("contaminated"), F.lit("quarantine"))
            .otherwise(F.col("split"))
            .alias("split"),
        )
    )


SAFE_SPLIT_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS5_SQL} AS grams FROM t),
bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0),
h AS (SELECT doc_id, count(*) AS n FROM tg JOIN bg USING (gram) GROUP BY doc_id),
s AS (SELECT doc_id,
             CASE WHEN {CP.sql_det_hash('doc_id')} % 100 < 5 THEN 'test'
                  WHEN {CP.sql_det_hash('doc_id')} % 100 < 10 THEN 'val'
                  ELSE 'train' END AS split
      FROM documents WHERE doc_id % 97 <> 0)
SELECT s.doc_id,
       CASE WHEN coalesce(h.n, 0) > 0 THEN 'quarantine' ELSE s.split END AS split
FROM s LEFT JOIN h USING (doc_id)
"""


def corpus_sample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    stratum = (
        F.when(F.length("text") < 200, "short")
        .when(F.length("text") < 400, "medium")
        .otherwise("long")
    )
    return CP.stratified_sample(d, "doc_id", stratum, SAMPLE_RATES).select(
        "doc_id", "stratum"
    )


def corpus_shuffle(spark, sf_dir):
    return CP.train_order(_t(spark, sf_dir, "documents"), "doc_id")


def corpus_jsonl(spark, sf_dir):
    return CP.to_jsonl(_t(spark, sf_dir, "documents"), "doc_id", "text")


def multimodal_decode(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return MM.decode_image_batch(MM.with_binary_payload(d, "doc_id", "text"))


def multimodal_resize(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return MM.resize_image_batch(MM.with_binary_payload(d, "doc_id", "text"))


def multimodal_frames(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return MM.sample_frames(MM.with_binary_payload(d, "doc_id", "text"))


def multimodal_features(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = MM.extract_features_batch(MM.with_binary_payload(d, "doc_id", "text"))
    # explode to scalar rows so the value-hash compare is
    # representation-independent (array renderings differ per engine)
    return out.select("doc_id", F.posexplode("features").alias("pos", "feature"))


# Fake-codec arithmetic mirrored from operators/multimodal.py:
# n = payload bytes, width = 64 + n%512, height = 64 + (n*7)%512,
# n_frames = 1 + n%8, feature_i = ((n*(i+3)) mod 97)/97.
_N_BYTES = "octet_length(encode(text))"

RESIZE_SQL = f"""
WITH d AS (SELECT doc_id, 64 + {_N_BYTES} % 512 AS width,
                  64 + ({_N_BYTES} * 7) % 512 AS height FROM documents)
SELECT doc_id, width, height,
       CAST(floor(width * least(1.0, 128.0 / greatest(width, height))) AS BIGINT) AS out_width,
       CAST(floor(height * least(1.0, 128.0 / greatest(width, height))) AS BIGINT) AS out_height
FROM d
"""

FRAMES_SQL = f"""
WITH b AS (SELECT doc_id, 1 + {_N_BYTES} % 8 AS n_frames FROM documents)
SELECT doc_id, unnest(range(0, n_frames, 2)) AS frame_idx FROM b
"""

FEATURES_SQL = f"""
WITH b AS (SELECT doc_id, {_N_BYTES} AS n FROM documents),
i AS (SELECT unnest(range(0, 8)) AS pos)
SELECT b.doc_id, i.pos, CAST((b.n * (i.pos + 3)) % 97 AS DOUBLE) / 97.0 AS feature
FROM b CROSS JOIN i
"""


def _knn_query_modulus(n_vecs: int) -> int:
    """Scale-bounded demo query batch for x28: stride 20 per 1000
    corpus vectors, i.e. ~50 queries at ANY corpus size above 1000
    (25 at the 500-vector sf0.01 driver scale — bit-identical to the
    historical fixed %20 there). knn_join_exact is O(|corpus| x
    |queries|) BY DEFINITION — it is the verification baseline, x29's
    LSH form is the both-sides-large scale path — so the demo batch
    growing linearly with the corpus made the sf1 sweep row pay
    O(n^2) pure verification overhead (570 s, the slowest x-row in
    r8). A sized query pool keeps the exact form's check linear in
    the corpus while still exercising every mechanism (broadcast
    batch, map-side scoring, per-query window top-k). The DuckDB
    oracle computes the SAME modulus from the same table via a scalar
    subquery, so both sides stay in lockstep at every sf."""
    import math

    return 20 * max(1, math.ceil(n_vecs / 1000))


# DuckDB mirror of _knn_query_modulus (scalar subquery over the same
# table — integer-exact in both engines for any realistic count)
_KNN_MOD_SQL = (
    "(SELECT 20 * greatest(1, CAST(ceil(COUNT(*) / 1000.0) AS BIGINT)) "
    "FROM embeddings)"
)


def sim_knn_join(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    m = _knn_query_modulus(emb.count())
    queries = emb.filter(F.col("vec_id") % m == 0)
    return SIM.knn_join_exact(queries, emb, "vec_id", "embedding", k=5)


KNN_JOIN_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % {_KNN_MOD_SQL} = 0),
scored AS (
  SELECT q.query_id, e.vec_id, {SIM.sql_cosine('e.embedding', 'q.qv')} AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored)
SELECT query_id, vec_id, cos, rn FROM ranked WHERE rn <= 5
"""


def sim_knn_join_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    return SIM.knn_join_lsh(queries, emb, "vec_id", "embedding", k=5)


KNN_JOIN_LSH_SQL = f"""
WITH b AS (SELECT vec_id, embedding, {SIM.sql_hyperplane_bucket('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
      FROM b WHERE vec_id % 20 = 0),
scored AS (
  SELECT q.query_id, b.vec_id, {SIM.sql_cosine('b.embedding', 'q.qv')} AS cos
  FROM b, q WHERE b.bucket = q.qbucket AND b.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored)
SELECT query_id, vec_id, cos, rn FROM ranked WHERE rn <= 5
"""


def corpus_pack(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    with_toks = d.select("doc_id", TX.ws_token_count("text").alias("n_tokens"))
    return CP.pack_sequences(with_toks, "doc_id", "n_tokens", budget=1024)


PACK_SQL = f"""
WITH t AS (SELECT doc_id, {_WS_COUNT_SQL} AS n_tokens,
                  {CP.sql_det_hash('doc_id')} AS ord_key FROM documents),
c AS (SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY ord_key, doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
      FROM t)
SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(FLOOR(start_offset / 1024) AS BIGINT) AS seq_id
FROM c
"""


def corpus_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic sampling: keep probability
    proportional to the quality score (P(keep) = quality), gated by
    the same modular hash as x21 — reproducible under retries,
    speculative re-execution, and repartitioning, unlike rand(). The
    gate compares an integer hash against quality·1000; x09 proves the
    quality doubles are bit-identical cross-engine, so the kept set is
    exactly reproducible."""
    d = _t(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    n_toks = F.size(toks)
    en = F.array(*[F.lit(w) for w in TX.STOPWORDS["en"]])
    sw_ratio = F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / F.greatest(
        n_toks, F.lit(1)
    )
    q = (
        F.least(F.lit(1.0), n_toks / F.lit(50.0))
        * (F.lit(1.0) - TX.punct_ratio("text"))
        * (F.lit(0.5) + F.lit(0.5) * sw_ratio)
    )
    gate = CP.det_hash(F.col("doc_id")) % 1000
    return d.select("doc_id", q.alias("quality")).where(gate < q * 1000)


WEIGHTED_SAMPLE_SQL = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents),
q AS (SELECT doc_id,
  least(1.0, len(toks) / 50.0)
  * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1))
  * (0.5 + 0.5 * ({_EN_OCC} / greatest(len(toks), 1))) AS quality
      FROM t)
SELECT doc_id, quality FROM q
WHERE ({CP.sql_det_hash('doc_id')}) % 1000 < quality * 1000
"""


def corpus_weighted_reservoir(spark, sf_dir):
    """x51: EXACT-size weighted sample (Efraimidis-Spirakis A-ES) of
    50 docs with P(selected) proportional to length (n_chars) — the
    fixed-budget companion of x31's Bernoulli sampler. Deterministic
    u from the shared hash gate; TakeOrderedAndProject top-k, no
    global sort (operators/corpus.py:weighted_reservoir)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return CP.weighted_reservoir(d, "doc_id", "n_chars", k=50)


WEIGHTED_RESERVOIR_SQL = f"""
SELECT doc_id, lang, n_chars,
       ROUND(pow((({CP.sql_det_hash('doc_id')}) + 1) / {CP.HASH_MOD},
                 1.0 / n_chars), 9) AS res_key
FROM documents
WHERE n_chars > 0
ORDER BY res_key DESC, doc_id ASC
LIMIT 50
"""


def vocab_topk(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        CP.vocab_counts(d, "doc_id", "text")
        .orderBy(F.col("term_freq").desc(), F.col("token").asc())
        .limit(100)
    )


VOCAB_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents)
SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM toks GROUP BY token
ORDER BY term_freq DESC, token ASC LIMIT 100
"""


def tfidf_terms(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return CP.tfidf_top_terms(d, "doc_id", "text", k=3)


TFIDF_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(*) AS df_cnt FROM tf GROUP BY token),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, tf.tf * (n.n_docs / dfreq.df_cnt) AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf * (n.n_docs / dfreq.df_cnt) DESC, tf.token ASC) AS rn
  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
SELECT doc_id, token, tf, score FROM scored WHERE rn <= 3
"""


def bigrams_(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return CP.bigram_counts(d, "doc_id", "text", min_count=2)


BIGRAMS_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT unnest([array_to_string(list_slice(toks, i, i+1), ' ')
                     for i in range(1, len(toks))]) AS bigram FROM t)
SELECT bigram, COUNT(*) AS n FROM g GROUP BY bigram HAVING COUNT(*) >= 2
"""


def text_repetition(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return CP.repetition_stats(d, "doc_id", "text")


REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
b AS (SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
        CASE WHEN len(toks) >= 2
             THEN [array_to_string(list_slice(toks, i, i+1), ' ') for i in range(1, len(toks))]
             ELSE [] END AS bgs
      FROM t),
c AS (SELECT doc_id, g, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(bgs) AS g FROM b) GROUP BY doc_id, g),
m AS (SELECT doc_id, MAX(cnt) AS max_bg, SUM(cnt) AS n_bg, COUNT(*) AS n_distinct_bg
      FROM c GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
  (b.n_tokens - b.n_distinct) / greatest(b.n_tokens, 1) AS dup_token_frac,
  (2 * coalesce(m.max_bg, 0)) / greatest(b.n_tokens, 1) AS top_bigram_frac,
  (coalesce(m.n_bg, 0) - coalesce(m.n_distinct_bg, 0))
    / greatest(coalesce(m.n_bg, 0), 1) AS dup_bigram_frac
FROM b LEFT JOIN m USING (doc_id)
"""


def boilerplate_ngrams(spark, sf_dir):
    """Inter-document boilerplate detection (Dolma-style paragraph
    dedup, 4-gram granularity): a 4-gram occurring in >= 2 distinct
    documents is boilerplate; score each doc by the fraction of its
    gram instances that are boilerplate.

    Shape & scale: one explode (generator in the scan stage, no
    shuffle), a (doc, gram) pre-aggregate, a document-frequency COUNT
    window on the gram partition, and a final per-doc aggregate —
    three exchanges, the explode subtree computed exactly once, no
    join. At 100 TB a viral gram makes a fat window partition (the
    window buffers per-partition); if that bites, swap the window for
    a gram-keyed aggregate + broadcast join of the `ndocs >= 2`
    survivors — one more exchange, bounded memory.
    """
    d = _t(spark, sf_dir, "documents")
    # Optimizer fences (see clean_gate): without them CollapseProject
    # re-inlines the tokenize regex into every slice of the gram
    # builder — measured 14x slower at sf0.1 (3.2s vs 0.46s explode).
    toks_f = F.when(F.monotonically_increasing_id() >= -1, TX.tokens("text"))
    grams_f = F.when(F.monotonically_increasing_id() >= -1, TX.word_ngrams(F.col("toks"), 4))
    g = (
        d.select("doc_id", toks_f.alias("toks"))
        .select("doc_id", grams_f.alias("grams"))
        .select("doc_id", F.explode("grams").alias("gram"))
    )
    # Pre-aggregate to one row per (doc, gram), then get each gram's
    # document frequency as a COUNT window over the gram partition —
    # no countDistinct expansion, no join-back, and the (doc, gram)
    # subtree is computed exactly once: three exchanges total.
    from pyspark.sql.window import Window

    gd = g.groupBy("doc_id", "gram").agg(F.count("*").alias("k"))
    marked = gd.withColumn("ndocs", F.count("*").over(Window.partitionBy("gram")))
    per = marked.groupBy("doc_id").agg(
        F.sum("k").alias("n_grams"),
        F.sum(F.when(F.col("ndocs") >= 2, F.col("k")).otherwise(0)).cast("long").alias("n_bp"),
    )
    return per.select(
        "doc_id", "n_grams", "n_bp",
        (F.col("n_bp") / F.col("n_grams")).alias("bp_frac"),
    )


BOILERPLATE_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, unnest([array_to_string(list_slice(toks, i, i+3), ' ')
                             for i in range(1, len(toks)-2)]) AS gram FROM t),
f AS (SELECT gram, COUNT(DISTINCT doc_id) AS ndocs FROM g GROUP BY gram),
p AS (SELECT g.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bp
      FROM g JOIN f USING (gram) GROUP BY g.doc_id)
SELECT doc_id, n_grams, n_bp, n_bp / n_grams AS bp_frac FROM p
"""


def domain_mix(spark, sf_dir):
    """Domain-mix rebalancing — cap every source at the smallest
    source's token budget via deterministic subsampling
    (P(keep) = min_tokens / source_tokens, gated by the shared
    modular hash, so the kept set is reproducible across retries and
    cluster sizes). The per-source stats frame is tiny (one row per
    domain) — broadcast back onto the corpus; the only full-data
    shuffles are the two per-source aggregates, both map-side
    combinable."""
    d = _t(spark, sf_dir, "documents")
    doc = d.select("doc_id", "source", F.size(TX.tokens("text")).alias("n_toks"))
    per_src = doc.groupBy("source").agg(
        F.sum("n_toks").cast("long").alias("src_tokens")
    )
    m = per_src.agg(F.min("src_tokens").alias("min_tokens"))
    rates = per_src.crossJoin(F.broadcast(m)).select(
        "source", "src_tokens",
        (F.col("min_tokens").cast("double") / F.col("src_tokens")).alias("keep_rate"),
    )
    kept = doc.join(F.broadcast(rates), "source").where(
        CP.det_hash(F.col("doc_id")) % 1000 < F.col("keep_rate") * 1000
    )
    return kept.groupBy("source", "src_tokens", "keep_rate").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_toks").cast("long").alias("tokens_kept"),
    )


DOMAIN_MIX_SQL = f"""
WITH t AS (SELECT doc_id, source, len({TOKS_SQL}) AS n_toks FROM documents),
s AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS src_tokens FROM t GROUP BY source),
m AS (SELECT MIN(src_tokens) AS min_tokens FROM s),
r AS (SELECT source, src_tokens,
             CAST(min_tokens AS DOUBLE) / src_tokens AS keep_rate FROM s, m),
k AS (SELECT t.doc_id, t.source, t.n_toks, r.src_tokens, r.keep_rate
      FROM t JOIN r USING (source)
      WHERE ({CP.sql_det_hash('t.doc_id')}) % 1000 < r.keep_rate * 1000)
SELECT source, src_tokens, keep_rate, COUNT(*) AS n_docs_kept,
       CAST(SUM(n_toks) AS BIGINT) AS tokens_kept
FROM k GROUP BY source, src_tokens, keep_rate
"""


def embedding_quantize(spark, sf_dir):
    """Int8 symmetric scalar quantization of the embedding column
    (the standard 4x ANN-index compression): per-vector scale =
    max |x|, q_i = floor(x_i/scale*127 + 0.5), reporting the max
    reconstruction error. Pure per-row array math — a single scan
    stage, no shuffle, no Python; floor(+0.5) instead of round()
    because round's tie-breaking differs between engines."""
    e = _t(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda x: x.cast("double"))
    t = e.select("vec_id", xd.alias("xd"))
    t = t.select(
        "vec_id", "xd",
        F.greatest(
            F.array_max(F.transform("xd", lambda x: F.abs(x))), F.lit(1e-12)
        ).alias("scale"),
    )
    q = F.transform("xd", lambda x: F.floor(x / F.col("scale") * 127 + F.lit(0.5)))
    err = F.array_max(
        F.zip_with("xd", q.alias("q"), lambda x, qq: F.abs(x - qq * F.col("scale") / 127))
    )
    return t.select(
        "vec_id", "scale",
        F.size("xd").cast("long").alias("n_dims"),
        err.alias("max_abs_err"),
    )


QUANTIZE_SQL = """
WITH b AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
           FROM embeddings),
s AS (SELECT vec_id, xd,
             greatest(list_max(list_transform(xd, x -> abs(x))), 1e-12) AS scale
      FROM b)
SELECT vec_id, scale, CAST(len(xd) AS BIGINT) AS n_dims,
       list_max(list_transform(xd,
         x -> abs(x - floor(x / scale * 127 + 0.5) * scale / 127))) AS max_abs_err
FROM s
"""


def embedding_centroid_outliers(spark, sf_dir):
    """Per-label embedding centroids + the 3 farthest outliers per
    label (lowest cosine to centroid) — the corpus-diversity /
    mislabel-detection pass of an embedding pipeline.

    Shape & scale: centroid = element-wise mean via posexplode →
    (label, dim) exact-decimal sums (map-side partial agg; shuffle
    carries labels × dims rows, not vectors) → collect the dim-sorted
    array per label. The centroid frame is tiny (one row per label) —
    broadcast back onto the corpus; outliers come from a per-label
    row_number window. Cosines reuse the bit-stable sequential dot
    (operators/similarity.dot_d)."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "embeddings")
    d = e.select("label", F.posexplode("embedding").alias("dim0", "x"))
    # Fixed-point via floor, not decimal casts: decimal rounding
    # tie-breaks differ across engines (HALF_UP vs HALF_EVEN —
    # measured on this corpus); floor(x·1e10) has no ties, and the
    # int64 sums are exact (headroom to ~9·10^8 vectors per group).
    xi = F.floor(F.col("x").cast("double") * F.lit(1e10))
    s = d.groupBy("label", (F.col("dim0") + 1).alias("dim")).agg(
        (F.sum(xi).cast("double") / F.count("*") / F.lit(1e10)).alias("cx")
    )
    c = s.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cx"))), lambda t: t["cx"]
        ).alias("centroid")
    )
    j = e.join(F.broadcast(c), "label").select(
        "label", "vec_id",
        SIM.cosine(F.col("embedding"), F.col("centroid")).alias("cos"),
    )
    w = Window.partitionBy("label").orderBy(F.col("cos").asc(), F.col("vec_id").asc())
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", "vec_id", "cos")
    )


CENTROID_SQL = f"""
WITH d AS (SELECT label, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS dim FROM embeddings),
s AS (SELECT label, dim,
             CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 1e10 AS cx
      FROM d GROUP BY label, dim),
c AS (SELECT label, list(cx ORDER BY dim) AS centroid FROM s GROUP BY label),
j AS (SELECT e.label, e.vec_id,
             {SIM.sql_cosine('e.embedding', 'c.centroid')} AS cos
      FROM embeddings e JOIN c USING (label)),
r AS (SELECT *, row_number() OVER (PARTITION BY label
        ORDER BY cos ASC, vec_id ASC) AS rn FROM j)
SELECT label, vec_id, cos FROM r WHERE rn <= 3
"""


PASSAGE = 32  # tokens per passage for sub-document dedup


def passage_dedup(spark, sf_dir):
    """Sub-document (passage-level) exact dedup — the CCNet/Dolma
    paragraph-dedup step adapted to the corpus' flat text: split each
    document into fixed 32-token passages, keep only the globally
    FIRST occurrence of each distinct passage (order: doc_id, then
    passage index), and reassemble the surviving text per document.

    Shape & scale: tokenize ONCE per doc, explode precomputed passage
    indices (scan-side flatMap, no shuffle); the first-occurrence
    window partitions by the passage's md5 — the exchange ships a
    16-byte key + ids, never the passage text twice; reassembly is one
    groupBy(doc_id) with an ordered collect bounded by the doc's own
    passage count. Two shuffles total, both narrow."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    toked = d.select("doc_id", TX.tokens("text").alias("toks"))
    counted = toked.select(
        "doc_id", "toks",
        F.greatest(F.ceil(F.size("toks") / F.lit(float(PASSAGE))).cast("bigint"), F.lit(1).cast("bigint")).alias("np"),
    )
    p = counted.select(
        "doc_id", "np",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("np") - 1)).alias("pidx"),
        F.col("toks"),
    ).select(
        "doc_id", "np", "pidx",
        F.concat_ws(" ", F.slice("toks", F.col("pidx").cast("int") * PASSAGE + 1, PASSAGE)).alias("ptext"),
    )
    w = Window.partitionBy(F.md5("ptext")).orderBy("doc_id", "pidx")
    kept = (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pidx", "ptext"))),
                    lambda s: s.getField("ptext"),
                ),
            ).alias("clean_text"),
        )
    )
    base = counted.select("doc_id", F.col("np").alias("n_passages"))
    return base.join(kept, "doc_id", "left").select(
        "doc_id", "n_passages",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


PASSAGE_DEDUP_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             GREATEST(CAST(ceil(len(toks) / {PASSAGE}.0) AS BIGINT), 1) AS np
      FROM t),
p AS (SELECT doc_id, np, i AS pidx,
             array_to_string(list_slice(toks, i * {PASSAGE} + 1, i * {PASSAGE} + {PASSAGE}), ' ') AS ptext
      FROM n, UNNEST(generate_series(0, np - 1)) AS u(i)),
r AS (SELECT *, row_number() OVER (PARTITION BY md5(ptext)
                                   ORDER BY doc_id, pidx) AS rn FROM p),
k AS (SELECT doc_id, pidx, ptext FROM r WHERE rn = 1),
agg AS (SELECT doc_id, COUNT(*) AS n_kept,
               array_to_string(list(ptext ORDER BY pidx), ' ') AS clean_text
        FROM k GROUP BY doc_id)
SELECT n.doc_id, n.np AS n_passages,
       COALESCE(agg.n_kept, 0) AS n_kept,
       COALESCE(agg.clean_text, '') AS clean_text
FROM n LEFT JOIN agg USING (doc_id)
"""


def snapshot_delta_dedup(spark, sf_dir):
    """Incremental crawl merge: treat even doc_ids as the existing
    corpus snapshot and odd doc_ids as the incoming crawl; a new
    document survives iff its content hash is unseen WITHIN the crawl
    (first occurrence by doc_id wins) AND absent from the snapshot
    (left-anti join on the hash). This is the nightly dedup-against-
    history step of a continuously-crawled corpus.

    Shape & scale: both the within-crawl first-occurrence window and
    the anti join hash-partition on the SAME 16-byte md5 key, so the
    crawl side shuffles once and the snapshot ships only its distinct
    hashes. No text moves after the initial hash projection."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", F.md5("text").alias("h")
    )
    old_hashes = d.where(F.col("doc_id") % 2 == 0).select("h").distinct()
    crawl = d.where(F.col("doc_id") % 2 == 1)
    w = Window.partitionBy("h").orderBy("doc_id")
    first = crawl.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return first.join(old_hashes, "h", "left_anti").select(
        "doc_id", "source", "lang", F.col("h").alias("content_hash")
    )


SNAPSHOT_DEDUP_SQL = """
WITH d AS (SELECT doc_id, source, lang, md5(text) AS h FROM documents),
old AS (SELECT DISTINCT h FROM d WHERE doc_id % 2 = 0),
crawl AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
          FROM d WHERE doc_id % 2 = 1)
SELECT doc_id, source, lang, h AS content_hash
FROM crawl WHERE rn = 1 AND h NOT IN (SELECT h FROM old)
"""


def lang_temperature_resample(spark, sf_dir):
    """Multilingual temperature resampling (the XLM/mT5 alpha=0.5
    recipe): languages are re-weighted toward the uniform by sampling
    with probability ∝ share^0.5, realized as per-language keep rates
    keep_rate(l) = sqrt(min_lang_tokens / lang_tokens) — the smallest
    language keeps everything, bigger ones are downsampled by the
    square-root of their size ratio. The gate is the shared
    deterministic modular hash, so the kept set is identical across
    retries and cluster sizes. sqrt and one divide are both IEEE
    correctly-rounded, so rates are bit-stable across engines.

    Shape: one token-count aggregate (map-side combinable), a tiny
    per-language rate frame broadcast back, one filtered rollup."""
    d = _t(spark, sf_dir, "documents")
    doc = d.select("doc_id", "lang", F.size(TX.tokens("text")).alias("n_toks"))
    per_lang = doc.groupBy("lang").agg(F.sum("n_toks").cast("long").alias("lang_tokens"))
    m = per_lang.agg(F.min("lang_tokens").alias("min_tokens"))
    rates = per_lang.crossJoin(F.broadcast(m)).select(
        "lang", "lang_tokens",
        F.sqrt(F.col("min_tokens").cast("double") / F.col("lang_tokens")).alias("keep_rate"),
    )
    kept = doc.join(F.broadcast(rates), "lang").where(
        CP.det_hash(F.col("doc_id")) % 100000 < F.col("keep_rate") * 100000
    )
    return kept.groupBy("lang", "lang_tokens", "keep_rate").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_toks").cast("long").alias("tokens_kept"),
    )


TEMPERATURE_SQL = f"""
WITH t AS (SELECT doc_id, lang, len({TOKS_SQL}) AS n_toks FROM documents),
s AS (SELECT lang, CAST(SUM(n_toks) AS BIGINT) AS lang_tokens FROM t GROUP BY lang),
m AS (SELECT MIN(lang_tokens) AS min_tokens FROM s),
r AS (SELECT lang, lang_tokens,
             sqrt(CAST(min_tokens AS DOUBLE) / lang_tokens) AS keep_rate FROM s, m),
k AS (SELECT t.doc_id, t.lang, t.n_toks, r.lang_tokens, r.keep_rate
      FROM t JOIN r USING (lang)
      WHERE ({CP.sql_det_hash('t.doc_id')}) % 100000 < r.keep_rate * 100000)
SELECT lang, lang_tokens, keep_rate, COUNT(*) AS n_docs_kept,
       CAST(SUM(n_toks) AS BIGINT) AS tokens_kept
FROM k GROUP BY lang, lang_tokens, keep_rate
"""


BM25_TERMS = ["hash", "join", "sort"]


def bm25_search(spark, sf_dir):
    from database_query_processor_spark.operators import retrieval as RT

    return RT.bm25_topk(_t(spark, sf_dir, "documents"), "doc_id", "text", BM25_TERMS, k=10)


def _bm25_oracle():
    from database_query_processor_spark.operators import retrieval as RT

    return RT.sql_bm25_topk(BM25_TERMS, k=10, toks_sql=TOKS_SQL)


def unigram_lm_quality(spark, sf_dir):
    from database_query_processor_spark.operators import retrieval as RT

    return RT.unigram_logprob_scores(_t(spark, sf_dir, "documents"), "doc_id", "text")


def bigram_lm_quality(spark, sf_dir):
    """x50: interpolated bigram-LM NLL quality score (one rung below
    CCNet's 5-gram KenLM; operators/retrieval.py:bigram_logprob_scores)."""
    from database_query_processor_spark.operators import retrieval as RT

    return RT.bigram_logprob_scores(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _bigram_oracle():
    from database_query_processor_spark.operators import retrieval as RT

    return RT.sql_bigram_logprob(toks_sql=TOKS_SQL)


def _unigram_oracle():
    from database_query_processor_spark.operators import retrieval as RT

    return RT.sql_unigram_logprob(toks_sql=TOKS_SQL)


def hybrid_search(spark, sf_dir):
    """x46: hybrid retrieval — BM25 lexical ranker + dense cosine
    ranker fused with reciprocal-rank fusion (rrf_k=60) over
    pool-deep candidate lists; embeddings join the doc domain by
    vec_id == doc_id."""
    from database_query_processor_spark.operators import retrieval as RT

    return RT.hybrid_rrf_topk(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        BM25_TERMS,
        query_id=0,
        k=10,
    )


def rerank_cross_encoder(spark, sf_dir):
    """x64: retrieve-then-rerank — the hybrid RRF pool (x46's fusion,
    widened to 20 candidates) reranked by a query-document interaction
    scorer (term-saturation + early-position features standing in for
    the model forward pass; retrieval.py:cross_encoder_rerank). The
    rerank is broadcast-bounded by the constant pool size — corpus
    cost stays exactly the first-stage rankers'."""
    from database_query_processor_spark.operators import retrieval as RT

    pool = RT.hybrid_rrf_topk(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        BM25_TERMS,
        query_id=0,
        k=20,
    )
    return RT.cross_encoder_rerank(
        _t(spark, sf_dir, "documents"), pool, BM25_TERMS, k=10
    )


def _rerank_oracle():
    from database_query_processor_spark.operators import retrieval as RT

    pool_sql = RT.sql_hybrid_rrf(
        BM25_TERMS, 0, SIM.sql_cosine("embedding", "qv"), k=20, toks_sql=TOKS_SQL
    )
    return RT.sql_cross_encoder_rerank(pool_sql, BM25_TERMS, k=10, toks_sql=TOKS_SQL)


def ann_sq8(spark, sf_dir):
    """x65: scalar-quantized ANN — int8-range quantized integer-dot
    prefilter (corpus-global scale, floor quantization) cuts a
    50-candidate pool, exact float cosine reranks to top-10
    (similarity.py:ann_sq8_rerank). The SQ path every production
    vector store ships: the quantized scan is ~4x lighter, the rerank
    restores exact ordering within the pool."""
    return SIM.ann_sq8_rerank(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0, k=10
    )


def ann_pq(spark, sf_dir):
    """x66: product-quantization ANN with asymmetric distance (ADC) —
    64-dim vectors compress to 8 code bytes against per-subspace
    ids-codebooks; approximate distance is 8 table lookups summed
    (zero float math per corpus vector at scan time), exact cosine
    reranks the 50-pool to top-10 (similarity.py:ann_pq_rerank). The
    third production ANN memory-layout beside SQ8 (x65) and IVF
    (x13)."""
    return SIM.ann_pq_rerank(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0, k=10
    )


def _hybrid_oracle():
    from database_query_processor_spark.operators import retrieval as RT

    return RT.sql_hybrid_rrf(
        BM25_TERMS, 0, SIM.sql_cosine("embedding", "qv"), k=10, toks_sql=TOKS_SQL
    )


def corpus_budget_select(spark, sf_dir):
    """x47: greedy quality-first corpus selection under a global token
    budget — rank by (quality DESC, doc_id) and keep the prefix whose
    cumulative whitespace-token count stays under budget (boundary doc
    kept). Distributed two-pass prefix sum, range-partitioned on the
    ranking key."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        TX.ws_token_count("text").alias("n_tokens"),
        TX.quality_score("text").alias("q"),
    )
    out = CP.budget_select(scored, "doc_id", "n_tokens", F.col("q"), budget=5000)
    return out.select(
        "doc_id", "n_tokens", F.round("score", 9).alias("score"), "start_offset"
    )


BUDGET_SELECT_SQL = f"""
WITH t AS (SELECT doc_id, text, {_WS_COUNT_SQL} AS n_tokens, {TOKS_SQL} AS toks
           FROM documents),
s AS (SELECT doc_id, n_tokens,
             least(1.0, len(toks) / 50.0)
               * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1))
               * (0.5 + 0.5 * ({_EN_OCC} / greatest(len(toks), 1))) AS score
      FROM t),
c AS (SELECT doc_id, n_tokens, score,
             SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
      FROM s)
SELECT doc_id, n_tokens, ROUND(score, 9) AS score,
       CAST(start_offset AS BIGINT) AS start_offset
FROM c WHERE start_offset < 5000
"""


def dedup_editdistance(spark, sf_dir):
    """x48: character-level near-dup pairs — Levenshtein ≤ 8 among
    documents sharing a 24-char normalized prefix (blocked equi-join,
    never all-pairs; see operators/dedup.py:editdistance_pairs)."""
    return DD.editdistance_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text")


EDITDIST_SQL = f"""
WITH b0 AS (SELECT doc_id, text, substr(lower(text), 1, {DD.EDIT_PREFIX_LEN}) AS blk
            FROM documents),
b AS (SELECT *, count(*) OVER (PARTITION BY blk) AS bn FROM b0)
SELECT a.doc_id AS id_a, c.doc_id AS id_b, levenshtein(a.text, c.text) AS dist
FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
WHERE a.bn <= {DD.EDIT_BLOCK_CAP} AND levenshtein(a.text, c.text) <= {DD.EDIT_MAX_DIST}
"""


def dedup_semantic(spark, sf_dir):
    """x49: SemDeDup — Voronoi coarse clusters (deterministic "ids"
    codebook for oracle parity; kmeans is the production knob), drop
    vectors with a lower-id in-cluster neighbor at cosine ≥ 0.85.
    Per-document keep/drop verdict, the form a curation pipeline
    consumes (operators/similarity.py:semantic_dedup)."""
    return SIM.semantic_dedup(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")


SEMDEDUP_SQL = f"""
WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
               ORDER BY vec_id LIMIT {SIM.SEM_CELLS}),
assign AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {SIM.sql_cosine('e.embedding', 'c.cv')} DESC, c.cent_id) AS rn
    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
dropped AS (
  SELECT DISTINCT a.vec_id FROM assign a JOIN assign b
    ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE {SIM.sql_cosine('a.embedding', 'b.embedding')} >= {SIM.SEM_TAU!r})
SELECT a.vec_id, a.cell, (a.vec_id NOT IN (SELECT vec_id FROM dropped)) AS kept
FROM assign a
"""


def substring_dedup(spark, sf_dir):
    """x55: exact repeated-substring spans (suffix-array-style dedup,
    Lee et al. 2022) — maximal runs of corpus-duplicated 8-gram start
    positions per doc (operators/dedup.py:substring_dup_spans)."""
    return DD.substring_dup_spans(_t(spark, sf_dir, "documents"), "doc_id", "text", k=8)


SUBSTRING_DEDUP_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
gl AS (SELECT doc_id,
              [array_to_string(list_slice(toks, i, i + 7), ' ')
               for i in range(1, len(toks) - 6)] AS grams
       FROM t),
g AS (SELECT doc_id, unnest(grams) AS gram,
             generate_subscripts(grams, 1) AS pos
      FROM gl),
c AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
m AS (SELECT doc_id, pos FROM g JOIN c USING (gram)),
r AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
                  THEN 0 ELSE 1 END AS brk
      FROM m),
s AS (SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run
      FROM r)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS span_tokens
FROM s GROUP BY doc_id, run
"""


def corpus_dsir_select(spark, sf_dir):
    """x56: DSIR importance-resampling data selection — top-50 raw
    docs by hashed-unigram log-likelihood ratio against the src0
    target slice (operators/corpus.py:dsir_select)."""
    d = _t(spark, sf_dir, "documents")
    return CP.dsir_select(d, "doc_id", "text", F.col("source") == "src0", k=50)


DSIR_SQL = f"""
WITH toks AS (SELECT doc_id, source = 'src0' AS is_t, unnest({TOKS_SQL}) AS tok,
                     generate_subscripts({TOKS_SQL}, 1) AS pos
              FROM documents),
f AS (SELECT doc_id, is_t, pos,
             (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS bucket
      FROM toks),
s AS (SELECT bucket,
             CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS cr
      FROM f GROUP BY bucket),
tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr FROM s),
bl AS (SELECT bucket,
              ln((ct + 1) / CAST(nt + 256 AS DOUBLE))
              - ln((cr + 1) / CAST(nr + 256 AS DOUBLE)) AS lr
       FROM s, tot),
p AS (SELECT doc_id, pos, lr FROM f JOIN bl USING (bucket) WHERE NOT is_t)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
       round(list_sum(list(lr ORDER BY pos)), 9) AS dsir_score
FROM p GROUP BY doc_id
ORDER BY dsir_score DESC, doc_id ASC LIMIT 50
"""


def nb_quality_classifier(spark, sf_dir):
    """x57: fastText-style quality classifier as multinomial Naive
    Bayes — 80/20 hash split, lang='en' as the positive class,
    smoothed log-odds scoring of the held-out docs
    (operators/retrieval.py:nb_classifier_scores)."""
    from database_query_processor_spark.operators import retrieval as RT

    d = _t(spark, sf_dir, "documents")
    return RT.nb_classifier_scores(d, "doc_id", "text", F.col("lang") == "en")


NB_CLASSIFIER_SQL = f"""
WITH base AS (SELECT doc_id, {CP.sql_det_hash('doc_id')} % 100 < 80 AS is_train,
                     lang = 'en' AS y, unnest({TOKS_SQL}) AS tok,
                     generate_subscripts({TOKS_SQL}, 1) AS pos
              FROM documents),
counts AS (SELECT tok,
                  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                  CAST(SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS cn
           FROM base WHERE is_train GROUP BY tok),
tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cn) AS BIGINT) AS nn,
               COUNT(*) AS v FROM counts),
priors AS (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS dp,
                  CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS dn
           FROM documents WHERE {CP.sql_det_hash('doc_id')} % 100 < 80),
pt AS (SELECT b.doc_id, b.y, b.pos,
              ln((coalesce(c.cp, 0) + 1) / CAST(t.np + t.v AS DOUBLE))
              - ln((coalesce(c.cn, 0) + 1) / CAST(t.nn + t.v AS DOUBLE)) AS lo
       FROM base b LEFT JOIN counts c USING (tok) CROSS JOIN tot t
       WHERE NOT b.is_train),
d AS (SELECT doc_id, y, CAST(COUNT(*) AS BIGINT) AS n_toks,
             round(ln(p.dp / CAST(p.dn AS DOUBLE))
                   + list_sum(list(lo ORDER BY pos)), 9) AS score
      FROM pt CROSS JOIN priors p GROUP BY doc_id, y, p.dp, p.dn)
SELECT doc_id, n_toks, score, score > 0 AS pred, y AS actual FROM d
"""


def quality_quantile_norm(spark, sf_dir):
    """x59: per-source quantile normalization of quality scores — the
    calibration step before mixing scores across domains (a raw 0.6
    from a clean wiki crawl and from a noisy CC dump mean different
    things; their within-source percentiles are comparable).
    percent_rank = (rank-1)/(n-1) is one exact-int divide, and ties
    in q get equal calibrated scores in both engines. One exchange
    (the source partition); scan-side score math."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    q = d.select("doc_id", "source", TX.quality_score("text").alias("q"))
    w = Window.partitionBy("source").orderBy("q")
    return q.select(
        "doc_id",
        "source",
        F.round("q", 9).alias("q_raw"),
        F.round(F.percent_rank().over(w), 9).alias("q_cal"),
    )


QUANTILE_NORM_SQL = f"""
WITH t AS (SELECT doc_id, source, text, {TOKS_SQL} AS toks FROM documents),
s AS (SELECT doc_id, source, {_QUALITY_EXPR} AS q FROM t)
SELECT doc_id, source, ROUND(q, 9) AS q_raw,
       ROUND(percent_rank() OVER (PARTITION BY source ORDER BY q), 9) AS q_cal
FROM s
"""


def dedup_containment(spark, sf_dir):
    """x60: near-containment pairs — |∩|/min(|A|,|B|) ≥ 0.8 over the
    df-capped 3-gram universe (operators/dedup.py:
    ngram_containment_pairs). Catches quote/subset duplication that
    the x04 Jaccard gate structurally misses."""
    return DD.ngram_containment_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text")


CONTAINMENT_SQL = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {GRAMS_SQL} AS grams FROM t),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
rare AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) <= {DD.NGRAM_DF_CAP}),
idx AS (SELECT doc_id, gram FROM ex JOIN rare USING (gram)),
sizes AS (SELECT doc_id, count(*) AS n FROM idx GROUP BY doc_id),
shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM idx a JOIN idx b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, shared / least(sa.n, sb.n) AS containment,
       shared / (sa.n + sb.n - shared) AS jaccard
FROM shared JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
WHERE shared / least(sa.n, sb.n) >= 0.8
"""


def bm25_hard_negatives_query(spark, sf_dir):
    """x62: hard-negative mining — for each benchmark doc (doc_id %
    97 == 0, the x19/x52 query slice), the top-3 of the top-10
    BM25-scored candidate pool that are not near-dups of the
    benchmark (operators/retrieval.py:bm25_hard_negatives;
    retrieve-m-then-filter, quantized integer score sums)."""
    from database_query_processor_spark.operators import retrieval as RT

    d = _t(spark, sf_dir, "documents")
    return RT.bm25_hard_negatives(d, "doc_id", "text", F.col("doc_id") % 97 == 0, k=3)


def _hardneg_oracle():
    # toksall/tf are AS MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and toksall (a corpus-wide unnest, 27M rows at sf10)
    # is referenced three times — inlined, the optimizer estimates it
    # at |documents| rows, picks a catastrophic join order, and the
    # sampled sf10 oracle exceeded 90 GB RAM + 78 GB of spill before
    # dying; materialized it finishes in ~73 s at 500k docs (and the
    # sf1 full form stops OOMing at 48 GB). Result is identical —
    # materialization is an evaluation hint, not semantics. NOT a
    # blanket rule: the same hint on JACCARD_CAPPED_SQL's t/g/ex/idx
    # measured 2.3x SLOWER at sf1 (3.1 s -> 7.2 s) because inlining
    # lets DuckDB push the rare-gram semi-join into both unnest arms;
    # materialize only where inlining demonstrably explodes.
    from database_query_processor_spark.operators import retrieval as RT

    return f"""
WITH toksall AS MATERIALIZED (SELECT doc_id, doc_id % 97 = 0 AS is_q,
                 unnest({TOKS_SQL}) AS tok
                 FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toksall WHERE NOT is_q GROUP BY doc_id),
corpus AS (SELECT count(*) AS n_docs,
                  cast(sum(dl) AS double) / count(*) AS avgdl FROM dl),
qterms AS (SELECT DISTINCT doc_id AS query_id, tok FROM toksall WHERE is_q),
tf AS MATERIALIZED (SELECT doc_id, tok, count(*) AS tf FROM toksall
       WHERE NOT is_q AND tok IN (SELECT DISTINCT tok FROM qterms)
       GROUP BY doc_id, tok),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
ts AS (SELECT q.query_id, tf.doc_id,
              CAST(floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
              * (tf * ({RT.BM25_K1} + 1.0))
              / (tf + {RT.BM25_K1} * (1.0 - {RT.BM25_B}
                 + {RT.BM25_B} * dl / avgdl)) * 1e9 + 0.5) AS BIGINT) AS su
       FROM qterms q JOIN tf USING (tok) JOIN dfreq USING (tok)
            JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus),
scored AS (SELECT query_id, doc_id,
                  CAST(SUM(su) AS BIGINT) / 1e9 AS score
           FROM ts GROUP BY query_id, doc_id),
pool AS (SELECT query_id, doc_id, score
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY score DESC, doc_id ASC) AS pm
               FROM scored)
         WHERE pm <= 10),
contam AS (SELECT doc_id FROM ({FUZZY_DECONTAM_SQL}) WHERE contaminated)
SELECT query_id, doc_id AS neg_id, score, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id ASC) AS rn
      FROM pool WHERE doc_id NOT IN (SELECT doc_id FROM contam))
WHERE rn <= 3
"""


def bpe_merges(spark, sf_dir):
    """x58: BPE tokenizer training — the first 3 learned merges over
    the corpus word types (operators/tokenizer.py:bpe_learn_merges);
    ties break lexicographically in both engines."""
    from database_query_processor_spark.operators import tokenizer as TK

    return TK.bpe_learn_merges(_t(spark, sf_dir, "documents"), "text", rounds=3)


def _bpe_oracle():
    from database_query_processor_spark.operators import tokenizer as TK

    return TK.sql_bpe_merges(rounds=3, toks_sql=TOKS_SQL)


def bpe_tokenize(spark, sf_dir):
    """x61: BPE apply — tokenize the corpus with the 3 learned merges
    and report the top-20 resulting symbol vocabulary by occurrence
    count (operators/tokenizer.py:bpe_tokenize_vocab) — the train+
    apply round trip."""
    from database_query_processor_spark.operators import tokenizer as TK

    return TK.bpe_tokenize_vocab(_t(spark, sf_dir, "documents"), "text", rounds=3, k=20)


def _bpe_vocab_oracle():
    from database_query_processor_spark.operators import tokenizer as TK

    return TK.sql_bpe_tokenize_vocab(rounds=3, k=20, toks_sql=TOKS_SQL)


def bpe_compression(spark, sf_dir):
    """x63: the merge-count planning curve — corpus symbol count and
    chars-per-symbol after 0..3 BPE merges
    (operators/tokenizer.py:bpe_compression_curve)."""
    from database_query_processor_spark.operators import tokenizer as TK

    return TK.bpe_compression_curve(_t(spark, sf_dir, "documents"), "text", rounds=3)


def _bpe_curve_oracle():
    from database_query_processor_spark.operators import tokenizer as TK

    return TK.sql_bpe_compression_curve(rounds=3, toks_sql=TOKS_SQL)


SPECS = [
    QuerySpec("x63_bpe_compression", bpe_compression, _bpe_curve_oracle(),
              "BPE merge-count planning curve: exact corpus symbol count "
              "and chars-per-symbol after 0..3 merges (merge-invariant "
              "total_chars as the sanity anchor)"),
    QuerySpec("x62_hard_negatives", bm25_hard_negatives_query, _hardneg_oracle(),
              "hard-negative mining: batch BM25 (query-vocabulary-"
              "prefiltered term shuffle, integer nano-unit score sums) -> "
              "per-query top-10 pool via WindowGroupLimit -> near-dup "
              "decontamination screen -> top-3 safe negatives per query "
              "(retrieve-then-filter; r8 tail fix)"),
    QuerySpec("x61_bpe_tokenize", bpe_tokenize, _bpe_vocab_oracle(),
              "BPE apply: segment the corpus with the learned merges and "
              "report the resulting symbol vocabulary — train+apply round "
              "trip; symbol count is one keyed aggregate + TakeOrdered"),
    QuerySpec("x59_quality_quantile_norm", quality_quantile_norm, QUANTILE_NORM_SQL,
              "per-source quantile normalization of quality scores "
              "(cross-domain score calibration): percent_rank on one "
              "source exchange, exact-int rank math"),
    QuerySpec("x60_dedup_containment", dedup_containment, CONTAINMENT_SQL,
              "near-containment pairs |∩|/min(|A|,|B|): the asymmetric "
              "quote/subset-duplication gate Jaccard misses; same df-capped "
              "inverted-index join as x04, different final metric"),
    QuerySpec("x58_bpe_merges", bpe_merges, _bpe_oracle(),
              "BPE tokenizer training: per-round pair-count shuffle over "
              "word TYPES (not corpus tokens), TakeOrdered arg-max, greedy "
              "leftmost merge as an ordered JVM fold — one lazy DAG, no "
              "driver loop state; oracle re-derives the merge via "
              "run-parity windows (independent mechanism)"),
    QuerySpec("x55_substring_dedup", substring_dedup, SUBSTRING_DEDUP_SQL,
              "exact repeated-substring spans (suffix-array-style dedup via "
              "k-gram chaining): duplicated-gram COUNT window + consecutive-"
              "position run chaining, linear cost, no pair space", bench=True),
    QuerySpec("x56_dsir_select", corpus_dsir_select, DSIR_SQL,
              "DSIR importance-resampling selection: hashed-unigram "
              "log-likelihood ratio vs a target slice, 256-bucket broadcast "
              "model, ordered fold, round-before-top-k"),
    QuerySpec("x57_nb_quality_classifier", nb_quality_classifier, NB_CLASSIFIER_SQL,
              "fastText-style quality classifier as multinomial Naive Bayes: "
              "one train-split token-count shuffle, broadcast model applied "
              "to held-out docs, smoothed log-odds + prior"),
    QuerySpec("x48_dedup_editdistance", dedup_editdistance, EDITDIST_SQL,
              "edit-distance near-dup pairs: prefix-blocked equi-join + "
              "Levenshtein verify on candidates only (threshold-arg "
              "short-circuit is the production variant)"),
    QuerySpec("x49_dedup_semantic", dedup_semantic, SEMDEDUP_SQL,
              "SemDeDup: codebook coarse clusters + within-cluster cosine "
              "drop rule; per-doc keep/drop verdict, scan-side assignment, "
              "one cell-keyed shuffle"),
    QuerySpec("x46_hybrid_rrf_search", hybrid_search, _hybrid_oracle(),
              "hybrid retrieval: BM25 + dense cosine rankers fused by "
              "reciprocal-rank fusion; constant-size fusion join, corpus "
              "cost = the two rankers' scans"),
    QuerySpec("x64_rerank_cross_encoder", rerank_cross_encoder, _rerank_oracle(),
              "retrieve-then-rerank: hybrid RRF pool reranked by a "
              "query-doc interaction scorer (saturation tf + position "
              "prior); broadcast-bounded by the constant pool size"),
    QuerySpec("x65_ann_sq8_rerank", ann_sq8, SIM.sql_ann_sq8_rerank(0, k=10),
              "scalar-quantized ANN: int8-range integer-dot prefilter "
              "(global scale, floor quantization, exact int arithmetic) + "
              "exact cosine rerank of the constant pool"),
    QuerySpec("x66_ann_pq_rerank", ann_pq, SIM.sql_ann_pq_rerank(0, k=10),
              "product-quantization ANN (ADC): per-subspace ids-codebooks, "
              "argmin encode, query distance tables, m-lookup approximate "
              "distance + exact cosine rerank of the constant pool"),
    QuerySpec("x47_budget_select", corpus_budget_select, BUDGET_SELECT_SQL,
              "token-budget-capped quality-first corpus selection: "
              "range-partitioned two-pass prefix sum on the ranking key, "
              "no single-partition global window"),
    QuerySpec("x37_passage_dedup", passage_dedup, PASSAGE_DEDUP_SQL,
              "sub-document passage-level exact dedup: 32-token passages, "
              "global first-occurrence wins, documents reassembled "
              "(md5-keyed narrow shuffles)"),
    QuerySpec("x38_snapshot_delta_dedup", snapshot_delta_dedup, SNAPSHOT_DEDUP_SQL,
              "incremental crawl merge: within-crawl first-occurrence + "
              "anti-join against the snapshot's hash set on one shared "
              "hash partitioning"),
    QuerySpec("x39_lang_temperature_resample", lang_temperature_resample,
              TEMPERATURE_SQL,
              "multilingual temperature resampling (alpha=0.5): sqrt-ratio "
              "keep rates, deterministic hash gate, broadcast rate frame"),
    QuerySpec("x45_dedup_soft_weights", dedup_soft_weights, SOFT_WEIGHTS_SQL,
              "duplication-aware training weights: 1/|cluster| per doc — "
              "soft dedup preserving one unit of loss mass per content cluster"),
    QuerySpec("x44_contamination_safe_split", corpus_safe_split, SAFE_SPLIT_SQL,
              "contamination-aware split: hash-gate split with benchmark-"
              "overlapping docs forced to quarantine (x19 + x43 composed)"),
    QuerySpec("x43_train_val_test_split", corpus_split, SPLIT_SQL,
              "deterministic train/val/test split manifest (hash gate — "
              "disjoint, exhaustive, stable under retries/repartitioning)"),
    QuerySpec("x42_dedup_keep_best", dedup_keep_best, KEEP_BEST_SQL,
              "canonical doc per near-dup cluster: connected components + "
              "quality-ranked WindowGroupLimit top-1 per cluster"),
    QuerySpec("x40_bm25_search", bm25_search, _bm25_oracle(),
              "Okapi BM25 top-k retrieval: filtered (doc,term) shuffle, "
              "broadcast df/corpus stats, TakeOrderedAndProject top-k, "
              "order-deterministic score fold", bench=True),
    QuerySpec("x50_bigram_lm_quality", bigram_lm_quality, _bigram_oracle(),
              "corpus-trained interpolated bigram-LM NLL quality score "
              "(scan-side bigram extraction, one (prev,cur) count shuffle, "
              "position-ordered log-prob fold)"),
    QuerySpec("x41_unigram_lm_quality", unigram_lm_quality, _unigram_oracle(),
              "corpus-trained unigram-LM negative-log-likelihood quality "
              "score (CCNet-style perplexity filter), broadcast vocabulary, "
              "position-ordered log-prob fold"),
    QuerySpec("x36_embedding_centroid_outliers", embedding_centroid_outliers,
              CENTROID_SQL,
              "per-label embedding centroid (exact-decimal element-wise "
              "mean) + top-3 cosine outliers per label"),
    QuerySpec("x33_boilerplate_ngrams", boilerplate_ngrams, BOILERPLATE_SQL,
              "inter-document boilerplate: cross-doc repeated 4-grams, "
              "per-doc boilerplate fraction (explode + gram-freq agg + "
              "join-back)", bench=True),
    QuerySpec("x34_domain_mix", domain_mix, DOMAIN_MIX_SQL,
              "domain-mix rebalance: cap every source at the smallest "
              "source's token budget via deterministic hash-gated sampling"),
    QuerySpec("x35_embedding_quantize", embedding_quantize, QUANTIZE_SQL,
              "int8 symmetric embedding quantization with per-vector scale "
              "and max reconstruction error (single scan, no shuffle)"),
    QuerySpec("x01_dedup_exact", dedup_exact,
              f"SELECT md5({NORM_SQL}) AS fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies "
              "FROM documents GROUP BY 1",
              "exact dedup via normalized-content fingerprint (hash-groupBy)", bench=True),
    QuerySpec("x02_dedup_minhash", dedup_minhash, JACCARD_PAIRS_SQL,
              "MinHash-LSH banded candidates + exact-Jaccard verify (oracle = exact pair set; "
              "LSH recall ≈1 at observed dup similarity)", bench=True),
    QuerySpec("x03_dedup_simhash", dedup_simhash, _simhash_oracle(),
              "SimHash near-dups, hamming ≤3 via pigeonhole banding (md5-60 "
              "oracle-parity variant, uncapped exact pairing at test scale; "
              "production default = simhash64/xxhash64 with capped bucket chains)"),
    QuerySpec("x04_dedup_ngram_jaccard", dedup_ngram_jaccard, JACCARD_CAPPED_SQL,
              "word-3-gram Jaccard pairs via df-capped inverted-index join + exact verify"),
    QuerySpec("x05_dedup_embedding", dedup_embedding, COSINE_PAIRS_SQL,
              "embedding cosine near-dup pairs (bit-exact double math)"),
    QuerySpec("x06_sim_cosine_topk", sim_cosine_topk, COSINE_TOPK_SQL,
              "brute-force cosine top-k neighbors (exact ANN baseline)", bench=True),
    QuerySpec("x13_sim_ann_ivf", sim_ann_ivf, ANN_IVF_SQL,
              "IVF ANN: Voronoi coarse-quantize, probe 2/8 cells, exact cosine within"),
    QuerySpec("x07_sim_ann_lsh", sim_ann_lsh, ANN_LSH_SQL,
              "hyperplane-LSH bucketed ANN top-k (deterministic → full oracle)"),
    QuerySpec("x08_text_langid", text_langid, LANGID_SQL,
              "language ID: CJK detection + stopword-overlap argmax"),
    QuerySpec("x09_text_quality", text_quality, QUALITY_SQL,
              "quality scoring: length/punct/stopword heuristics"),
    QuerySpec("x10_text_token_counts", text_token_counts, TOKENS_SQL_Q,
              "token counting: whitespace + BPE-ish regex"),
    QuerySpec("x11_text_fingerprint", text_fingerprint,
              f"SELECT doc_id, md5({NORM_SQL}) AS fingerprint FROM documents",
              "document fingerprinting (normalized md5)"),
    QuerySpec("x17_text_scrub", text_scrub, SCRUB_SQL,
              "PII redaction (URL/email regex chain) with deterministic "
              "synthetic injection for parity"),
    QuerySpec("x24_pipeline_clean_corpus", pipeline_clean_corpus, PIPELINE_SQL,
              "end-to-end cleaning pipeline in one plan: lang gate + quality "
              "gate + PII scrub + exact dedup + stats (single shuffle)", bench=True),
    QuerySpec("x18_dedup_clusters", dedup_clusters, CLUSTERS_SQL,
              "near-dup clusters: MinHash pairs resolved by distributed "
              "connected components (min-label propagation; oracle = recursive CTE)"),
    QuerySpec("x19_decontaminate", corpus_decontaminate, DECONTAM_SQL,
              "benchmark decontamination: 5-gram overlap vs held-out slice "
              "via broadcast join"),
    QuerySpec("x52_fuzzy_decontaminate", corpus_fuzzy_decontaminate,
              FUZZY_DECONTAM_SQL,
              "near-dup decontamination: exact 3-gram Jaccard vs the "
              "benchmark via broadcast inverted index (LSH recall too low "
              "for a leakage gate); output-sensitive pair aggregation"),
    QuerySpec("x53_token_drift", corpus_token_drift, TOKEN_DRIFT_SQL,
              "corpus drift monitor: per-token KL contributions between two "
              "sources, one conditional aggregate + 1-row broadcast totals, "
              "round-before-top-k contract"),
    QuerySpec("x54_corpus_profile", corpus_profile, CORPUS_PROFILE_SQL,
              "one-pass corpus profile: per-lang + rollup dataset-card "
              "stats (docs, sources, char/token volume, exact percentile "
              "lengths) in a single scan + one shuffle"),
    QuerySpec("x20_doc_chunks", corpus_chunks, CHUNKS_SQL,
              "document chunking: overlapping 64-token windows, stride 48 "
              "(pretrain packing prep)"),
    QuerySpec("x21_stratified_sample", corpus_sample, SAMPLE_SQL,
              "deterministic stratified sampling by length stratum "
              "(modular-hash gate, reproducible under retries)"),
    QuerySpec("x22_export_jsonl", corpus_jsonl, JSONL_SQL,
              "JSONL training-shard serialization (engine-independent bytes, "
              "writer in sources/sink.py)"),
    QuerySpec("x23_train_shuffle", corpus_shuffle, SHUFFLE_SQL,
              "deterministic global shuffle order via two-pass distributed "
              "total sort (no single-partition window)"),
    QuerySpec("x12_multimodal_decode", multimodal_decode,
              "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
              "64 + octet_length(encode(text)) % 512 AS fake_width, "
              "64 + (octet_length(encode(text)) * 7) % 512 AS fake_height, "
              "1 + octet_length(encode(text)) % 8 AS n_frames FROM documents",
              "multimodal binary plumbing: payload + metadata + mapInPandas decode (stubbed codec)"),
    QuerySpec("x14_multimodal_resize", multimodal_resize, RESIZE_SQL,
              "mapInPandas resize: aspect-preserving downscale to max_dim=128"),
    QuerySpec("x15_multimodal_frames", multimodal_frames, FRAMES_SQL,
              "mapInPandas frame sampling: variable fanout, every 2nd frame"),
    QuerySpec("x16_multimodal_features", multimodal_features, FEATURES_SQL,
              "mapInPandas feature extraction: fixed-dim embedding per payload "
              "(batch-inference shape, deterministic fake model)"),
    QuerySpec("x25_vocab_topk", vocab_topk, VOCAB_SQL,
              "vocabulary building: corpus-wide term + document frequencies, top-100"),
    QuerySpec("x26_tfidf_terms", tfidf_terms, TFIDF_SQL,
              "tf-idf characteristic terms per document (rational idf for "
              "cross-engine bit-stability), per-doc window top-3"),
    QuerySpec("x27_bigram_counts", bigrams_, BIGRAMS_SQL,
              "bigram collocation counts (n-gram LM pass), thresholded"),
    QuerySpec("x28_sim_knn_join", sim_knn_join, KNN_JOIN_SQL,
              "batch k-NN join: exact top-5 cosine neighbors for every query "
              "vector (broadcast query batch, corpus never shuffles)"),
    QuerySpec("x29_sim_knn_join_lsh", sim_knn_join_lsh, KNN_JOIN_LSH_SQL,
              "approximate k-NN join: both sides hyperplane-bucketed, "
              "equi-join on bucket — the big-queries big-corpus scale path"),
    QuerySpec("x31_weighted_sample", corpus_weighted_sample, WEIGHTED_SAMPLE_SQL,
              "quality-weighted deterministic sampling: P(keep)=quality via "
              "modular-hash gate (reproducible data mixing)"),
    QuerySpec("x51_weighted_reservoir", corpus_weighted_reservoir,
              WEIGHTED_RESERVOIR_SQL,
              "exact-size weighted reservoir (Efraimidis-Spirakis A-ES): "
              "deterministic u^(1/w) keys, TakeOrderedAndProject top-k, "
              "no global sort"),
    QuerySpec("x30_sequence_pack", corpus_pack, PACK_SQL,
              "sequence packing: concat-then-split documents into fixed "
              "1024-token training sequences via a two-pass distributed "
              "prefix sum (no single-partition window)"),
    QuerySpec("x32_text_repetition", text_repetition, REPETITION_SQL,
              "Gopher-style repetition filters: dup-token fraction, "
              "top-bigram coverage, dup-bigram fraction (boilerplate "
              "detection; exact int counts, bit-stable fractions)",
              bench=True),
]
