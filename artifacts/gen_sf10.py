#!/usr/bin/env python
"""Synthesize the sf10 DOCUMENTS corpus (500k docs) for the round-8
fourth-decade dedup spot-check (VERDICT r7 item 8): 10 copies of the
sf1 documents (themselves gen_sf1.py's 10x of sf0.1), each copy j >= 1
rewriting every content token t -> t + 'w{j}y' — the same bijective
token remap gen_sf1 uses (suffix scheme disjoint from sf1's 'q{i}x'),
so within-copy shingle/fingerprint/k-gram structure is exactly
isomorphic to sf1 while cross-copy CONTENT token universes are
disjoint. STOPWORDS and the BM25 query terms stay exempt (function-word
document frequency grows with the corpus, like a real crawl).

Invariants asserted at generation time (fail loudly, never quietly
invalidate the sf10 rows):
  * no source token is already w{j}y-shaped (suffix collision guard);
  * exact-dup mass scales EXACTLY 10x (cross-copy disjointness);
  * zero all-exempt 8-grams (x55's k-gram universe is copy-pure, so
    its sf10 result must be 10 isomorphic images of sf1's — checked
    by run_sf10_dedup.py). All-exempt 3-GRAMS do exist (~12k at sf1),
    so the 3-gram ops (x02/x04/x60) are NOT count-invariant across
    the decade — they are checked against real oracles / independent
    in-engine mechanisms instead, never against a scaled count.

Only documents.parquet is written — the five dedup pair-space rows
read nothing else. Output: /tmp/dqps_sf10/documents.parquet
(regenerable scratch, never committed).
Usage: PYTHONPATH=/root/repo python artifacts/gen_sf10.py
"""
from __future__ import annotations

import os
import re as _re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from database_query_processor_spark.catalog import load_table  # noqa: E402
from database_query_processor_spark.session import get_spark  # noqa: E402

SRC = "/tmp/dqps_sf1"
DST = "/tmp/dqps_sf10"
COPIES = 10


def main() -> None:
    from database_query_processor_spark.functions.text import (
        STOPWORDS,
        tokens,
        word_ngrams,
    )
    from database_query_processor_spark.workload.extensions import BM25_TERMS

    spark = get_spark(
        app_name="dqps-gen-sf10",
        driver_memory="64g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(DST, exist_ok=True)

    exempt = sorted({w for ws in STOPWORDS.values() for w in ws} | set(BM25_TERMS))
    alts = "|".join(_re.escape(w) for w in exempt)
    # engine-tokenizer-aligned boundaries ([a-z0-9] lookarounds), same
    # rationale as gen_sf1._write_documents
    pat = (
        r"(?i)(?<![a-z0-9])(?!(?:" + alts + r")(?![a-z0-9]))([a-z0-9]+)(?![a-z0-9])"
    )

    src = load_table(spark, SRC, "documents")
    span = int(src.agg(F.max("doc_id")).first()[0]) + 1
    n_preshaped = src.filter(
        F.lower("text").rlike(r"(?<![a-z0-9])[a-z0-9]*w[1-9]y(?![a-z0-9])")
    ).count()
    if n_preshaped:
        raise RuntimeError(
            f"{n_preshaped} sf1 docs already contain w<j>y-shaped tokens; "
            "pick a different copy-suffix scheme"
        )
    ex_arr = F.array(*[F.lit(w) for w in exempt])
    n_allex8 = (
        src.select(F.explode(word_ngrams(tokens("text"), 8)).alias("g"))
        .filter(F.size(F.array_except(F.split("g", " "), ex_arr)) == 0)
        .count()
    )
    if n_allex8:
        raise RuntimeError(
            f"{n_allex8} all-exempt 8-grams in sf1 — x55's copy-isomorphism "
            "invariant would not hold; do not use this corpus for it"
        )

    parts = []
    for j in range(COPIES):
        d = src.withColumn("doc_id", F.col("doc_id") + F.lit(j * span))
        if j > 0:
            d = d.withColumn(
                "text", F.regexp_replace("text", pat, f"$1w{j}y")
            ).withColumn("n_chars", F.length("text"))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    dup = lambda df: df.count() - df.select("text").distinct().count()  # noqa: E731
    d_src = dup(src)
    written = spark.read.parquet(f"{DST}/documents.parquet")
    d_out = dup(written)
    if d_out != COPIES * d_src:
        raise RuntimeError(
            f"sf10 dup-mass invariant broken: {d_out} != {COPIES} * {d_src}"
        )
    print(
        f"documents: {written.count()} rows, span={span}, "
        f"dup surplus {d_src} -> {d_out} (exactly {COPIES}x)"
    )


if __name__ == "__main__":
    main()
