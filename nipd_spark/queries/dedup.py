"""Near-duplicate detection queries (SURVEY.md §2.9 L3).

Corpus calibration (probed): vocabulary is 31 tokens so token-set
Jaccard is uninformative (median 0.66 between random docs); 3-token
shingles separate cleanly (median 0, p99 0.014) and the generator
plants near-dup pairs at J ≥ 0.5 — those are what these queries find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.operators import minhash
from nipd_spark.registry import query

# DuckDB twin of operators.text.shingles (3-gram over single-space split)
_DUCK_SHINGLES = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks WHERE len(t) >= 3
)
"""


@query(
    "l3_jaccard_pairs",
    sql=_DUCK_SHINGLES
    + """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    """,
    tags=("L3",),
)
def l3_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle Jaccard ≥ 0.5 pairs — the brute-force correctness
    anchor for MinHash.

    Spark side is the SCALABLE shape already: explode + equi-join on
    shingle (co-shingled pairs only), never a cross product. The oracle
    uses DuckDB list algebra — same sets, same integer counts.
    """
    docs = load(spark, sf_dir, "documents")
    sh = minhash.doc_shingles(docs, 3)
    return minhash.exact_jaccard(sh).filter(F.col("jaccard") >= 0.5)


@query("l3b_minhash_lsh", sql=None, tags=("L3",))
def l3b_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-banded LSH near-dup pipeline (rows-only: cross-engine
    xxhash64 isn't reproducible in DuckDB — SURVEY.md §2.9 L3 'partial').

    tests/test_dedup_similarity.py asserts this equals l3_jaccard_pairs
    on the corpus (LSH misses ≈1% at J=0.5 by design; the planted pairs
    sit at J≈0.99 where miss probability is ~0).
    """
    docs = load(spark, sf_dir, "documents")
    return minhash.near_dup_pairs(docs, threshold=0.5, n=3).select(
        "a_id", "b_id", "n_inter", "jaccard"
    )
