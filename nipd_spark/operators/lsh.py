"""Random-hyperplane LSH for approximate nearest neighbors over
embedding columns (SURVEY.md §2.9 L5, §4.3; Charikar 2002 SimHash
hyperplane rounding).

Mechanism (the 100 TB path):
  1. bucket = sign-bit pattern of dot(v, rⱼ) for n_planes fixed Gaussian
     hyperplanes → single int key
  2. candidates = equi-join on bucket (multiprobe: also buckets at
     Hamming distance 1, recovering near-boundary misses)
  3. exact cosine re-rank of candidates, top-k per query

The pair scan never leaves equi-join land; the exact O(n²) scan
(similarity.l4_*) is the correctness anchor at test SF. On this corpus
embeddings are isotropic Gaussian (no cluster structure — verified), so
absolute recall is intrinsically modest; tests assert the candidate
generation and re-rank are exactly right, and recall is reported.

Planes use a fixed seed → fully deterministic output.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipd_spark.operators import vector

N_PLANES = 6
SEED = 42
DIMS = 64


def _planes() -> list[list[float]]:
    rng = np.random.RandomState(SEED)
    return rng.randn(N_PLANES, DIMS).tolist()


def with_bucket(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Append the hyperplane sign-bucket (0 .. 2^N_PLANES-1)."""
    emb = F.col(emb_col)
    bucket = F.lit(0)
    for j, plane in enumerate(_planes()):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(vector.dot(emb, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return df.withColumn("bucket", bucket)


def probe_buckets(bucket_col: str = "bucket") -> F.Column:
    """Multiprobe set: own bucket + all Hamming-distance-1 neighbors."""
    b = F.col(bucket_col)
    return F.array(b, *[b.bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)])


def ann_topk(
    base: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k approximate neighbors per query row.

    base/queries: (vec_id, embedding[, ...]). Returns
    (q_id, neighbor_id, cosine, rn) with deterministic tie-breaks.
    """
    from pyspark.sql import Window

    b = with_bucket(base).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        vector.l2_norm(F.col("embedding")).alias("n_nrm"),
        "bucket",
    )
    q = (
        with_bucket(queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            vector.l2_norm(F.col("embedding")).alias("q_nrm"),
            F.explode(probe_buckets()).alias("probe"),
        )
    )
    cand = (
        q.join(b, q.probe == b.bucket)
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "q_emb", "q_nrm", "neighbor_id", "n_emb", "n_nrm")
        .distinct()
    )
    cos = vector.cosine(
        F.col("q_emb"), F.col("n_emb"), F.col("q_nrm"), F.col("n_nrm")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("q_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
