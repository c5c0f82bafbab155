"""Similarity search over `embeddings` (SURVEY.md §2.9 L4/L5/L11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.operators import knn, lsh, vector
from nipd_spark.oracle import dround
from nipd_spark.registry import query

_DUCK_COS = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    " / (a.nrm * b.nrm)"
)

_DUCK_NORMED = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({vector.duck_sq_norm('embedding')}) AS nrm
  FROM embeddings
)
"""


@query(
    "l4_knn_bruteforce",
    sql=_DUCK_NORMED
    + f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_DUCK_COS} AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    ORDER BY cosine DESC, a_id ASC, b_id ASC
    LIMIT 10
    """,
    tags=("L4",),
)
def l4_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 cosine pairs (BASELINE.md row) via the GEMM hybrid
    (operators/knn.py): BLAS selects candidates per partition, winners
    are re-scored with the sequential expression so emitted cosines stay
    bit-identical to the DuckDB oracle's arithmetic.

    Scale note: block outer-product + per-partition top-k; the exact
    O(n²) relation is unchanged — L5 is the sub-quadratic path.
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn.top_pairs_gemm(e, k=10)


@query(
    "l4b_knn_per_query",
    sql=_DUCK_NORMED
    + f"""
    SELECT * FROM (
      SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, {_DUCK_COS} AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_COS} DESC, b.vec_id ASC) AS rn
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 20
    ) WHERE rn <= 5
    """,
    tags=("L4", "O4"),
)
def l4b_knn_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors for a 20-vector query set (kNN ground truth
    used by the L5 recall test) — GEMM candidates + bit-exact re-score,
    query matrix broadcast."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn.topk_per_query_gemm(e, e.filter(F.col("vec_id") < 20), k=5)


@query("l5_ann_lsh", sql=None, tags=("L5",))
def l5_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via hyperplane LSH + multiprobe +
    exact re-rank (rows-only; deterministic fixed-seed planes).

    tests assert re-rank exactness against l4b ground truth restricted
    to the candidate set, and report recall (intrinsically modest here:
    the corpus embeddings are isotropic Gaussian, no cluster structure).
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return lsh.ann_topk(e, e.filter(F.col("vec_id") < 20), k=5)


@query(
    "l11_centroids",
    sql=f"""
    WITH flat AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    )
    SELECT label, pos,
           {dround("avg(val)", 6)} AS centroid_val,
           count(*) AS n_vecs
    FROM flat
    GROUP BY label, pos
    """,
    tags=("L11",),
)
def l11_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long (label, pos, value) format — grouped
    element-wise mean via posexplode (avg-pool per label).

    Long format keeps the oracle hashable; re-packing to arrays is a
    deterministic sort_array(collect_list(struct(pos,val))) away.
    Scale note: shuffle key (label, pos) has 640 values — perfectly
    uniform; n_vecs per key = table_rows/10.
    """
    e = load(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select("label", "pos", F.col("v").cast("double").alias("val"))
    return flat.groupBy("label", "pos").agg(
        F.round(F.avg("val"), 6).alias("centroid_val"),
        F.count("*").alias("n_vecs"),
    )


@query("l5b_ann_ivf", sql=None, tags=("L5",))
def l5b_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via an IVF-Flat index (operators/
    ivf.py): deterministic k-means coarse quantizer (8 lists, 2 Lloyd
    rounds), nprobe=2, exact cosine re-rank inside probed lists.

    Rows-only for the driver (probe set is approximate); property tests
    pin (a) nprobe=C == exact brute-force kNN, (b) bit-exact re-rank
    scores vs l4b ground truth on shared candidates, (c) recall report.
    """
    from nipd_spark.operators import ivf

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cen = ivf.train_centroids(e, n_lists=8, iters=2)
    cen = cen.cache()
    assigned = ivf.assign(e, cen)
    return ivf.search(
        e, e.filter(F.col("vec_id") < 20), cen, assigned, k=5, nprobe=2
    )
