"""Block-matrix kNN: numpy GEMM candidate generation + bit-exact
re-scoring (SURVEY.md §2.9 L4, §4.3).

The zip_with/aggregate per-pair scan is correct but interpreter-bound
(~70× slower than vectorized at sf0.1). This operator is the fast path:

  1. the smaller side (all vectors for global-pairs, or the query set)
     is broadcast as a dense float64 matrix
  2. each partition of the big side runs one BLAS GEMM against it and
     keeps only its local top candidates (mapInPandas, Arrow-batched)
  3. global top-k over candidates
  4. winners are re-scored with the sequential zip_with/aggregate
     expression, so emitted cosines are bit-identical to the naive scan
     (and to the DuckDB oracle) — GEMM only *selects*, never *reports*

Scale notes (100 TB): this is the standard block outer-product: A stays
partitioned, B is broadcast block-by-block (loop over B-blocks when B
exceeds executor memory); per-partition top-k bounds shuffle volume to
k rows per partition. Selection is robust to GEMM-vs-sequential ulp
differences unless two true cosines are within ~1e-12 at the k-boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipd_spark.operators import vector


def _to_matrix(pdf_col: pd.Series) -> np.ndarray:
    return np.stack(pdf_col.to_numpy()).astype(np.float64)


def top_pairs_gemm(emb: DataFrame, k: int, overfetch: int = 4) -> DataFrame:
    """Global top-k (a_id < b_id) cosine pairs. emb: (vec_id, embedding)."""
    spark = emb.sparkSession
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    M = _to_matrix(pdf["embedding"])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, Mn))
    local_k = k * overfetch
    # Block sizing is governed by the SCORE matrix, not the input block:
    # each block materializes rows×n float64 scores, so rows is chosen to
    # keep that ≤ ~256 MB (at n=32k that is 1k rows/block → 32-way
    # parallel GEMM; a single unsplit block would be a 16 GB matrix on
    # one thread). Tiny inputs still collapse to ONE worker round-trip
    # (5 ms fixed cost per micro-batch otherwise).
    n_total = len(pdf)
    rows_per_block = max(1024, min(65536, (256 << 20) // (8 * max(1, n_total))))
    n_parts = max(1, (n_total + rows_per_block - 1) // rows_per_block)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NOTE: closure must not reference importable module symbols —
        # cloudpickle serializes those by reference and the driver's
        # workers may not have nipd_spark on their sys.path.
        b_ids, Bn = bc.value
        for p in batches:
            if not len(p):
                continue
            A = np.stack(p["embedding"].to_numpy()).astype(np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            a_ids = p["vec_id"].to_numpy()
            S = An @ Bn.T  # (rows, n)
            mask = a_ids[:, None] < b_ids[None, :]
            S[~mask] = -np.inf  # in-place: no second rows×n temporary
            flat = S.ravel()
            n_take = min(local_k, int(mask.sum()))
            if n_take == 0:
                continue
            idx = np.argpartition(-flat, n_take - 1)[:n_take]
            r, c = np.unravel_index(idx, S.shape)
            yield pd.DataFrame(
                {"a_id": a_ids[r], "b_id": b_ids[c], "approx": flat[idx]}
            )

    # coalesce() only narrows; when the scan has fewer partitions than the
    # GEMM wants (one small parquet file), repartition UP — the shuffled
    # payload is just (id, vector), cheap next to the quadratic stage.
    src = emb.select("vec_id", "embedding")
    cur_parts = src.rdd.getNumPartitions() or 1
    sized = src.repartition(n_parts) if n_parts > cur_parts else src.coalesce(n_parts)
    cand = (
        sized.mapInPandas(block, "a_id long, b_id long, approx double")
        .orderBy(F.col("approx").desc(), "a_id", "b_id")
        .limit(k)
    )
    return _rescore(emb, cand).orderBy(
        F.col("cosine").desc(), F.col("a_id").asc(), F.col("b_id").asc()
    )


def topk_per_query_gemm(
    emb: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Exact top-k neighbors per query row (q_id, neighbor_id, cosine, rn).

    The query set is the broadcast side; each base partition scores its
    block against all queries and keeps per-query local top-k.
    """
    from pyspark.sql import Window

    spark = emb.sparkSession
    qpdf = queries.select("vec_id", "embedding").toPandas()
    q_ids = qpdf["vec_id"].to_numpy()
    Q = _to_matrix(qpdf["embedding"])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, Qn))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, Qb = bc.value
        for p in batches:
            if not len(p):
                continue
            A = np.stack(p["embedding"].to_numpy()).astype(np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            n_ids = p["vec_id"].to_numpy()
            S = Qb @ An.T  # (n_q, rows)
            S = np.where(qi[:, None] != n_ids[None, :], S, -np.inf)
            take = min(k, S.shape[1])
            part = np.argpartition(-S, take - 1, axis=1)[:, :take]
            rows = np.repeat(np.arange(S.shape[0]), take)
            cols = part.ravel()
            keep = np.isfinite(S[rows, cols])
            yield pd.DataFrame(
                {
                    "q_id": qi[rows[keep]],
                    "neighbor_id": n_ids[cols[keep]],
                    "approx": S[rows[keep], cols[keep]],
                }
            )

    w = Window.partitionBy("q_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        emb.select("vec_id", "embedding")
        .mapInPandas(block, "q_id long, neighbor_id long, approx double")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("q_id").alias("a_id"), F.col("neighbor_id").alias("b_id"))
    )
    rescored = _rescore(emb, cand).select(
        F.col("a_id").alias("q_id"),
        F.col("b_id").alias("neighbor_id"),
        "cosine",
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return rescored.withColumn("rn", F.row_number().over(w2))


def _rescore(emb: DataFrame, pairs: DataFrame) -> DataFrame:
    """Bit-exact sequential cosine for the selected (a_id, b_id) pairs."""
    e = emb.select(
        "vec_id", "embedding", vector.l2_norm(F.col("embedding")).alias("nrm")
    )
    a = e.alias("ka")
    b = e.alias("kb")
    cos = vector.cosine(
        F.col("ka.embedding"), F.col("kb.embedding"), F.col("ka.nrm"), F.col("kb.nrm")
    )
    return (
        pairs.join(F.broadcast(a), pairs.a_id == F.col("ka.vec_id"))
        .join(F.broadcast(b), pairs.b_id == F.col("kb.vec_id"))
        .select("a_id", "b_id", cos.alias("cosine"))
    )
