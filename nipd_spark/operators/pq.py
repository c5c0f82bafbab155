"""Product quantization (PQ) ANN over embedding columns (SURVEY.md §2.9
L5; the memory-bound scale path of the similarity stack).

Reference basis [PK]: Jégou, Douze & Schmid 2011, "Product Quantization
for Nearest Neighbor Search" (IEEE TPAMI) — the compression scheme under
FAISS's IVFPQ: split each D-dim vector into M subvectors, k-means each
subspace independently into KSUB codes, store each vector as M small
code ids (M bytes at KSUB=256), and score queries against codes via an
Asymmetric Distance Computation (ADC) lookup table instead of raw
floats.

Spark-first realization — every stage is a DataFrame op:

  1. **subvectors**: explode (vec_id, embedding) into (vec_id, sub_id,
     sub) with a JVM-side transform+slice — M rows per vector, no UDF.
  2. **train**: per-subspace k-means sharing the IVF seeding idea
     (deterministic hash-arg-min per (sub_id, vec_id % KSUB) residue
     class — no RNG) + Lloyd rounds as broadcast-join argmin assignment
     and groupBy-mean re-estimation, all M subspaces trained in the
     SAME jobs (sub_id is just another group key — one pass trains the
     whole codebook, not M passes).
  3. **encode**: one broadcast join + min_by per (vec, sub) — the full
     base table is touched once; output is the (vec_id, sub_id, code)
     code table, M·log2(KSUB) bits per vector. At 100 TB THIS is the
     point: a 64-dim float32 corpus compresses 32× (256 B → 8 B),
     so the scored representation of a 100 TB embedding store fits the
     cluster's page cache.
  4. **search_adc**: per query, the exact partial distance to every
     (sub_id, code) centroid — an M·KSUB lookup table, broadcast — then
     approx dist(q, v) = Σ_sub LUT[sub, code_v[sub]] as an equi-join +
     grouped sum over the CODE table (the raw vectors are never read),
     take top-``cand`` candidates per query, and exact-cosine re-rank
     only those against the float vectors (same arithmetic as
     operators/vector.py, so final scores are bit-identical to the
     brute-force oracle's on shared pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nipd_spark.operators import vector


def subvectors(emb: DataFrame, m: int, dim: int = 64, id_col: str = "vec_id") -> DataFrame:
    """(id, sub_id, sub: array<double>): the M contiguous slices."""
    sub_len = dim // m
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.struct(
            j.alias("sub_id"),
            F.transform(
                F.slice("embedding", j * sub_len + 1, sub_len),
                lambda x: x.cast("double"),
            ).alias("sub"),
        ),
    )
    return emb.select(id_col, F.explode(subs).alias("s")).select(
        id_col, F.col("s.sub_id").alias("sub_id"), F.col("s.sub").alias("sub")
    )


def _d2(sub_col: str = "sub", cen_col: str = "centroid"):
    """Squared L2 distance subvector↔centroid (sequential double sum)."""
    return F.aggregate(
        F.zip_with(
            F.col(sub_col), F.col(cen_col), lambda x, c: (x - c) * (x - c)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_codes(sv: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vec_id, sub_id, code): nearest centroid per subspace, ties →
    lowest code. One broadcast join (codebooks are M·KSUB rows) and a
    min_by per (vec, sub) — map-side at any scale."""
    scored = sv.join(F.broadcast(codebooks), "sub_id").select(
        "vec_id", "sub_id", "code", _d2().alias("d2")
    )
    return scored.groupBy("vec_id", "sub_id").agg(
        F.min_by("code", F.struct("d2", "code")).alias("code")
    )


def train_codebooks(
    emb: DataFrame, m: int = 8, ksub: int = 16, iters: int = 2, dim: int = 64
) -> DataFrame:
    """(sub_id, code, centroid: array<double>) — per-subspace k-means.

    Seeding mirrors ivf.train_centroids: within each (sub_id,
    vec_id % ksub) residue class take the subvector whose multiplicative
    hash is smallest — deterministic, portable, one map-side agg for
    the whole M×KSUB codebook.
    """
    sv = subvectors(emb, m, dim)
    seed_key = (
        F.pmod(F.col("vec_id") * 2971 + 7, F.lit(100003))
        * F.lit(1_000_000_000_000)
        + F.col("vec_id")
    )
    cb = (
        sv.groupBy(
            "sub_id",
            F.pmod(F.col("vec_id"), F.lit(ksub)).cast("int").alias("code"),
        )
        .agg(F.min_by("sub", seed_key).alias("centroid"))
    )
    for _ in range(iters):
        assigned = assign_codes(sv, cb)
        member = assigned.join(sv, ["vec_id", "sub_id"]).select(
            "sub_id", "code", F.posexplode("sub").alias("pos", "v")
        )
        cb = (
            member.groupBy("sub_id", "code", "pos")
            .agg(F.avg("v").alias("c"))
            .groupBy("sub_id", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("centroid")
            )
        )
    return cb


def search_adc(
    base: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    cand: int = 50,
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Top-k per query: ADC candidate generation over the code table,
    exact cosine re-rank of the top-``cand``. Returns (q_id,
    neighbor_id, cosine, rn) — the l4b/l5b result shape."""
    q_sv = subvectors(
        queries.select(F.col("vec_id").alias("q_id"), "embedding"),
        m,
        dim,
        id_col="q_id",
    )
    lut = q_sv.join(F.broadcast(codebooks), "sub_id").select(
        "q_id", "sub_id", "code", _d2().alias("pdist")
    )
    approx = (
        codes.join(F.broadcast(lut), ["sub_id", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("pdist").alias("adist"))
    )
    cw = Window.partitionBy("q_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    cands = (
        approx.withColumn("crn", F.row_number().over(cw))
        .filter(F.col("crn") <= cand)
        .select("q_id", "vec_id")
    )
    base_n = base.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        vector.l2_norm(F.col("embedding")).alias("b_norm"),
    )
    q_n = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        vector.l2_norm(F.col("embedding")).alias("q_norm"),
    )
    rescored = (
        cands.join(base_n, cands.vec_id == base_n.b_id)
        .join(F.broadcast(q_n), "q_id")
        .filter(F.col("q_id") != F.col("b_id"))
        .select(
            "q_id",
            F.col("b_id").alias("neighbor_id"),
            vector.cosine(
                F.col("q_emb"), F.col("b_emb"), F.col("q_norm"), F.col("b_norm")
            ).alias("cosine"),
        )
    )
    rw = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cosine", "rn")
    )
