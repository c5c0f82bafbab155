"""IVF (inverted-file) ANN index over embedding columns (SURVEY.md §2.9
L5; the "IVF variant" scale path for similarity search).

Reference basis [PK]: IVF-Flat as in Sivic & Zisserman 2003 ("Video
Google", visual words) and the FAISS IVF family (Johnson et al. 2017,
"Billion-scale similarity search with GPUs") — a coarse k-means
quantizer partitions vectors into C inverted lists; a query probes only
the ``nprobe`` nearest lists and re-ranks candidates exactly.

Spark-first realization — every stage is a DataFrame op so Catalyst
owns the physical plan:

  1. **train**: deterministic hash-arg-min seeding (no RNG, no global
     sort — resumable and cross-run stable) + Lloyd iterations expressed as
     crossJoin(broadcast(centroids)) → max_by assignment → posexplode →
     groupBy(list_id, pos).avg → re-pack. Centroid count C is small
     (≤ thousands), so centroids always broadcast.
  2. **assign**: one broadcast join + max_by per vector — the only
     full-data pass; at 100 TB this is an embarrassingly parallel
     map-side op (no shuffle: broadcast + per-row argmax, then the
     groupBy(vec_id) collapses locally since vec_id is unique).
  3. **search**: query → top-nprobe lists (broadcast centroids again) →
     explode probes → **equi-join on list_id** against the assigned
     base — the crossJoin of brute-force kNN becomes a hash join whose
     build side is 1/C of the data per probe — → exact cosine re-rank
     (same expression shape as operators/vector.py, so reported scores
     are bit-identical to the brute-force oracle).

Probing all C lists recovers exact kNN (tested property); recall at
nprobe < C degrades gracefully and is reported by the test harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nipd_spark.operators import vector


def _centroid_cos(emb_col: str = "embedding", cen_col: str = "centroid"):
    """Cosine(query embedding, centroid); centroid is already unit-norm
    double[] so only the embedding norm divides."""
    return vector.dot(F.col(emb_col), F.col(cen_col)) / vector.l2_norm(
        F.col(emb_col)
    )


def _normalize(cen: DataFrame) -> DataFrame:
    """Unit-normalize centroid arrays (cosine assignment == dot argmax)."""
    nrm = vector.l2_norm(F.col("centroid"))
    return cen.select(
        "list_id",
        F.transform("centroid", lambda x: x / nrm).alias("centroid"),
    )


def train_centroids(emb: DataFrame, n_lists: int, iters: int = 2) -> DataFrame:
    """k-means coarse quantizer: (list_id, centroid: array<double>).

    Seeds: one vector per residue class ``vec_id % C`` — the arg-min of
    a portable multiplicative hash within each class (deterministic
    pseudo-random spread, exact integer math in any engine). This is a
    partial+final aggregation over C groups: no global sort and no
    single-partition window, unlike strided-by-rank seeding, so the
    seeding pass scales like any other map-side agg at 100 TB. The
    packed ordering key assumes vec_id < 10^12 (hash ties then break on
    vec_id exactly); ``iters`` Lloyd rounds refine the seeds.
    """
    seed_key = (
        F.pmod(F.col("vec_id") * 2971 + 7, F.lit(100003)) * F.lit(1_000_000_000_000)
        + F.col("vec_id")
    )
    seeds = (
        emb.groupBy(
            F.pmod(F.col("vec_id"), F.lit(n_lists)).cast("int").alias("list_id")
        )
        .agg(F.min_by("embedding", seed_key).alias("seed"))
        .select(
            "list_id",
            F.transform("seed", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    cen = _normalize(seeds)
    for _ in range(iters):
        assigned = assign(emb, cen)
        member = assigned.join(emb, "vec_id").select(
            "list_id", F.posexplode("embedding").alias("pos", "v")
        )
        repacked = (
            member.groupBy("list_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
        cen = _normalize(repacked)
    return cen


def assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, list_id): nearest centroid by cosine, ties → lowest id."""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "list_id",
        _centroid_cos().alias("ccos"),
    )
    return scored.groupBy("vec_id").agg(
        F.max_by("list_id", F.struct(F.col("ccos"), -F.col("list_id"))).alias(
            "list_id"
        )
    )


def candidates(
    base: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    nprobe: int = 2,
) -> DataFrame:
    """The raw probed candidate relation (q_id, neighbor_id, cosine):
    every (query, base vector) pair meeting in one of the query's
    ``nprobe`` nearest lists, with the exact sequential-double cosine.
    SELF pairs are included (a query always probes its own assigned
    list, so q_id == neighbor_id rows exist when the query is in the
    base) — callers that want kNN semantics drop them (``search``);
    callers aligning with a full-scan leg that scores self keep them
    (l65b's dense leg, matching l65's oracle exactly at probe-all)."""
    probe_w = Window.partitionBy("q_id").orderBy(
        F.col("ccos").desc(), F.col("list_id").asc()
    )
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            "list_id",
            _centroid_cos().alias("ccos"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= nprobe)
        .select("q_id", "q_emb", "list_id")
    )
    b = assigned.join(base, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        vector.l2_norm(F.col("embedding")).alias("n_nrm"),
        "list_id",
    )
    return (
        probes.join(b, "list_id")
        .select(
            "q_id",
            "neighbor_id",
            vector.cosine(
                F.col("q_emb"),
                F.col("n_emb"),
                vector.l2_norm(F.col("q_emb")),
                F.col("n_nrm"),
            ).alias("cosine"),
        )
        .distinct()
    )


def search(
    base: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k approximate neighbors per query: probe ``nprobe`` lists,
    exact cosine re-rank inside them. Returns (q_id, neighbor_id,
    cosine, rn) — same shape/arithmetic as lsh.ann_topk / knn ground
    truth, so scores are comparable bit-for-bit."""
    cand = candidates(base, queries, centroids, assigned, nprobe).filter(
        F.col("q_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
