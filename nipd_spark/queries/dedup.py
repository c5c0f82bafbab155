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
from nipd_spark.operators import minhash, text
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

# Candidate-driven pair screen — the oracle mirrors the Spark side's
# physical shape: Jaccard >= 0.5 requires a non-empty intersection, so
# only co-shingled pairs can qualify and the exact set math runs on the
# equi-join candidates instead of all O(n²) pairs. Equivalent by
# construction (pairs with empty intersections score 0 < 0.5); measured
# 8× faster at sf0.001 and the gap widens quadratically with corpus
# size — keeps the correctness gate's latency honest about the engine
# rather than the oracle.
_DUCK_CAND = (
    _DUCK_SHINGLES
    + """,
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
)
"""
)


@query(
    "l3_jaccard_pairs",
    sql=_DUCK_CAND
    + """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM cand c JOIN sh a ON a.doc_id = c.u JOIN sh b ON b.doc_id = c.v
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


@query("l3c_simhash", sql=None, tags=("L3",))
def l3c_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 10 over 64-bit fingerprints from
    3-shingle hashes; 16x4-bit banded pigeonhole join — rows-only,
    anchored to exact Jaccard by tests)."""
    from nipd_spark.operators import simhash as sh

    docs = load(spark, sf_dir, "documents")
    shingled = minhash.doc_shingles(docs, 3).withColumnRenamed("shingle", "token")
    sigs = sh.simhash(shingled)
    return sh.near_pairs(sigs, max_hamming=10)


@query(
    "l13_doc_fingerprint",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks WHERE len(t) >= 3
    )
    SELECT doc_id, min(sha256(shingle)) AS fingerprint,
           count(*) AS n_shingles
    FROM sh GROUP BY doc_id
    """,
    tags=("L3", "L2"),
)
def l13_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (winnowing-style): per-doc minimum shingle
    hash — a content-addressable signature; equal fingerprints flag
    shared rarest shingles. sha256-based so both engines agree.
    """
    docs = load(spark, sf_dir, "documents")
    sh = minhash.doc_shingles(docs, 3)
    return sh.groupBy("doc_id").agg(
        F.min(F.sha2(F.col("shingle"), 256)).alias("fingerprint"),
        F.count("*").alias("n_shingles"),
    )


@query(
    "l14_embedding_neardup",
    sql="""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.4
    """,
    tags=("L3", "L4"),
)
def l14_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: all a_id < b_id pairs
    with cosine ≥ 0.4 (semantic-dedup step of an LLM data pipeline).

    Round-4 rewrite: the pair generation is the blocked-GEMM threshold
    screen (operators/knn.threshold_pairs_gemm, upper_only) at
    tau - 1e-6, re-scored with the sequential zip_with expression and
    re-filtered at tau EXACTLY — emitted cosines stay bit-identical to
    the DuckDB twin (the knn.py selection-vs-reporting split), while
    the interpreted all-pairs HOF scan this replaces cost ~70× more at
    sf0.1 (25 s → <1 s). The oracle remains the naive inequality join.

    Duplication-heavy corpora (the 16× probe replica duplicates every
    vector 16-fold, so near-dup PAIRS grow 256-fold) get the l26/l46
    representative cascade: byte-identical embeddings collapse to one
    representative (groupBy the array itself), screening + rescoring
    run once per DISTINCT content pair, and the verdict fans back out
    by membership — cross-content pairs inherit the reps' cosine
    (identical bytes ⇒ identical arithmetic ⇒ identical double), and
    same-content pairs get the computed self-cosine, which is exactly
    what the naive join computes for two bit-equal vectors. Cost
    scales with distinct content + true output size.
    """
    from nipd_spark.operators import knn

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn.neardup_pairs_cosine(e, tau=0.4)


@query("l14b_ivf_neardup", sql=None, tags=("L3", "L5"))
def l14b_ivf_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the IVF-screened path — l14's
    100 TB plan as an actual query, not just a documented option
    (operators/knn.neardup_pairs_ivf: representative collapse → k-means
    inverted lists → probe equi-join on list_id → bit-exact rescore at
    tau). Rows-only: the IVF screen is recall<1 by design at
    nprobe < n_lists, so no SQL twin — instead the property tests pin
    (a) probe-all == the exact GEMM path bit-for-bit and (b) every
    emitted pair exists in l14's exact output with an identical cosine,
    and report the recall.

    Scale: candidate generation is a hash join on list_id — FLOPs
    Θ(distinct² · nprobe / n_lists) with uniform lists vs the GEMM
    screen's Θ(distinct²), and no driver-side broadcast-block loop, so
    it shards across executors like any other equi-join.
    """
    from nipd_spark.operators import knn

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn.neardup_pairs_ivf(e, tau=0.4, n_lists=16, nprobe=6)


@query(
    "l13b_winnow_fingerprint",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             generate_subscripts(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1) AS idx,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3
    ),
    wmin AS (
      SELECT doc_id,
             min(sha256(shingle)) OVER (PARTITION BY doc_id ORDER BY idx
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM sh
    )
    SELECT doc_id, count(DISTINCT fp) AS n_fp, min(fp) AS min_fp
    FROM wmin GROUP BY doc_id
    """,
    tags=("L3", "L2"),
)
def l13b_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003): rolling
    window (w=4) of positional 3-shingle hashes, keep each window's
    minimum — the guarantee is every match of length ≥ w+n-1 tokens
    shares ≥1 fingerprint. Output: per-doc fingerprint-set size + the
    set's minimum (a compact content signature).

    sha256 hex (lexicographic min) keeps both engines' orderings
    identical. Scale: one explode + one window + one agg, all keyed by
    doc_id — no cross-doc shuffle until the (tiny) fingerprint sets.
    """
    from pyspark.sql import Window
    from nipd_spark.operators import text

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.posexplode(text.shingles(F.col("text"), 3)).alias("idx", "shingle"),
    )
    w = Window.partitionBy("doc_id").orderBy("idx").rowsBetween(0, 3)
    wmin = sh.select(
        "doc_id", F.min(F.sha2("shingle", 256)).over(w).alias("fp")
    )
    return wmin.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fp"), F.min("fp").alias("min_fp")
    )


@query(
    "l16_dedup_clusters",
    sql="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    pairs AS (
      -- candidate-driven: J >= 0.5 needs a shared shingle (see _DUCK_CAND)
      SELECT c.u, c.v
      FROM cand c JOIN sh sa ON sa.doc_id = c.u JOIN sh sb ON sb.doc_id = c.v
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    ),
    edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
    reach AS (
      SELECT DISTINCT u AS node, u AS r FROM edges
      UNION
      SELECT e.u AS node, reach.r FROM edges e JOIN reach ON reach.node = e.v
    )
    SELECT node AS doc_id, min(r) AS cluster_id
    FROM reach GROUP BY node
    """,
    tags=("L3", "L1"),
)
def l16_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: exact-Jaccard≥0.5 pairs → connected
    components (operators/components.py, min-label propagation) →
    (doc_id, cluster_id = min doc in group). The keep-one-per-cluster
    dedup policy is then `filter(doc_id == cluster_id)`.

    Oracle: DuckDB recursive CTE computes min reachable id — a
    different algorithm arriving at the same fixpoint (strong
    cross-check of the iterative Spark path).
    """
    from nipd_spark.operators.components import connected_components

    docs = load(spark, sf_dir, "documents")
    sh = minhash.doc_shingles(docs, 3)
    pairs = minhash.exact_jaccard(sh).filter(F.col("jaccard") >= 0.5)
    return connected_components(pairs, "a_id", "b_id").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@query(
    "l16b_canonical_rep",
    sql="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    pairs AS (
      -- candidate-driven: J >= 0.5 needs a shared shingle (see _DUCK_CAND)
      SELECT c.u, c.v
      FROM cand c JOIN sh sa ON sa.doc_id = c.u JOIN sh sb ON sb.doc_id = c.v
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    ),
    edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
    reach AS (
      SELECT DISTINCT u AS node, u AS r FROM edges
      UNION
      SELECT e.u AS node, reach.r FROM edges e JOIN reach ON reach.node = e.v
    ),
    clusters AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT cluster_id,
           max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
           max(CASE WHEN rn = 1 THEN n_chars END) AS kept_quality,
           count(*) AS n_members,
           count(*) - 1 AS n_dropped
    FROM ranked
    GROUP BY cluster_id
    """,
    tags=("L3", "L9", "A11", "W1"),
)
def l16b_canonical_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: the dedup survivorship policy
    that follows clustering. Near-dup clusters (exact-Jaccard >= 0.5 ->
    connected components, same pipeline as l16) keep their single
    best-quality member (n_chars as the quality proxy, lowest doc_id
    breaking ties); out: per cluster the kept doc, its quality, and how
    many near-dups were dropped.

    Scale shape: component labels join back to the doc table on the
    equi key, and the per-cluster arg-max is one window over
    cluster_id — both shuffle-on-key, no all-pairs work beyond the
    candidate pairs the LSH tier would feed at 100 TB. Oracle arrives
    at the same fixpoint via a recursive CTE (different algorithm, same
    answer), extending l16's cross-check to the survivorship step.
    """
    from pyspark.sql import Window

    from nipd_spark.operators.components import connected_components

    docs = load(spark, sf_dir, "documents")
    sh = minhash.doc_shingles(docs, 3)
    pairs = minhash.exact_jaccard(sh).filter(F.col("jaccard") >= 0.5)
    clusters = connected_components(pairs, "a_id", "b_id").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    ranked = clusters.join(docs.select("doc_id", "n_chars"), "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), F.col("doc_id").asc()
            )
        ),
    )
    return ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("kept_quality"),
        F.count("*").alias("n_members"),
        (F.count("*") - 1).alias("n_dropped"),
    )


@query(
    "l26_incremental_dedup",
    sql="""
    WITH batch AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    existing AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    exact_hit AS (
      SELECT DISTINCT b.doc_id
      FROM batch b JOIN existing e ON sha256(b.text) = sha256(e.text)
    ),
    btoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM batch),
    etoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM existing),
    bsh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM btoks WHERE len(t) >= 3
    ),
    esh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM etoks WHERE len(t) >= 3
    ),
    near_hit AS (
      SELECT DISTINCT b.doc_id
      FROM bsh b JOIN esh e
        ON CAST(len(list_intersect(b.s, e.s)) AS DOUBLE)
             / (len(b.s) + len(e.s) - len(list_intersect(b.s, e.s))) >= 0.5
    )
    SELECT b.doc_id,
           CASE WHEN x.doc_id IS NOT NULL THEN 'exact'
                WHEN n.doc_id IS NOT NULL THEN 'near'
                ELSE 'kept' END AS status
    FROM batch b
    LEFT JOIN exact_hit x ON b.doc_id = x.doc_id
    LEFT JOIN near_hit n ON b.doc_id = n.doc_id
    """,
    tags=("L1", "L3", "J5"),
)
def l26_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: an incoming batch (doc_id % 5 = 0 as the
    synthetic daily delta) is screened against the existing corpus —
    dropped as 'exact' on content-hash match, as 'near' on 3-shingle
    Jaccard >= 0.5 against any existing doc, else 'kept'. This is the
    production shape of corpus dedup: the historical side is a
    fingerprint store, only the delta is scored.

    Scale shape — a SCREENING CASCADE, cheap filters first: (1) the
    exact screen is an equi join on the sha2 digest (the 100 TB history
    participates only as hashes); (2) only exact-screen SURVIVORS reach
    the near screen (an exact dup's status is already decided — scoring
    it again is pure waste, and in a copy-heavy delta it was the
    dominant cost: the 16x probe fell from 49x to near-linear on this
    cascade); (3) the history side of the near screen is deduped to one
    representative per distinct content first — Jaccard against any
    copy equals Jaccard against the representative, so the candidate
    fan-out scales with DISTINCT history content, not history rows.
    Candidates come from the shingle equi key — no all-pairs — with the
    LSH tier (l3b) as the drop-in at full scale. Output is batch-sized
    regardless of history size.
    """
    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    existing = docs.filter(F.col("doc_id") % 5 != 0)

    exact_hit = (
        batch.select("doc_id", F.sha2(F.col("text"), 256).alias("h"))
        .join(
            existing.select(F.sha2(F.col("text"), 256).alias("h")).distinct(),
            "h",
            "left_semi",
        )
        .select("doc_id")
    )

    from nipd_spark.operators import text

    def shingle_long(df: DataFrame, id_alias: str, n_alias: str) -> DataFrame:
        s = F.array_distinct(text.shingles(F.col("text"), 3))
        return df.select(
            F.col("doc_id").alias(id_alias), F.size(s).alias(n_alias), s.alias("s")
        ).select(id_alias, n_alias, F.explode("s").alias("sh"))

    survivors = batch.join(exact_hit, "doc_id", "left_anti")
    # near status is a function of CONTENT: score one representative per
    # distinct surviving text, then propagate the verdict to every copy
    # by digest — the batch side of the expensive screen scales with
    # distinct delta content, exactly like the history side below
    b_rep = survivors.groupBy(F.sha2(F.col("text"), 256).alias("bh")).agg(
        F.min("doc_id").alias("doc_id"), F.min_by("text", "doc_id").alias("text")
    )
    e_rep = existing.groupBy(F.sha2(F.col("text"), 256).alias("h")).agg(
        F.min("doc_id").alias("doc_id"), F.min_by("text", "doc_id").alias("text")
    )
    b_long = shingle_long(b_rep, "b_id", "b_n")
    e_long = shingle_long(e_rep, "e_id", "e_n")
    near_hit = (
        b_long.join(e_long, "sh")
        .groupBy("b_id", "e_id", "b_n", "e_n")
        .agg(F.count("*").alias("inter"))
        .filter(
            F.col("inter").cast("double")
            / (F.col("b_n") + F.col("e_n") - F.col("inter"))
            >= 0.5
        )
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    # verdicts computed on representatives → fan back out to all copies
    near_hit = (
        near_hit.join(
            b_rep.select("doc_id", "bh"), "doc_id"
        )
        .select("bh")
        .join(
            survivors.select(
                "doc_id", F.sha2(F.col("text"), 256).alias("bh")
            ),
            "bh",
        )
        .select("doc_id")
    )

    return (
        batch.select("doc_id")
        .join(exact_hit.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near_hit.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact") == 1, F.lit("exact"))
            .when(F.col("is_near") == 1, F.lit("near"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


@query(
    "l30_fuzzy_blocked_match",
    sql="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    keyed AS (
      SELECT p_name, string_split(p_name, ' ')[2] AS blk FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    tags=("L3", "J11", "F1"),
)
def l30_fuzzy_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution: near-identical product names by
    edit distance, candidate pairs generated ONLY within a blocking key
    (the head-noun token) — the standard record-linkage shape (block →
    compare → threshold), here with Levenshtein ≤ 3 over the distinct
    name vocabulary.

    Scale shape: the quadratic comparison is confined to each block via
    an equi self-join on the blocking key; no name pair in different
    blocks is ever materialized, so cost is Σ_b |b|² over blocks, not
    N². Distinct-name collapse first removes the duplicate-entity
    degeneracy (same trick as the MinHash tier, operators/minhash.py).
    Levenshtein is JVM-side (no Python UDF).
    """
    names = (
        load(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("blk", F.split(F.col("p_name"), " ").getItem(1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn("dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")))
        .filter(F.col("dist") <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
        )
    )


@query(
    "l44_dedup_audit",
    sql="""
    WITH norm AS (
      SELECT doc_id,
             sha256(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS h
      FROM documents
    ),
    groups AS (SELECT h, count(*) AS sz FROM norm GROUP BY h)
    SELECT count(*) AS n_groups,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz) - count(*) AS BIGINT) AS n_redundant,
           max(sz) AS largest_group,
           count(*) FILTER (WHERE sz > 1) AS n_dup_groups
    FROM groups
    """,
    tags=("L1", "L2", "A2"),
)
def l44_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup pre-flight audit: BEFORE running the dedup pipeline,
    measure what it would do — normalized-content groups, redundant
    copies (rows the keep-first pass would drop), the largest clone
    family, and how many groups have any duplication at all. The
    one-row card that sizes the dedup job and catches an accidentally
    re-ingested corpus (n_redundant jumping to ~half of n_docs) before
    compute is spent. One normalize+digest pass, one grouped count,
    one reduce.
    """
    docs = load(spark, sf_dir, "documents")
    norm = F.sha2(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
            )
        ),
        256,
    )
    groups = docs.select(norm.alias("h")).groupBy("h").agg(
        F.count("*").alias("sz")
    )
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.sum("sz").cast("bigint").alias("n_docs"),
        (F.sum("sz") - F.count("*")).cast("bigint").alias("n_redundant"),
        F.max("sz").alias("largest_group"),
        F.count_if(F.col("sz") > 1).alias("n_dup_groups"),
    )


@query(
    "l46_semdedup",
    sql="""
    WITH e AS (
      SELECT vec_id, label, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    p AS (
      SELECT b.vec_id, b.label,
             max(list_sum(list_transform(range(1, 65),
                   i -> CAST(a.embedding[i] AS DOUBLE)
                        * CAST(b.embedding[i] AS DOUBLE)))
                 / (a.nrm * b.nrm)) AS max_cos
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY b.vec_id, b.label
    )
    SELECT vec_id, label, max_cos
    FROM p WHERE max_cos >= 0.35
    ORDER BY vec_id
    """,
    tags=("L5", "L11", "J11"),
)
def l46_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup that
    prunes embeddings whose cosine to an earlier item in the SAME
    cluster exceeds tau=0.35 (keep-first by vec_id, the paper's
    deterministic tie-break). The fixture `label` column stands in for
    the cluster id so the DuckDB oracle can twin the query; at scale
    the id comes from the IVF coarse quantizer (operators/ivf.py),
    which is exactly the paper's k-means step.

    Scale shape: the pair join is EQUI-keyed on the cluster id, so
    pairwise cost is sum(|cluster|^2), not |corpus|^2 — with k ~ n/1e4
    clusters the quadratic term stays bounded per cluster and the whole
    pass is one shuffle on cluster id. Byte-identical embeddings are
    collapsed to one representative BEFORE the pairwise stage (the same
    degeneracy fix the MinHash tier uses, operators/minhash.py): for an
    exact copy the cosine to its lower-id twin is exactly the self-
    cosine expression dot(e,e)/nrm² (identical fold order → identical
    bits), so copies re-enter the result closed-form and the quadratic
    term sees only DISTINCT vectors — a 16×-duplicated corpus pairs
    16² = 256× fewer rows. Result-identical to the naive all-pairs form
    (property-tested); cosines use the sequential-fold expression
    (operators/vector.py) so both engines agree bitwise and max() is
    exact.

    Precondition (oracle-guarded): the copies-re-enter-closed-form step
    assumes no distinct same-cluster pair's computed cosine reaches the
    computed self-cosine — true unless the corpus contains POSITIVELY
    SCALED copies (near-parallel distinct vectors), whose cosine can
    tie the self-cosine in the last ulp. This fixture's distinct
    cosines top out ≈0.48, far from 1; if a fixture change ever adds
    scaled duplicates, the DuckDB all-pairs twin will flag the parity
    break — treat that as this precondition failing, not a mystery.
    """
    from nipd_spark.operators import vector

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding",
        vector.l2_norm(F.col("embedding")).alias("nrm"),
    )
    # collapse exact duplicates: representative = min vec_id per
    # (label, embedding) byte-equal group
    groups = e.groupBy("label", "embedding").agg(
        F.min("vec_id").alias("rep_id")
    )
    reps = groups.select(
        F.col("rep_id").alias("vec_id"),
        "label",
        "embedding",
        vector.l2_norm(F.col("embedding")).alias("nrm"),
    )
    a, b = reps.alias("a"), reps.alias("b")
    cos = vector.cosine(
        F.col("a.embedding"), F.col("b.embedding"), F.col("a.nrm"), F.col("b.nrm")
    )
    rep_max = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(F.col("b.vec_id").alias("vec_id"), F.col("b.label").alias("label"))
        .agg(F.max(cos).alias("max_cos"))
    )
    # non-representative copies: max_cos is the self-cosine vs their
    # lower-id twin (distinct-vector cosines are strictly smaller on
    # any non-degenerate corpus; here they top out ≈ 0.48)
    members = (
        e.join(groups, ["label", "embedding"])
        .filter(F.col("vec_id") != F.col("rep_id"))
        .select(
            "vec_id",
            "label",
            vector.cosine(
                F.col("embedding"), F.col("embedding"), F.col("nrm"), F.col("nrm")
            ).alias("max_cos"),
        )
    )
    return (
        rep_max.unionByName(members)
        .filter(F.col("max_cos") >= 0.35)
        .orderBy("vec_id")
    )


@query(
    "l49_repeated_spans",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(generate_series(1, len(t) - 7)) AS pos,
             unnest(list_transform(range(1, len(t) - 6),
                    i -> list_aggregate(t[i:i+7], 'string_agg', ' '))) AS g
      FROM toks WHERE len(t) >= 8
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM hits
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM marked
    ),
    spans AS (
      SELECT doc_id, island,
             min(pos) AS s, max(pos) + 7 AS e
      FROM islands GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id,
             count(*) AS n_spans,
             max(e - s + 1) AS longest_span,
             CAST(sum(e - s + 1) AS BIGINT) AS covered_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_spans, p.longest_span, p.covered_tokens,
           len(t.t) AS n_tokens,
           CAST(p.covered_tokens AS DOUBLE) / len(t.t) AS dup_frac
    FROM per_doc p JOIN toks t USING (doc_id)
    ORDER BY p.covered_tokens DESC, p.doc_id ASC
    LIMIT 30
    """,
    tags=("L1", "L8", "W3"),
)
def l49_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication census (Lee et al., arXiv:2107.06499
    "Deduplicating Training Data Makes Language Models Better"): for
    every doc, the maximal spans covered by 8-token grams that also
    occur in ANOTHER doc — span count, longest run, covered-token
    total, and duplicated fraction; top 30 most-duplicated docs. This
    is the per-doc report the suffix-array ExactSubstr dedup produces,
    built from positional n-gram matching: consecutive duplicated gram
    starts (gap ≤ 8) merge into one island via a windowed break-flag
    cumsum.

    Scale shape (round-4): all per-text work runs ONCE PER DISTINCT
    TEXT (the representative-collapse cascade, as l23/l26/l55): a
    gram's true distinct-doc count is the group-size-weighted sum over
    representatives (identical docs have identical gram sets — exact),
    stats fan back out by digest, and grams come from the folded
    zip_with shingler (operators/text.py) instead of a slice-per-index
    transform. Gram → dup-gram reduction is one equi-keyed groupBy +
    semi-join back (same shape as decontamination l19);
    island-building is a per-doc window (sorted within partition).
    Nothing pairwise, no suffix array needed: the gram table shuffles
    once on the gram hash, sized by DISTINCT content.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    members = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("ghash")
    )
    groups = members.groupBy("ghash").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("gsize")
    )
    reps = docs.join(
        groups.select(F.col("rep_id").alias("doc_id"), "ghash", "gsize"),
        "doc_id",
    ).select("ghash", "gsize", "text")
    toks = reps.select(
        "ghash", "gsize", text.tokens(F.col("text")).alias("t")
    )
    grams = reps.select(
        "ghash",
        "gsize",
        F.posexplode(text.shingles(F.col("text"), 8)).alias("pos0", "g"),
    ).select("ghash", "gsize", (F.col("pos0") + 1).alias("pos"), "g")
    dup = (
        grams.select("ghash", "gsize", "g")
        .distinct()
        .groupBy("g")
        .agg(F.sum("gsize").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi").select("ghash", "pos")
    w = Window.partitionBy("ghash").orderBy("pos")
    marked = hits.select(
        "ghash",
        "pos",
        F.when(F.col("pos") - F.lag("pos").over(w) <= 8, 0)
        .otherwise(1)
        .alias("brk"),
    )
    islands = marked.select(
        "ghash", "pos", F.sum("brk").over(w).alias("island")
    )
    spans = islands.groupBy("ghash", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + 7).alias("e")
    )
    per_rep = spans.groupBy("ghash").agg(
        F.count("*").alias("n_spans"),
        F.max(F.col("e") - F.col("s") + 1).alias("longest_span"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("covered_tokens"),
    ).join(toks.select("ghash", F.size("t").alias("n_tokens")), "ghash")
    return (
        members.join(per_rep, "ghash")
        .select(
            "doc_id",
            "n_spans",
            "longest_span",
            "covered_tokens",
            "n_tokens",
            (F.col("covered_tokens").cast("double") / F.col("n_tokens")).alias(
                "dup_frac"
            ),
        )
        .orderBy(F.col("covered_tokens").desc(), F.col("doc_id").asc())
        .limit(30)
    )


@query(
    "l54_containment",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.a_id, i.b_id, i.n_inter,
           CAST(i.n_inter AS DOUBLE) / sa.n AS containment
    FROM inter i JOIN sizes sa ON i.a_id = sa.doc_id
    WHERE CAST(i.n_inter AS DOUBLE) / sa.n >= 0.8
    ORDER BY containment DESC, a_id ASC, b_id ASC
    """,
    tags=("L3", "L2", "J11"),
)
def l54_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment similarity (Broder 1997's asymmetric companion to
    resemblance): |A∩B| / |A| over 3-shingle sets — ≥ 0.8 means doc A
    is essentially an EXCERPT of doc B, which plain Jaccard misses
    whenever B is much longer (the union term drowns the overlap).
    The quote/boilerplate-extraction detector of a dedup pipeline;
    emitted directionally (a_id contained-in b_id).

    Scale shape: identical to the exact-Jaccard anchor — distinct
    (doc, shingle) explode, equi-join on shingle, grouped count — with
    the denominator joined from the per-doc set size; the LSH tier
    (minhash bands) generates candidates for it at 100 TB the same way
    it does for resemblance.
    """
    from nipd_spark.operators import minhash

    docs = load(spark, sf_dir, "documents")
    sh = minhash.doc_shingles(docs, 3)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("n_a"))
    return (
        inter.join(sa, "a_id")
        .select(
            "a_id",
            "b_id",
            "n_inter",
            (F.col("n_inter").cast("double") / F.col("n_a")).alias("containment"),
        )
        .filter(F.col("containment") >= 0.8)
        .orderBy(F.col("containment").desc(), F.col("a_id").asc(), F.col("b_id").asc())
    )


@query(
    "l61_prefix_filter_join",
    # Identical oracle to l3_jaccard_pairs: prefix filtering is LOSSLESS
    # (recall 1.0 by theorem, see docstring), so the qualifying pair set
    # is exactly the J >= 0.5 set the brute-force anchor emits.
    sql=_DUCK_CAND
    + """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM cand c JOIN sh a ON a.doc_id = c.u JOIN sh b ON b.doc_id = c.v
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    """,
    tags=("L3", "J1", "O4"),
)
def l61_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (AllPairs/PPJoin,
    Bayardo et al. WWW'07; Xiao et al. WWW'08) — the deterministic,
    recall-1.0 alternative to MinHash LSH for Jaccard >= t pairs.

    The brute-force anchor (l3) equi-joins on EVERY shared shingle, so a
    hot shingle held by k docs contributes O(k^2) candidate rows before
    dedup — at 100 TB a single boilerplate phrase becomes the shuffle's
    heaviest key. Prefix filtering bounds that: order shingles globally
    by ascending document frequency (rarest first, shingle text as the
    tie-break), and for each doc keep only its first
    p = |s| - ceil(t*|s|) + 1 shingles in that order. THEOREM: if
    J(a,b) >= t then |a∩b| >= t*|a∪b| >= ceil(t*|a|), and if the
    smallest-ranked common shingle sat outside a's prefix, all common
    shingles would fit in a's last ceil(t*|a|) - 1 positions — fewer
    than the overlap requires; symmetrically for b. So every qualifying
    pair shares a PREFIX shingle in both prefixes, and joining prefixes
    only is exact. Because prefixes hold each doc's RAREST shingles,
    join-key fan-out is smallest where data is hottest — boilerplate
    never becomes a join key unless a doc consists of little else.

    Verification is candidate-driven (operators/minhash.exact_jaccard's
    pairs mode): per-doc sets aggregate once, candidates probe them by
    equi-key — the same physical discipline the LSH verify stage pins.
    The whole pipeline runs inside minhash.collapse_expand, so
    byte-identical copies are collapsed to one representative before
    any shingle becomes a join key and expanded back at the end — on a
    duplicate-heavy corpus the prefix join otherwise re-inherits the
    O(k²) hot-key blow-up it exists to avoid.

    Cost vs l3 on this corpus (31-token vocabulary, so shingles are
    deliberately hot): distinct candidate pairs drop 11,533 -> 977
    (11.8x, measured at sf0.01) before verify. The df ranking pass is
    one extra groupBy over distinct (doc, shingle) — linear, map-side
    combinable.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    t = 0.5

    def prefix_pairs(sh: DataFrame) -> DataFrame:
        df_freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
        w = Window.partitionBy("doc_id").orderBy(
            F.col("df").asc(), F.col("shingle").asc()
        )
        pref = (
            sh.join(df_freq, "shingle")
            .withColumn("pos", F.row_number().over(w))
            .join(sizes, "doc_id")
            .filter(
                F.col("pos")
                <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")).cast("long") + 1
            )
            .select("doc_id", "shingle")
        )
        cand = (
            pref.alias("pa")
            .join(pref.alias("pb"), "shingle")
            .filter(F.col("pa.doc_id") < F.col("pb.doc_id"))
            .select(
                F.col("pa.doc_id").alias("a_id"),
                F.col("pb.doc_id").alias("b_id"),
            )
            .distinct()
        )
        return minhash.exact_jaccard(sh, pairs=cand).filter(
            F.col("jaccard") >= t
        )

    return minhash.collapse_expand(docs, prefix_pairs, 3)


@query(
    "l3b_lsh_recall_certificate",
    # Certificate oracle (the a4b/a15b precedent, r11 VERDICT item 6):
    # the truth DENOMINATOR — the exact count of J>=0.5 shingle pairs
    # — is recomputed independently by DuckDB's list algebra over the
    # candidate-driven equi join; the recall claim (zero missed pairs)
    # is verified Spark-side by an anti-join against the LSH output
    # and hash-compared as integers. A banding regression that starts
    # missing true pairs flips n_missed/full_recall and fails the
    # driver gate.
    sql=_DUCK_CAND
    + """
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           CAST(0 AS BIGINT) AS n_missed,
           TRUE AS full_recall
    FROM cand c JOIN sh a ON a.doc_id = c.u JOIN sh b ON b.doc_id = c.v
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    """,
    tags=("L3",),
)
def l3b_lsh_recall_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall certificate for the MinHash-banded LSH pipeline (l3b):
    the LSH candidate generation must find EVERY exact J>=0.5 pair on
    this corpus — measured full recall at sf0.001 and sf0.01 (the
    planted near-dups sit at J~0.99 where the 32-perm/8-band miss
    probability is ~1e-13 [PK: Leskovec/Rajaraman/Ullman, MMDS ch.3
    banding analysis]; the sparse J~0.5 tail is caught here too).
    l3b itself stays rows-only (cross-engine xxhash64 signatures are
    not reproducible in DuckDB); this sibling turns its accuracy
    contract into driver-hash-green evidence: n_true from the exact
    anchor, n_missed via anti-join of exact pairs against LSH pairs.

    Plan shape for 100 TB: an AUDIT query — it deliberately pays the
    exact candidate-driven Jaccard (equi join on shingle, never
    O(n²) cross) to have a denominator; both sides are equi-keyed
    shuffles, the anti-join runs on (a_id, b_id) pairs.
    """
    docs = load(spark, sf_dir, "documents")
    sh = minhash.doc_shingles(docs, 3)
    exact = minhash.exact_jaccard(sh).filter(
        F.col("jaccard") >= 0.5
    ).select("a_id", "b_id")
    found = minhash.near_dup_pairs(docs, threshold=0.5, n=3).select(
        "a_id", "b_id"
    )
    n_true = exact.agg(F.count(F.lit(1)).alias("n_true"))
    n_missed = (
        exact.join(found, ["a_id", "b_id"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    return n_true.crossJoin(n_missed).select(
        "n_true",
        "n_missed",
        (F.col("n_missed") == 0).alias("full_recall"),
    )
