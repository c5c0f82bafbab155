"""SimHash near-duplicate fingerprints (Charikar 2002; SURVEY.md §2.9 L3).

64-bit SimHash per document from token hashes: bit j of the fingerprint
is the sign of Σ_tokens (±1 by token-hash bit j). Near-dups = fingerprints
within a small Hamming distance, found by the pigeonhole band trick
(split 64 bits into B bands; distance ≤ B-1 pairs must agree on ≥1 band
→ equi-join per band, no cross product).

All DataFrame built-ins: xxhash64 + bitwise ops + groupBy; rows-only for
the oracle (xxhash64 not reproducible in DuckDB) — property tests anchor
it to exact shingle Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 64
# 16 bands x 4 bits: pigeonhole-complete for Hamming <= 15. Near-dup docs
# at shingle-Jaccard ~0.9 land at Hamming ~6 (theta/pi * 64), so the
# usable threshold is ~10 - a 4-band split (guarantee <= 3) misses them.
N_BANDS = 16
BAND_BITS = N_BITS // N_BANDS


def simhash(doc_tokens: DataFrame) -> DataFrame:
    """(doc_id, token)* → (doc_id, simhash long). Bit j = sign of the sum
    of ±1 contributions from each distinct token's hash bit j."""
    h = doc_tokens.select("doc_id", F.xxhash64("token").alias("h"))
    contribs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"s{j}")
        for j in range(N_BITS)
    ]
    agg = h.groupBy("doc_id").agg(*contribs)
    sig = F.lit(0).cast("long")
    for j in range(N_BITS):
        # bit 63 is the sign bit of a signed long
        weight = (1 << j) if j < 63 else -(1 << 63)
        sig = sig + F.when(F.col(f"s{j}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("doc_id", sig.alias("simhash"))


def hamming(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def near_pairs(
    sigs: DataFrame,
    max_hamming: int = 10,
    n_bands: int = N_BANDS,
    band_bits: int = BAND_BITS,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via banded equi-join.
    Requires max_hamming ≤ n_bands-1 for completeness (pigeonhole).
    n_bands × band_bits must cover the fingerprint's live bits EXACTLY:
    banding past them makes every pair share the all-zero high bands —
    a full cross product (the reason these are parameters, not the
    64-bit module constants, for narrower hashes like l10d's 32-bit
    block fingerprint)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    keyed = sigs.select(
        "doc_id", "simhash", F.explode(bands).alias("bk")
    ).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    a, b = keyed.alias("ha"), keyed.alias("hb")
    cand = (
        a.join(
            b,
            (F.col("ha.band") == F.col("hb.band"))
            & (F.col("ha.bkey") == F.col("hb.bkey"))
            & (F.col("ha.doc_id") < F.col("hb.doc_id")),
        )
        .select(
            F.col("ha.doc_id").alias("a_id"),
            F.col("hb.doc_id").alias("b_id"),
            F.col("ha.simhash").alias("sa"),
            F.col("hb.simhash").alias("sb"),
        )
        .distinct()
    )
    return cand.select(
        "a_id", "b_id", hamming(F.col("sa"), F.col("sb")).alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
