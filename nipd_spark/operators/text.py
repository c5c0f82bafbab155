"""Text primitives for the LLM-data-pipeline operators (SURVEY.md §2.9).

Tokenization is a plain split on single spaces — the corpus is
space-separated lowercase tokens (FIXTURES.md documents.text). All ops
stay JVM-side (split/explode/higher-order fns); no Python in the path.

Scale notes (100 TB): explode multiplies rows by tokens-per-doc (~50×)
— always project to (doc_id, token) before exploding so the shuffle
carries two narrow columns; distinct-token sets per doc are the unit
for Jaccard/minhash work downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def doc_tokens(docs: DataFrame, distinct: bool = False) -> DataFrame:
    """(doc_id, token) long format; optionally the distinct token set."""
    t = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    return t.distinct() if distinct else t


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>; empty when < n tokens.

    sequence(1, k) would count DOWN for k ≤ 0 (Spark sequence is
    bidirectional), so the guard clamps to an empty array first.
    """
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
