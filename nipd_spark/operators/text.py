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

    Built by folding n-1 ``zip_with``s of the token array against its
    k-shifted tails (each element concatenates with its successor) —
    one cheap lambda per output element. The earlier form
    (``transform(sequence(...), i -> concat_ws(slice(toks, i, n)))``)
    copied an n-slice per shingle inside an interpreted higher-order
    function and measured 5-8× slower on the 16× corpus (scale probe);
    both forms produce the identical array. Trailing partial grams
    (zip_with null-pads the shorter side; concat_ws skips nulls) are
    cut by the final slice, and the k ≥ 1 guard keeps short docs empty.
    """
    toks = tokens(text)
    sz = F.size(toks)
    acc = toks
    for j in range(1, n):
        # pair each element with its j-th successor; greatest(sz,1)
        # keeps the slice length argument positive on empty docs
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, F.greatest(sz, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    k = sz - (n - 1)
    return F.when(k >= 1, F.slice(acc, 1, k)).otherwise(
        F.array().cast("array<string>")
    )
