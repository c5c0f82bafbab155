"""Reusable custom operators (SURVEY.md §4.3) — compositions of built-in
DataFrame ops; no custom Catalyst rules needed (we control query
construction).

This package is the user-facing operator API: everything a caller needs
beyond stock pyspark.sql is importable from here directly, e.g.::

    from nipd_spark.operators import asof_join, bucketed_range_join
    from nipd_spark.operators import near_dup_pairs, connected_components
"""

from nipd_spark.operators.asof import asof_join
from nipd_spark.operators.components import connected_components
from nipd_spark.operators.ivf import assign as ivf_assign
from nipd_spark.operators.ivf import search as ivf_search
from nipd_spark.operators.ivf import train_centroids as ivf_train_centroids
from nipd_spark.operators.knn import top_pairs_gemm, topk_per_query_gemm
from nipd_spark.operators.materialize import spill_checkpoint
from nipd_spark.operators.merge import merge_into
from nipd_spark.operators.minhash import near_dup_pairs
from nipd_spark.operators.snapshots import (
    read_snapshot,
    vacuum,
    write_snapshot,
)
from nipd_spark.operators.range_join import bucketed_range_join

# aliased: the bare name `simhash` must stay the submodule, not the fn
from nipd_spark.operators.simhash import simhash as simhash_signatures
from nipd_spark.operators import simhash  # noqa: F401  (restore submodule)
from nipd_spark.operators.vector import cosine, dot, l2_norm

__all__ = [
    "asof_join",
    "bucketed_range_join",
    "connected_components",
    "cosine",
    "dot",
    "ivf_assign",
    "ivf_search",
    "ivf_train_centroids",
    "l2_norm",
    "merge_into",
    "near_dup_pairs",
    "read_snapshot",
    "simhash_signatures",
    "spill_checkpoint",
    "top_pairs_gemm",
    "topk_per_query_gemm",
    "vacuum",
    "write_snapshot",
]
