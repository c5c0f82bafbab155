"""Set operations (SURVEY.md §2.7, U1-U4).

Reference realization [PK]: ``pd.concat`` / index set algebra — merging
per-sample call sets, diffing pipeline versions. The pipeline-version
regression diff composite (§2.12) is exactly U3/U4 over call sets.

Scale notes (100 TB): UNION ALL is a zero-shuffle concatenation of
partition lists; DISTINCT/INTERSECT/EXCEPT shuffle on the full row —
project to the minimal key columns first (done here) so the shuffle
carries keys, not payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.registry import query


def _callset_a(spark, sf_dir):
    """'Pipeline version A' call set: orderkeys shipped in 1996-1997."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_partkey")


def _callset_b(spark, sf_dir):
    """'Pipeline version B' call set: returned items."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_partkey")


_A_SQL = """SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'"""
_B_SQL = """SELECT l_orderkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'"""


@query(
    "u1_union_all",
    sql=f"SELECT * FROM ({_A_SQL}) UNION ALL ({_B_SQL})",
    tags=("U1",),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — pd.concat of per-sample tables (duplicates kept)."""
    return _callset_a(spark, sf_dir).unionAll(_callset_b(spark, sf_dir))


@query(
    "u2_union_distinct",
    sql=f"SELECT * FROM ({_A_SQL}) UNION ({_B_SQL})",
    tags=("U2",),
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — merged unique call set."""
    return _callset_a(spark, sf_dir).union(_callset_b(spark, sf_dir)).distinct()


@query(
    "u3_intersect",
    sql=f"SELECT * FROM ({_A_SQL}) INTERSECT ({_B_SQL})",
    tags=("U3",),
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — sites called in both versions."""
    return _callset_a(spark, sf_dir).intersect(_callset_b(spark, sf_dir))


@query(
    "u3b_intersect_all",
    sql=f"SELECT * FROM ({_A_SQL}) INTERSECT ALL ({_B_SQL})",
    tags=("U3",),
)
def u3b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiplicity-preserving variant."""
    return _callset_a(spark, sf_dir).intersectAll(_callset_b(spark, sf_dir))


@query(
    "u4_except",
    sql=f"SELECT * FROM ({_A_SQL}) EXCEPT ({_B_SQL})",
    tags=("U4",),
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — sites lost between pipeline versions (regression diff).

    ``subtract`` is EXCEPT DISTINCT (drops rows present in B at all);
    ``exceptAll().distinct()`` would instead keep rows whose A-count
    exceeds a nonzero B-count — different relation.
    """
    return _callset_a(spark, sf_dir).subtract(_callset_b(spark, sf_dir))


@query(
    "u4b_except_all",
    sql=f"SELECT * FROM ({_A_SQL}) EXCEPT ALL ({_B_SQL})",
    tags=("U4",),
)
def u4b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiplicity-preserving variant."""
    return _callset_a(spark, sf_dir).exceptAll(_callset_b(spark, sf_dir))
