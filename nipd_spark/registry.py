"""Query registry backing __spark_entry__.queries() / oracle_sql().

Each SURVEY.md §2 operator lands as a registered query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle twin. The driver hash-compares the two at sf0.01; tests mirror
the same diff at sf0.001 (tools/diffcheck.py).

Discipline enforced here by convention (SURVEY.md §5.2):
  - every computed column aliased identically in Spark and SQL
  - floating aggregates rounded identically on both sides
  - ``events.ts`` compared at µs (cast ``ts::TIMESTAMP`` in DuckDB)
  - window orderings made deterministic with unique tie-breaker keys
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules under nipd_spark.queries that register queries at import time.
_QUERY_MODULES = (
    "sources",
    "relational",
    "tpch",
    "aggregates",
    "windows",
    "setops",
    "functions_scalar",
    "arrays_json",
    "text_llm",
    "dedup",
    "similarity",
    "range_asof",
    "streaming_twins",
    "streaming_live",
    "udf_surface",
    "composites",
    "multimodal",
    "cbo",
    "quality",
    "graph",
)

# Verification rotation (round 12): the driver hash-checks the FIRST
# 50 queries() entries per round. Every registered name carries a
# passing (or clean rows-only) driver row cumulatively, so the
# standing rule applies:
# (1) this round's additions first — w25/w25b (W10 v2: quantified and
# optional pattern legs), sql9/sql10 (MATCH_RECOGNIZE SQL surface,
# plain and quantified), w26/sql11 (ALL ROWS PER MATCH, operator and
# SQL spellings), l3b/l5 recall certificates (r11 VERDICT item 6 —
# LSH/IVF accuracy contracts made driver-hashable);
# (2) re-checks of queries whose implementation changed since their
# last attestation — q3 (the shuffle_hash hint returned as a
# PROFILE-SPLIT: local keeps it, scale stays SMJ — r11 VERDICT item
# 2), w24/w24b/w24c (operators/patterns.py rewritten for quantifier
# expansions; the detection lag machinery is shared), j22/j22b
# (asof nearest gained ordering-type validation), sql8 (sqlext.sql()
# now composes the MATCH_RECOGNIZE splice first). Deliberately NOT
# re-fronted: sql7 and the j21 family call qualify_sql/asof_sql
# directly — neither rewriter changed this round; l3b/l5b/l5 are
# rows-only and their new certificates carry the hash evidence;
# (3) padding with the LONGEST-unattested names: the entire r02
# cohort (12 — closing the r11 VERDICT item 5 staleness tail), then
# the r03 cohort alphabetically. The full-sweep ritual
# (tools/diffcheck.py at sf0.001 AND sf0.01) still gates every query
# every round regardless.
# Standing rule (adopted r11 after the r10 miss): a plan-affecting
# change landing AFTER the round's rotation is frozen RE-OPENS the
# rotation — the changed query moves to the head of category (2) for
# the next round if the current window can no longer cover it.
_FRONT_QUERIES: tuple[str, ...] = (
    # (1) round-12 additions (w27/w27b/sql12/w28/sql13 and the w24c
    # oracle landed after the first r12 rotation cut — rotation
    # RE-OPENED per the standing rule and the front re-cut to cover
    # them; f2/f3/f4, d5-d9 and f1 displaced to r13)
    "w28_pattern_overlapping",
    "sql13_match_recognize_skip_to_next",
    "sql14_recursive_cte",
    "w26b_pattern_all_rows_wshape",
    "w29_pattern_skip_to_first",
    "sql15_match_recognize_optional_group",
    "w27_pattern_alternation",
    "w27b_pattern_permute",
    "sql12_match_recognize_alternation",
    "w25_pattern_quantified",
    "w25b_pattern_optional",
    "sql9_match_recognize",
    "sql10_match_recognize_quantified",
    "w26_pattern_all_rows",
    "sql11_match_recognize_all_rows",
    "l3b_lsh_recall_certificate",
    "l5_recall_certificate",
    # (2) changed since last attestation (q5/c20/l73 re-shaped in the
    # r12 OPTIMIZATION pass — join reorder / rank-map rewrite / postings
    # pre-filter; results oracle-identical but plan-affecting, so they
    # displace the last three r03-cohort padders d2/d3/d4 to r13)
    "q3_shipping_priority",
    "q5_local_supplier",
    "c20_rfm_segmentation",
    "l73_phrase_search",
    "w24_pattern_vshape",
    "w24b_pattern_dip_stabilize_recover",
    "w24c_pattern_wshape",
    "j22_asof_nearest",
    "j22b_asof_nearest_sql",
    "sql8_asof_qualify",
    # (3) longest-unattested padding: the whole r02 cohort...
    "l5b_ann_ivf",
    "l6_token_tf",
    "l7_tfidf",
    "l8_ngrams",
    "l9_doc_stats",
    "l9b_quality_score",
    "q12_late_lines",
    "q21_suppliers_waiting",
    "q22_sales_opportunity",
    "w1_rank_family",
    "w3_cumsum",
    "w4_moving_avg",
    # ...then the r03 cohort, alphabetical (f2-f6 displaced to r13 by
    # the w26/sql11 and w27/w27b/sql12 additions)
    "c1_sprt_rhdo",
    "c2_zscore_screen",
    "c3_fetal_fraction",
    "c4_coverage_qc",
    "c5_version_diff",
    "c6_rmd",
    "c7_funnel",
    "c8_lexical_semantic",
    "cbo1_stats_join_reorder",
    "cbo2_filter_cardinality",
    "d1_scalar_udf",
)
_MODULE_PRIORITY: tuple[str, ...] = (
    # deferred never-checked b-variants surface right after the front list
    "setops",
    "arrays_json",
    "range_asof",
    "streaming_twins",
    "multimodal",
    "composites",
    "windows",
    "udf_surface",
    "streaming_live",
    "cbo",
    "functions_scalar",
    "text_llm",
    "dedup",
    "similarity",
    "aggregates",
    "sources",
    "relational",
    "tpch",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle twin; None → driver's rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def query(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register fn as a queries() entry (and its oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, sql, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def _ensure_loaded() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(f"nipd_spark.queries.{mod}")
        _LOADED = True


def _order_key(item: tuple[str, QuerySpec]) -> tuple[int, int, int]:
    """Sort key implementing the verification rotation above.

    (front-list position, module priority, registration order) — stable
    within a module, so per-module query order is unchanged.
    """
    name, spec = item
    front = _FRONT_QUERIES.index(name) if name in _FRONT_QUERIES else len(
        _FRONT_QUERIES
    )
    mod = spec.fn.__module__.rsplit(".", 1)[-1]
    mod_rank = (
        _MODULE_PRIORITY.index(mod)
        if mod in _MODULE_PRIORITY
        else len(_MODULE_PRIORITY)
    )
    reg_rank = list(_REGISTRY).index(name)
    return (front, mod_rank, reg_rank)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(sorted(_REGISTRY.items(), key=_order_key))


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in all_specs().items() if spec.sql is not None
    }
