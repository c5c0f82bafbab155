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

# Verification rotation (round 3): the driver hash-checks the FIRST 50
# queries() entries per round (CORRECTNESS_r01/r02 == the exact prefix).
# Rounds 1-2 verified sources/relational/tpch + the LLM stack +
# aggregates/windows(w1-w4); 57 queries have never had a driver row
# (VERDICT.md r2 item 3). This front list is exactly the 50 of those 57
# that fit the window: composites and w5-w9 first (VERDICT item 8), then
# streaming twins, range/as-of joins, set ops, scalar/array/JSON function
# families, the UDF surface, multimodal, live streaming, and CBO. The 7
# deferred are the six b-variants whose operator ID is already covered by
# their base query inside the window (u3b/u4b/f5b/f7b/j9b/t3b) plus
# rows-only l10b — they land right after the front list for round 4,
# together with every round-3 addition (all sf0.01-verified repo-side,
# VERIFY_r03.txt): the early batch (l23-l27, l16b, s9, s10, j12, c9)
# plus the late batch (j15, a17, a17b, a18-a21, w13, w14, c13-c16,
# dq2, l31-l37, g2, g3, o5, p8, p9, t11-t14, sql3, sql4, s15, s16,
# f13-f16, d10). Round 4 front list should draw from those ~50
# never-driver-checked names (oracle-twinned first), then a re-check
# rotation of the oldest r1 rows. Round-3 additions (all sf0.01-verified
# repo-side before commit): l46_semdedup, l47_balanced_shards,
# l48_dsir_importance, l49_repeated_spans, dq7_observe_metrics
# (oracle-twinned) and a30_tdigest_quantiles (rows-only,
# property-tested) — include them in the round-4 window too.
_FRONT_QUERIES: tuple[str, ...] = (
    # composites (SURVEY §2.12 — genomics heart: c1/c6)
    "c1_sprt_rhdo",
    "c2_zscore_screen",
    "c3_fetal_fraction",
    "c4_coverage_qc",
    "c5_version_diff",
    "c6_rmd",
    "c7_funnel",
    "c8_lexical_semantic",
    # windows w5-w9 (never-checked half of the window family)
    "w5_range_frame",
    "w6_first_last",
    "w7_pct_rank_cume",
    "w8_zscore",
    "w9_threshold_crossing",
    # streaming batch twins
    "t1_tumbling_hourly",
    "t2_sliding_window",
    "t3_session_window",
    # range / as-of joins
    "j8_range_join",
    "j9_asof_join",
    # set operations
    "u1_union_all",
    "u2_union_distinct",
    "u3_intersect",
    "u4_except",
    # scalar function families
    "f1_string_funcs",
    "f2_datetime_funcs",
    "f3_math_funcs",
    "f4_case_ladder",
    "f8_casts",
    # array / map / JSON families
    "f5_array_ops",
    "f6_map_ops",
    "f7_json_extract",
    # UDF surface (d1-d9)
    "d1_scalar_udf",
    "d2_pandas_udf",
    "d3_iterator_udf",
    "d4_grouped_zscore",
    "d5_grouped_agg_udf",
    "d6_mapinpandas",
    "d7_udtf",
    "d8_cogrouped",
    "d9_pandas_api",
    # multimodal plumbing
    "l10_multimodal_decode",
    "l10c_frame_sample",
    # live streaming (readStream harness)
    "t4_stream_tumbling_watermark",
    "t5_stream_dedup",
    "t6_stream_static_join",
    "t7_stream_session_window",
    "t7b_stream_stream_join",
    "t8_stateful_user_tracker",
    "t9_stream_parquet_sink",
    # cost-based-optimization demos
    "cbo1_stats_join_reorder",
    "cbo2_filter_cardinality",
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
