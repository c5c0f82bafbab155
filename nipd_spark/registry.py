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

# Verification rotation (round 7): the driver hash-checks the FIRST 50
# queries() entries per round. Cumulative driver coverage after r6 is
# 249/330 names; the front list continues rotating to never-checked
# queries (81 remain) until every name carries a driver row — the
# full-sweep ritual (tools/diffcheck.py at sf0.001 AND sf0.01) still
# gates every query every round regardless.
# Round-7 front: this round's additions first (l62 BM25 retrieval,
# l63 HRW shard rebalance, l64 systematic token sampling, l65 RRF
# hybrid retrieval + l65b IVF-probed variant, l66 temperature mixture
# weights, l67 Kneser–Ney bigram scoring, l68 margin bitext mining,
# l10d perceptual-hash near-dup, s26 native-XML source, l31b BPE
# trainer), then the three queries whose SEMANTICS changed this round
# (t19's two-path oracle + ms-ceil timer, t20's content-keyed
# checkpoint, a17's runtime coverage certificate) so the driver
# re-verifies the changed behavior, then 36 never-checked names
# spanning every family. 81 never-checked minus the 47 consumed here
# (11 additions + 36 tail; t19/t20/a17 are RE-checks, not new) = 34
# left over (incl. the rows-only sketch/ANN set), rolling to round 8.
# All are green in the r7 full sweeps at both SFs before this
# rotation landed.
_FRONT_QUERIES: tuple[str, ...] = (
    # round-7 additions
    "l62_bm25_topk",
    "l63_hrw_shard_rebalance",
    "l64_systematic_token_sample",
    "l65_rrf_hybrid",
    "l65b_rrf_ivf",
    "l66_temperature_mixture",
    "l67_kneser_ney_logprob",
    "l68_margin_bitext",
    "l10d_perceptual_neardup",
    "s26_xml_source",
    "l31b_bpe_train",
    # round-7 semantic changes (driver re-verification)
    "t19_stateful_session_timeout",
    "t20_state_store_reader",
    "a17_heavy_hitters",
    # streaming tail (never driver-checked)
    "t10_stream_foreachbatch_upsert",
    "t11_stream_outer_join",
    "t12_incremental_availablenow",
    "t13_stateful_restart",
    "t14_python_stream_source",
    "t15_stream_multi_sink",
    "t16_update_mode_changelog",
    "t17_stream_sliding_window",
    "t18_stream_snapshot_versions",
    # sources / sinks tail
    "s9_text_source",
    "s10_binary_source",
    "s11_schema_evolution",
    "s13_compaction",
    "s14_corrupt_records",
    "s15_python_datasource",
    "s18_managed_table_ddl",
    "s19_compression_codecs",
    "s20_file_provenance",
    "s25_snapshot_retention",
    # composites tail
    "c19_seasonality_profile",
    "c21_leadtime_distribution",
    "c23_ordered_funnel",
    "c24_discount_response",
    "c25_mom_growth",
    "c27_pareto_abc",
    "c28_session_paths",
    "c29_revenue_waterfall",
    "c32_ld_r2",
    # windows tail
    "w11_gap_fill",
    "w15_nth_value_family",
    "w17_time_weighted_avg",
    "w21_ewma",
    # LLM curation tail
    "l23_repetition_filter",
    "l27_corpus_card",
    "l28_quantize_embeddings",
    "l29_domain_rebalance",
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
