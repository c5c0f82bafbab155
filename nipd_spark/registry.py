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


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in all_specs().items() if spec.sql is not None
    }
