"""Test-corpus catalog: load the driver-generated parquet tables.

Tables and schemas: /root/repo/FIXTURES.md (verified from parquet footers).
At 100 TB these would be partitioned/bucketed external tables; the loader
keeps the access path identical (``spark.read.parquet``) so Catalyst's
pushdown/pruning applies the same way at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins
# (≤ 25 rows at every SF; nation/region are fixed-size).
BROADCAST_DIMS = frozenset({"region", "nation"})


# (session-id, sf_dir, table) -> DataFrame. Re-running spark.read.parquet
# per query re-reads footers and re-resolves schema (~50-100 ms/table);
# the lazy plan handle is immutable, so caching it is safe.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan (SURVEY.md §2 S1): pushdown + pruning apply.

    ``events.ts`` is ns-precision parquet (FIXTURES.md), which Spark 4.1
    rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos as long
    (legacy conf — set here, not in the session factory, because the
    driver calls queries with its own SparkSession) and floor-truncate
    to µs TimestampType, matching DuckDB's ``ts::TIMESTAMP`` cast so
    oracle comparisons line up (nipd_spark.oracle.ts_us).
    """
    key = (id(spark), sf_dir, name)
    if key in _CACHE:
        return _CACHE[key]
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _CACHE[key] = df
    return df


def load_events_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` left as the raw ns-epoch long (no per-row
    timestamp conversion).

    For aggregations whose grouping key is an epoch-aligned time bucket
    (tumbling windows), the bucket can be computed in long arithmetic and
    converted to TimestampType *after* the aggregation — rows-many casts
    become groups-many casts. At 100 TB that saves one vectorized
    projection over the fact table per query; at bench SF it is ~25% of
    the events-hourly wall time.
    """
    key = (id(spark), sf_dir, "events_ns")
    if key in _CACHE:
        return _CACHE[key]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    _CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all corpus tables as temp views for the SQL API path."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
