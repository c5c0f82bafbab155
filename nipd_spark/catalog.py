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


def dataset_tag(sf_dir: str, salt: str = "") -> str:
    """Content-sensitive tag for /tmp staging and checkpoints: sha1 over
    the (name, size, mtime_ns) of every table file under ``sf_dir``,
    plus the path and a per-use salt.

    Keying derived state on the PATH alone is a stale-reuse hazard: if
    the data under sf_dir is regenerated in place, a path-keyed staged
    fixture or streaming checkpoint silently serves results from the
    OLD data (a restarted file source sees no new files at all). The
    stat fingerprint changes with the data, so regeneration
    auto-invalidates every derived artifact. ~10 stat calls, no reads.
    """
    import hashlib
    import os

    parts = [sf_dir, salt]
    for name in TABLES:
        p = f"{sf_dir}/{name}.parquet"
        try:
            st = os.stat(p)
            parts.append(f"{name}|{st.st_size}|{st.st_mtime_ns}")
        except FileNotFoundError:
            parts.append(f"{name}|absent")
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:12]


def _events_ts_is_ns(sf_dir: str) -> bool:
    """Sniff the events parquet footer (pyarrow, no Spark) — True when
    ``ts`` is stored as ns (either timestamp[ns] or raw int64 epoch-ns).

    The fixture generator has shipped both encodings across rounds
    (ns in r1, µs in r2), so the loader adapts per-footer instead of
    hard-coding one era's schema. Footer read is O(KB) regardless of SF.
    """
    import pyarrow.parquet as pq

    t = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    return str(t) in ("timestamp[ns]", "int64")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan (SURVEY.md §2 S1): pushdown + pruning apply.

    ``events.ts`` is schema-adaptive: when the parquet stores µs
    timestamps (current fixtures, isAdjustedToUTC=false) we disable NTZ
    inference so the scan yields TimestampType directly — the session tz
    is UTC, so values are bit-identical to the NTZ reading and predicate
    pushdown on ts is preserved (no post-scan cast). When it stores ns
    (round-1 vintage; Spark 4.1 rejects it as PARQUET_TYPE_ILLEGAL) we
    read nanos as long via the legacy conf and floor-truncate to µs
    TimestampType, matching DuckDB's ``ts::TIMESTAMP`` cast so oracle
    comparisons line up (nipd_spark.oracle.ts_us). Either way callers
    see TimestampType.
    """
    key = (id(spark), sf_dir, name)
    if key in _CACHE:
        return _CACHE[key]
    if name == "events" and _events_ts_is_ns(sf_dir):
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        if name == "events":
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all corpus tables as temp views for the SQL API path."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
