"""Replay harness: drive the `events` table through a real streaming
query synchronously (SURVEY.md §5.2.5).

The parquet file source replays events in file order; a memory sink +
``processAllAvailable()`` runs the micro-batch loop to completion, so a
queries() entry can return a fully-materialized result DataFrame from a
genuine StreamExecution (watermarks, state store and all).

``events.ts`` is ns-precision parquet; like the batch loader
(catalog.load), the stream source reads it as long (schema below) and
converts to µs TimestampType.

Scale notes (100 TB / production): swap the file source for Kafka and
the memory sink for foreachBatch/parquet — the query body is unchanged.
State stores default to HDFS-backed here; RocksDB
(spark.sql.streaming.stateStore.providerClass) for big keyed state.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns epoch (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _stage_dir(sf_dir: str, parts: int = 1) -> str:
    """The parquet file source requires a *directory*; testdata is a flat
    read-only file. Stage a /tmp dir (idempotent): a symlink for parts=1,
    or the file split into ``parts`` chunk files so maxFilesPerTrigger=1
    yields a real multi-micro-batch replay for stateful operators."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    tag = hashlib.sha1(f"{sf_dir}|{parts}".encode()).hexdigest()[:10]
    d = f"/tmp/nipd_stream_{tag}"
    src = f"{sf_dir}/events.parquet"
    if parts == 1:
        os.makedirs(d, exist_ok=True)
        link = f"{d}/events.parquet"
        if not os.path.exists(link):
            os.symlink(src, link)
        return d
    done = f"{d}/.staged"
    if not os.path.exists(done):
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(src)
        step = (t.num_rows + parts - 1) // parts
        for i in range(parts):
            pq.write_table(t.slice(i * step, step), f"{d}/part{i:04d}.parquet")
        open(done, "w").close()
    return d


def events_stream(
    spark: SparkSession, sf_dir: str, parts: int = 1, one_file_per_trigger: bool = False
) -> DataFrame:
    """events as an unbounded table (S7 streaming source)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA).format("parquet")
    if one_file_per_trigger:
        reader = reader.option("maxFilesPerTrigger", 1)
    raw = reader.load(_stage_dir(sf_dir, parts))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_completion(
    streaming_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming aggregation until the source drains; return the
    materialized result table (S8 memory sink)."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = streaming_df.sparkSession
    return spark.table(name)
