"""Optional connectors (SURVEY.md §2.1 periphery): lakehouse formats and
external systems whose jars/servers are not in this container. Each is
gated behind a capability probe and raises a clear error instead of a
ClassNotFoundException deep in the JVM.

Scale notes (100 TB): production deployments pin these via
``spark.jars.packages`` (delta-spark / iceberg-spark-runtime /
spark-sql-kafka); the read/write call shapes below are complete — only
the classpath is missing here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """Raised when a connector's jars are not on the session classpath."""


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not _has_class(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable(
            "Delta Lake jars absent; add spark.jars.packages="
            "io.delta:delta-spark_2.13:<ver> and the DeltaCatalog extension"
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not _has_class(spark, "org.apache.iceberg.spark.SparkCatalog"):
        raise ConnectorUnavailable(
            "Iceberg runtime absent; add iceberg-spark-runtime and a catalog"
        )
    return spark.read.format("iceberg").load(table)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC read shape (driver jar + reachable server required).

    Scale note: always pass partitionColumn/lowerBound/upperBound/
    numPartitions for parallel extraction — the default is single-task.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    **options,
) -> DataFrame:
    """Kafka streaming source (capability-gated). ``starting_offsets``
    follows the Spark option verbatim ('earliest' | 'latest' | a JSON
    per-partition offset map); extra ``options`` pass through (e.g.
    maxOffsetsPerTrigger for rate-limited backfills at 100 TB). The
    end-to-end semantics are asserted by
    tests/test_operators_properties.py::test_kafka_roundtrip_semantics,
    which probes for the jars AND a reachable broker and skips with the
    precise missing capability otherwise."""
    if not _has_class(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    ):
        raise ConnectorUnavailable(
            "spark-sql-kafka jars absent; the production replacement for the "
            "file-based replay harness (nipd_spark/streaming/harness.py)"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_read_avro(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Avro round-trip (capability-gated): Avro ships as an EXTERNAL
    Spark module since 2.4 — present in full distributions, absent from
    the pip pyspark jar set — so probe the provider class and raise the
    deploy hint instead of the raw ClassNotFound. Avro is the row-
    oriented counterpart to parquet for Kafka-adjacent interchange;
    at 100 TB it is an ingest/export format, never the analytics
    layout (no column pruning/pushdown), which is why only the
    round-trip shape lives here. Asserted end-to-end by
    tests/test_operators_properties.py::test_avro_roundtrip_semantics
    (skip-with-reason when the module is absent, like Kafka/Delta/
    Iceberg)."""
    # A bare Class.forName probe is NOT sufficient here: pip-pyspark
    # ships some avro-source classes but not the registered DataSource
    # (lookup still fails with FAILED_TO_FIND_DATA_SOURCE) — probe the
    # actual provider resolution instead.
    try:
        df.write.format("avro").mode("overwrite").save(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        if "Failed to find data source" in str(e):
            raise ConnectorUnavailable(
                "spark-avro module absent; add spark.jars.packages="
                "org.apache.spark:spark-avro_2.13:<ver>"
            ) from e
        raise
    return spark.read.format("avro").load(path)
