"""Array / map / JSON semi-structured functions (SURVEY.md §2.8 F5-F7).

Reference realization [PK]: VCF INFO/FORMAT packed strings parsed with
pandas str ops + json.loads (AD depth pairs → allele-fraction math).
Spark equivalents: higher-order array functions, str_to_map, from_json —
all JVM-side, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.oracle import dround
from nipd_spark.operators import vector
from nipd_spark.registry import query


@query(
    "f5_array_ops",
    sql=f"""
    SELECT vec_id,
           len(embedding) AS n_dims,
           sqrt({vector.duck_sq_norm('embedding')}) AS l2_norm,
           list_max(embedding) AS max_elem,
           list_min(embedding) AS min_elem,
           list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)))
             AS head8_sum,
           list_count(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
    tags=("F5",),
)
def f5_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array ops over 64-d embeddings (AD-field math analogue).

    All values bit-exact across engines (sequential double accumulation)
    — no rounding needed.
    """
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("n_dims"),
        vector.l2_norm(emb).alias("l2_norm"),
        F.array_max(emb).alias("max_elem"),
        F.array_min(emb).alias("min_elem"),
        F.aggregate(
            F.transform(F.slice(emb, 1, 8), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("head8_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "f5b_posexplode",
    sql="""
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           unnest(embedding) AS val
    FROM embeddings
    WHERE vec_id < 10
    """,
    tags=("F5",),
)
def f5b_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode to long format (0-based pos, matching Spark)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


@query(
    "f6_map_ops",
    sql="""
    SELECT event_id,
           event_type AS type_from_map,
           CAST(user_id AS VARCHAR) AS uid_from_map,
           2 AS n_keys
    FROM events
    """,
    tags=("F6",),
)
def f6_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: pack → str_to_map → element_at/map_keys (VCF
    FORMAT key→value analogue). The oracle states the expected *values*
    directly — DuckDB's MAP type isn't needed to validate extraction.
    """
    ev = load(spark, sf_dir, "events")
    packed = F.concat_ws(
        ";",
        F.concat(F.lit("type="), F.col("event_type")),
        F.concat(F.lit("uid="), F.col("user_id").cast("string")),
    )
    m = F.str_to_map(packed, F.lit(";"), F.lit("="))
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "uid").alias("uid_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "f7_json_extract",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INT) > 50 AS k_gt50
    FROM events
    """,
    tags=("F7",),
)
def f7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (both get_json_object-style
    string path and from_json struct path on the Spark side)."""
    ev = load(spark, sf_dir, "events")
    k_struct = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_struct.getField("k").alias("k_int"),
        (k_struct.getField("k") > 50).alias("k_gt50"),
    )


@query(
    "f7b_json_agg",
    sql=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
           CAST(round(CAST(CAST((avg(CAST(json_extract_string(props, '$.k') AS INT))) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS k_avg
    FROM events
    GROUP BY event_type
    """,
    tags=("F7", "A1"),
)
def f7b_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-then-aggregate over JSON props (QC-json rollup analogue)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("k_sum"),
        F.round(F.avg(k), 6).alias("k_avg"),
    )


@query(
    "f15_nested_struct_ops",
    sql="""
    WITH per_cust AS (
      SELECT o_custkey,
             list_transform(
               list(struct_pack(price := o_totalprice, okey := o_orderkey)
                    ORDER BY o_totalprice DESC, o_orderkey ASC),
               s -> s.okey) AS top_keys_raw,
             count(*) AS n_orders
      FROM orders
      GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders,
           top_keys_raw[1] AS best_order,
           top_keys_raw[least(2, len(top_keys_raw))] AS second_order
    FROM per_cust
    """,
    tags=("F5", "F6", "A8"),
)
def f15_nested_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: build array<struct> per group, sort the
    structs by a compound (-price, key) ordering key, project fields
    back out — the struct-as-sort-key idiom every "argmax with
    tie-break" in this repo leans on (min_by/max_by are the 1-element
    special case). Output is flattened to scalars so the cross-engine
    hash sees plain columns; the nested work happens in between, fully
    inside whole-stage codegen.

    Oracle nuance: Spark sorts (negated-price, key) structs with
    array_sort's element-wise struct comparison; DuckDB pins the same
    (desc price, asc key) order with list()'s ORDER BY clause — two
    spellings of one compound ordering.
    """
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("o_totalprice")).alias("nprice"),
                        F.col("o_orderkey").alias("okey"),
                    )
                )
            ),
            lambda s: s["okey"],
        ).alias("top_keys_raw"),
        F.count("*").alias("n_orders"),
    )
    return per_cust.select(
        "o_custkey",
        "n_orders",
        F.element_at("top_keys_raw", 1).alias("best_order"),
        F.element_at(
            "top_keys_raw", F.least(F.lit(2), F.size("top_keys_raw"))
        ).alias("second_order"),
    )


@query(
    "f16_variant_json",
    sql=f"""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           {dround("avg(value)", 6)} AS avg_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
    tags=("F7", "F8", "A1"),
)
def f16_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse_json once into an
    open-schema VARIANT column, then variant_get typed extraction —
    the engine-native answer to schemaless props that f7's
    get_json_object string-walks per access. VARIANT stores a parsed
    binary form, so repeated multi-path extraction costs one parse
    instead of N regex walks, and the extraction is codegen'd.
    DuckDB's JSON type plays the oracle twin via json_extract.
    """
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            (F.try_variant_get(v, "$.k", "int") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )
