"""UDF / UDAF / UDTF surface (SURVEY.md §2.11 D1-D8).

One exemplar per escape-hatch tier, each with a SQL-recomputable oracle
where the function is deterministic. Preference order documented in
§4.3: built-ins → pandas UDF (Arrow) → row UDF (last resort). D4/D5
grouped forms are the reference's ``groupby().apply`` idiom [PK].
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nipd_spark.catalog import load
from nipd_spark.oracle import dround
from nipd_spark.registry import query


@query(
    "d1_scalar_udf",
    sql="""
    SELECT c_custkey, CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS parsed_id
    FROM customer
    """,
    tags=("D1",),
)
def d1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (documented slow path: per-row serde,
    no vectorization — D2 is the same logic 10-100× faster)."""

    @F.udf(T.LongType())
    def parse_id(name: str) -> int:
        return int(name.rsplit("#", 1)[1])

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", parse_id("c_name").alias("parsed_id"))


@query(
    "d2_pandas_udf",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
    tags=("D2",),
)
def d2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow-batched): numpy elementwise IEEE ops
    are bit-identical to the SQL expression — the oracle proves it."""

    @F.pandas_udf(T.DoubleType())
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "d3_iterator_udf",
    sql=f"""
    SELECT event_id, {dround("value * 1.1 + 42.0", 6)} AS scored
    FROM events
    """,
    tags=("D3",),
)
def d3_iterator_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator pandas UDF — the heavy-init form: the 'model' loads once
    per worker, then streams Arrow batches (SURVEY.md §2.11 D3)."""

    @F.pandas_udf(T.DoubleType())
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model_scale, model_bias = 1.1, 42.0  # expensive init happens once here
        for s in batches:
            yield (s * model_scale + model_bias).round(6)

    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", score("value").alias("scored"))


@query(
    "d4_grouped_zscore",
    sql=f"""
    SELECT event_id,
           {dround("(value - avg(value) OVER (PARTITION BY event_type)) / stddev_samp(value) OVER (PARTITION BY event_type)", 6)}
             AS z
    FROM events
    """,
    tags=("D4",),
)
def d4_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas — the reference's groupby().apply idiom
    verbatim; oracle = the W8 window spelling (pandas std is ddof=1 =
    stddev_samp)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        z = (pdf["value"] - pdf["value"].mean()) / pdf["value"].std(ddof=1)
        return pd.DataFrame({"event_id": pdf["event_id"], "z": z.round(6)})

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(zscore, "event_id long, z double")


@query(
    "d5_grouped_agg_udf",
    sql=f"""
    SELECT event_type, {dround("avg(value * value)", 6)} AS mean_sq
    FROM events GROUP BY event_type
    """,
    tags=("D5",),
)
def d5_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: custom scalar per group usable in agg()
    (and over windows)."""

    @F.pandas_udf(T.DoubleType())
    def mean_sq(v: pd.Series) -> float:
        return float((v * v).mean())

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(mean_sq("value"), 6).alias("mean_sq")
    )


@query(
    "d6_mapinpandas",
    sql="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
           length(props) AS props_len
    FROM events
    """,
    tags=("D6",),
)
def d6_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas whole-partition transform — the VCF-block-parser shape
    (S4's imperative cousin): arbitrary per-batch Python with Arrow I/O."""
    import json

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "k": pdf["props"].map(lambda s: json.loads(s)["k"]).astype("int32"),
                    "props_len": pdf["props"].str.len().astype("int64"),
                }
            )

    ev = load(spark, sf_dir, "events").select("event_id", "props")
    return ev.mapInPandas(parse, "event_id long, k int, props_len long")


@query(
    "d7_udtf",
    sql="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS idx,
           unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 20
    """,
    tags=("D7",),
)
def d7_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥3.5): one row in → many rows out (tokenizer
    with positions — the interval-splitter shape)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("_d7_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT d.doc_id, t.idx, t.token
        FROM _d7_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )


@query(
    "d8_cogrouped",
    sql=f"""
    WITH o AS (SELECT o_custkey, count(*) AS n_orders,
                      {dround("sum(o_totalprice)")} AS total_spent
               FROM orders GROUP BY o_custkey)
    SELECT c_custkey, c_acctbal,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(total_spent, 0.0) AS total_spent
    FROM customer LEFT JOIN o ON c_custkey = o_custkey
    """,
    tags=("D8",),
)
def d8_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: trio-style pairwise group processing —
    each (customer-group, orders-group) pair merged in pandas."""

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                columns=["c_custkey", "c_acctbal", "n_orders", "total_spent"]
            )
        return pd.DataFrame(
            {
                "c_custkey": left["c_custkey"].iloc[:1],
                "c_acctbal": left["c_acctbal"].iloc[:1],
                "n_orders": [len(right)],
                "total_spent": [
                    round(float(right["o_totalprice"].sum()), 4) if len(right) else 0.0
                ],
            }
        )

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            merge, "c_custkey long, c_acctbal double, n_orders long, total_spent double"
        )
    )


@query(
    "d9_pandas_api",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dround("sum(l_quantity)")} AS sum_qty,
           {dround("avg(l_extendedprice)")} AS avg_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("D4", "A1"),
)
def d9_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-on-Spark (pyspark.pandas): the reference's analysis layer
    IS pandas (SURVEY.md §1.1), and this API is the verbatim migration
    path — `read_parquet → groupby → named agg`, unchanged pandas
    spelling, executing as the same Catalyst plan every other query
    uses (`to_spark()` at the boundary, where the engine's rounding
    discipline applies).

    Scale note: ps defaults to an index; none is materialized here
    (groupby keys come back as columns via reset_index) so no global
    sequence/zip — the one ps pitfall that would not survive 100 TB."""
    import pyspark.pandas as ps

    psdf = ps.read_parquet(f"{sf_dir}/lineitem.parquet")
    out = (
        psdf.groupby(["l_returnflag", "l_linestatus"])
        .agg(
            sum_qty=("l_quantity", "sum"),
            avg_price=("l_extendedprice", "mean"),
            n=("l_orderkey", "count"),
        )
        .reset_index()
    )
    sdf = out.to_spark()
    return sdf.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 4).alias("sum_qty"),
        F.round("avg_price", 4).alias("avg_price"),
        F.col("n").cast("long").alias("n"),
    )


@query(
    "d10_sql_udf",
    sql=f"""
    SELECT l_returnflag,
           {dround("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))")}
             AS total_charge
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("D1", "A1"),
)
def d10_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr):
    the business formula is named once and reused like a builtin —
    and because the body is a SQL expression, Catalyst INLINES it into
    the calling plan (full codegen, pushdown through it), which no
    Python UDF (d1) can offer. The oracle twin is the inlined
    expression itself, proving the indirection costs nothing
    semantically.
    """
    from nipd_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge(
          price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS DOUBLE
        RETURN price * (1 - disc) * (1 + tax)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(charge(l_extendedprice, l_discount, l_tax)), 4)
                 AS total_charge
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "d11_arrow_udf",
    sql=f"""
    SELECT l_returnflag,
           {dround("sum(CASE WHEN l_quantity > 25 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)")}
             AS bulk_revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("D1", "D2"),
)
def d11_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``):
    same per-row Python signature as d1's pickled UDF, but arguments
    and results move as Arrow batches — the drop-in ~2-5x serialization
    win when a row-logic UDF can't be vectorized into a pandas UDF
    (d2) outright. Still the slow path vs builtins: keep it OFF the
    hot aggregates (plan shows ArrowEvalPython, which the headline
    queries' guard forbids) — this exists to cover the migration
    ladder d1 → d11 → d2 → builtin.
    """
    from pyspark.sql.types import DoubleType

    @F.udf(returnType=DoubleType(), useArrow=True)
    def bulk_rev(qty: float, price: float, disc: float) -> float:
        return price * (1.0 - disc) if qty > 25 else 0.0

    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            bulk_rev("l_quantity", "l_extendedprice", "l_discount").alias("r"),
        )
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("r"), 4).alias("bulk_revenue"))
        .orderBy("l_returnflag")
    )


@query(
    "d12_udtf_analyze",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    SELECT doc_id,
           tk[1] AS c0, tk[2] AS c1, tk[3] AS c2, tk[4] AS c3
    FROM t
    ORDER BY doc_id
    """,
    tags=("D7", "F5"),
)
def d12_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF (Spark 4 ``analyze``): the function's OUTPUT
    SCHEMA is computed at plan time from its arguments — here
    ``lead_tokens(4, text)`` materializes 4 leading-token columns, and
    changing the literal re-shapes the relation without touching the
    class. This is the table-function contract warehouse UDTFs
    (SPLIT_TO_TABLE, INFER_SCHEMA) are built on; the static-schema
    UDTF (d7) cannot express it. The oracle twin is plain array
    indexing, so the exotic surface is held to ordinary relational
    semantics.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadTokens:
        @staticmethod
        def analyze(
            doc_id: AnalyzeArgument, n: AnalyzeArgument, s: AnalyzeArgument
        ) -> AnalyzeResult:
            schema = StructType().add("doc_id", "long")
            for i in range(n.value):
                schema = schema.add(f"c{i}", "string")
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, n: int, s: str):
            parts = s.split(" ")
            yield (doc_id, *[
                (parts[i] if i < len(parts) else None) for i in range(n)
            ])

    from nipd_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("lead_tokens", LeadTokens)
    return spark.sql(
        """
        SELECT t.* FROM documents d,
               LATERAL lead_tokens(d.doc_id, 4, d.text) t
        ORDER BY t.doc_id
        """
    )
