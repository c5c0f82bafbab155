"""nipd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference (AWGL/NIPD; see SURVEY.md).

The reference checkout contains only ``README.md`` ("# NIPD",
/root/reference/README.md:1) — all semantics here are reconstructed from
public knowledge per SURVEY.md §0 and re-expressed Spark-first.

Layout:
    session.py    SparkSession factory (UTC / ANSI / Arrow / AQE discipline)
    catalog.py    test-corpus table loading + temp-view registration
    registry.py   query registry powering __spark_entry__.queries()/oracle_sql()
    sqlext.py     SQL-text extensions (ASOF JOIN keyword → as-of operator)
    queries/      one module per SURVEY.md §2 operator family
    operators/    reusable custom operators (range join, as-of, minhash, knn …)
    streaming/    structured-streaming harness + stateful exemplars
"""

__version__ = "0.1.0"
