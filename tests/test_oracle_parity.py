"""Differential-oracle parity for every registered query (SURVEY.md §5.2.1).

Mirrors the driver's sf0.01 gate at sf0.001: row count + schema +
order-insensitive canonical values vs the DuckDB twin.
"""

from __future__ import annotations

import pytest

from nipd_spark import registry
from nipd_spark.testing import compare_spec

SPECS = registry.all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    ok, detail = compare_spec(spark, duck, SPECS[name], sf_dir)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_unique_name():
    assert len(SPECS) == len(set(SPECS))


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
