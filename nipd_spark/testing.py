"""Differential-oracle test harness (SURVEY.md §5.2.1).

Mirrors the driver's gate: run a registered query on Spark and its DuckDB
twin on the same parquet corpus; compare row count + column names + an
order-insensitive canonical value comparison. Used by tools/diffcheck.py
(CLI) and tests/test_oracle_parity.py (pytest).
"""

from __future__ import annotations

import datetime
import math

import duckdb

from nipd_spark import catalog
from nipd_spark.registry import QuerySpec


def canon_cell(v) -> str:
    """Canonical string for one value; exact (no tolerance) — the driver's
    hash is exact, and the float discipline in nipd_spark.oracle makes
    both engines bit-identical."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "y:" + bytes(v).hex()
    return "s:" + str(v)


def canon_rows(cols: list[str], rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_spec(
    spark, con: duckdb.DuckDBPyConnection, spec: QuerySpec, sf_dir: str
) -> tuple[bool, str]:
    """Run one spec both ways; return (ok, detail). rows-only specs pass if
    the Spark side executes (detail notes the row count)."""
    sdf = spec.fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.sql is None:
        return True, f"rows-only: {len(srows)} rows"
    res = con.execute(spec.sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"columns spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"rowcount spark={len(srows)} duck={len(drows)}"
    cs, cd = canon_rows(scols, srows), canon_rows(dcols, drows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b]
        return False, (
            f"{len(diffs)} differing rows; first:\n"
            f"   spark: {diffs[0][0][:300]}\n   duck : {diffs[0][1][:300]}"
        )
    return True, f"{len(srows)} rows"
