"""Hypothesis property tests (SURVEY.md §5.2.4 / §7): the two custom
join algorithms' edge semantics — as-of tie-breaking and interval
boundary inclusivity — pinned against DuckDB's native ASOF JOIN and
range predicates on randomized micro-tables.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nipd_spark.operators.asof import asof_join
from nipd_spark.operators.range_join import bucketed_range_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# keys from a tiny alphabet so collisions/ties are common, not rare
_keys = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=8)


@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=12),
)
@settings(**_SETTINGS)
def test_asof_matches_duckdb_asof_join(spark, left, right):
    """Our union+window as-of == DuckDB ASOF JOIN (right_ts <= left_ts,
    latest wins; equal-ts ties included), with a unique tiebreak column
    so both engines resolve duplicate timestamps identically: DuckDB's
    ASOF picks one row per (key, ts) — we pre-reduce duplicates to the
    max-rid row on both sides, which makes the match unique."""
    lpdf = pd.DataFrame(left, columns=["k", "ts"])
    lpdf["lid"] = range(len(lpdf))
    rpdf = pd.DataFrame(right, columns=["k", "ts"])
    rpdf["rid"] = range(len(rpdf))
    # unique (k, ts) on the right: keep the max rid (deterministic)
    rpdf = rpdf.sort_values("rid").groupby(["k", "ts"], as_index=False).last()

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    got = {
        (r.lid, r.rid)
        for r in asof_join(
            ldf, rdf, key="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"], tiebreak="rid",
        )
        .select("lid", "rid")
        .collect()
    }

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    want = {
        (lid, rid)
        for lid, rid in con.execute(
            """
            SELECT l.lid, r.rid FROM l
            ASOF LEFT JOIN r ON l.k = r.k AND r.ts <= l.ts
            """
        ).fetchall()
    }
    assert got == want


@given(
    points=st.lists(st.integers(min_value=-5, max_value=15), min_size=1, max_size=10),
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=15),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=8,
    ),
    closed_hi=st.booleans(),
    width=st.sampled_from([1.0, 3.0, 7.0]),
)
@settings(**_SETTINGS)
def test_bucketed_range_join_matches_duckdb_predicate(
    spark, points, intervals, closed_hi, width
):
    """Bucketed (equi-rewritten) range join == the naive range predicate
    for every boundary case: lo == point, point == hi, empty intervals,
    negative coordinates, every bucket width."""
    ppdf = pd.DataFrame({"pos": points, "pid": range(len(points))})
    ipdf = pd.DataFrame(
        [(lo, lo + w, i) for i, (lo, w) in enumerate(intervals)],
        columns=["lo", "hi", "iid"],
    )
    pdf_s = spark.createDataFrame(ppdf)
    idf_s = spark.createDataFrame(ipdf)
    got = {
        (r.pid, r.iid)
        for r in bucketed_range_join(
            pdf_s, idf_s, "pos", "lo", "hi", width=width, closed_hi=closed_hi
        )
        .select("pid", "iid")
        .collect()
    }
    op = "<=" if closed_hi else "<"
    con = duckdb.connect()
    con.register("p", ppdf)
    con.register("i", ipdf)
    want = set(
        map(
            tuple,
            con.execute(
                f"SELECT pid, iid FROM p JOIN i ON pos >= lo AND pos {op} hi"
            ).fetchall(),
        )
    )
    assert got == want
