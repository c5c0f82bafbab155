"""SQL-text surface for the as-of join (SURVEY.md §2.3 J9 / §4.3).

Spark SQL 4.1 has no ASOF JOIN keyword; the engine's as-of algorithm
(operators/asof.py, union+window — no pairwise blowup) was reachable
only through the DataFrame API, so a user writing raw SQL had no
spelling for it (VERDICT r8 "What's missing" #3). ``asof_sql`` closes
that gap with a documented SQL-text rewrite in the syntax Snowflake
standardized and DuckDB mirrors [PK: Snowflake "ASOF JOIN ...
MATCH_CONDITION" docs; DuckDB ASOF JOIN blog/docs]:

    SELECT ... FROM <left_view> <la>
    ASOF [LEFT] JOIN <right_view> <ra>
    MATCH_CONDITION (<x>.<ts> >= <y>.<ts>)     -- or <=
    ON <x>.<key> = <y>.<key>
    [WHERE ... GROUP BY ... ORDER BY ...]

The rewriter materializes the as-of pairing through
``operators.asof.asof_join`` (one shuffle on the key + one
in-partition sort — the same cost profile as any window, never a
range cross product), registers it as a temp view, splices the view
into the FROM clause, and rewrites ``la.x`` / ``ra.x`` column
references; everything around the join (projections, aggregates,
filters) stays ordinary Spark SQL and runs through Catalyst
unchanged.

Supported grammar (v1, deliberately narrow and loudly rejected
otherwise):
  - left/right are *named* tables/views (register subqueries as temp
    views first — the same discipline DuckDB users apply with CTEs);
  - both sides carry an explicit alias;
  - MATCH_CONDITION is a single ``>=`` (backward: latest right row at
    or before) or ``<=`` (forward: earliest right row at or after);
  - ON is a single equality; key column names may differ per side;
  - right columns surface as ``<ra>_<col>`` after the rewrite (the
    rewriter maps ``ra.col`` references automatically);
  - plain ASOF JOIN is inner (unmatched left rows dropped, the
    Snowflake/DuckDB default); ASOF LEFT JOIN keeps them with NULLs.
  - equal-(key, ts) right duplicates are broken by the largest right
    ts ordering position (operator default); pass data with unique
    (key, ts) per side for a deterministic match, as with any ASOF
    engine.

Scale notes (100 TB): the rewrite is driver-side string work on the
query TEXT only — zero data moves through Python; the spliced plan is
the same union+window physical shape j9/j9b pin in plan-quality tests.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.operators.asof import asof_join

_ASOF_RE = re.compile(
    r"""
    FROM\s+(?P<lt>\w+)\s+(?:AS\s+)?(?P<la>\w+)\s+
    ASOF\s+(?P<outer>LEFT\s+)?JOIN\s+(?P<rt>\w+)\s+(?:AS\s+)?(?P<ra>\w+)\s+
    MATCH_CONDITION\s*\(\s*
        (?P<ma>\w+)\.(?P<mats>\w+)\s*(?P<op>>=|<=)\s*
        (?P<mb>\w+)\.(?P<mbts>\w+)\s*\)\s+
    ON\s+(?P<oa>\w+)\.(?P<oak>\w+)\s*=\s*(?P<ob>\w+)\.(?P<obk>\w+)
    """,
    re.IGNORECASE | re.VERBOSE,
)

_VIEW_SEQ = itertools.count()


def _resolve(side_alias: str, la: str, ra: str, what: str) -> bool:
    """True when the alias names the LEFT side; loud error otherwise."""
    if side_alias == la:
        return True
    if side_alias == ra:
        return False
    raise ValueError(
        f"asof_sql: {what} references alias {side_alias!r}, expected "
        f"{la!r} or {ra!r}"
    )


def asof_sql(spark: SparkSession, text: str) -> DataFrame:
    """Run a Spark SQL string that may contain ASOF JOIN clauses (see
    module docstring for the grammar). Non-ASOF SQL passes through to
    ``spark.sql`` untouched."""
    while True:
        m = _ASOF_RE.search(text)
        if m is None:
            break
        la, ra = m["la"], m["ra"]
        # MATCH_CONDITION sides -> left/right timestamps + direction
        a_is_left = _resolve(m["ma"], la, ra, "MATCH_CONDITION")
        if a_is_left:
            left_ts, right_ts, left_op = m["mats"], m["mbts"], m["op"]
        else:
            # mirror: ra.ts >= la.ts  ==  la.ts <= ra.ts
            left_ts, right_ts = m["mbts"], m["mats"]
            left_op = "<=" if m["op"] == ">=" else ">="
        direction = "backward" if left_op == ">=" else "forward"
        # ON sides -> per-side key names
        if _resolve(m["oa"], la, ra, "ON"):
            lk, rk = m["oak"], m["obk"]
        else:
            lk, rk = m["obk"], m["oak"]

        left = spark.table(m["lt"])
        right = spark.table(m["rt"])
        pref = f"{ra}_"
        # rename right columns up front (collision-proof payload) and
        # surface the join key under the LEFT key's name, the contract
        # of operators.asof.asof_join
        r2 = right.select(
            F.col(rk).alias(lk),
            *[F.col(c).alias(pref + c) for c in right.columns],
        )
        joined = asof_join(
            left,
            r2,
            key=lk,
            left_ts=left_ts,
            right_ts=pref + right_ts,
            right_payload=[pref + c for c in right.columns],
            direction=direction,
        )
        if not m["outer"]:
            # inner semantics (Snowflake/DuckDB default): the carried
            # right ts is NULL exactly when no right row matched
            joined = joined.filter(F.col(pref + right_ts).isNotNull())
        view = f"__asof_{next(_VIEW_SEQ)}"
        joined.createOrReplaceTempView(view)

        rest = text[: m.start()] + f"FROM {view}" + text[m.end():]
        # qualified references: la.x -> x, ra.x -> ra_x
        rest = re.sub(rf"\b{re.escape(la)}\.(\w+)", r"\1", rest)
        rest = re.sub(rf"\b{re.escape(ra)}\.(\w+)", rf"{pref}\1", rest)
        text = rest
    return spark.sql(text)
