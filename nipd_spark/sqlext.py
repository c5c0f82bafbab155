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
    MATCH_CONDITION (<x>.<ts> >= <y>.<ts> [AND <residual bound>])
    { ON <x>.<k> = <y>.<k> [AND <x>.<k2> = <y>.<k2> ...]
    | USING (<k> [, <k2> ...]) }
    [WHERE ... GROUP BY ... ORDER BY ...]

The rewriter materializes the as-of pairing through
``operators.asof.asof_join`` (one shuffle on the key(s) + one
in-partition sort — the same cost profile as any window, never a
range cross product), registers it as a temp view, splices the view
into the FROM clause, and rewrites ``la.x`` / ``ra.x`` column
references; everything around the join (projections, aggregates,
filters) stays ordinary Spark SQL and runs through Catalyst
unchanged.

Supported grammar (v2, deliberately explicit and loudly rejected
otherwise):
  - left/right are *named* tables/views (register subqueries as temp
    views first — the same discipline DuckDB users apply with CTEs);
  - both sides carry an explicit alias (matched case-insensitively,
    like SQL identifiers);
  - MATCH_CONDITION's FIRST conjunct is the as-of comparison: a single
    ``>=`` (backward: latest right row at or before) or ``<=``
    (forward: earliest right row at or after), with the two sides
    resolving to DIFFERENT table aliases — or, as a documented
    extension beyond the Snowflake/DuckDB grammar,
    ``NEAREST(<a>.<ts>, <b>.<ts>)``: pandas
    merge_asof(direction='nearest') semantics, the candidate
    minimizing the absolute gap over both directions with exact ties
    preferring the backward (at-or-before) row;
  - optional further MATCH_CONDITION conjuncts form a *residual bound*
    — any Spark SQL boolean expression over the two aliases (e.g.
    ``unix_micros(l.ts) - unix_micros(r.ts) <= 3600000000`` or
    ``l.ts <= r.ts + INTERVAL 1 HOUR``). Semantics are
    match-then-filter, the standard bounded-as-of reading: the as-of
    comparison picks the single nearest row, then the bound is
    applied (inner: row dropped; LEFT: match nulled out). Because the
    nearest match minimizes the gap, a monotone gap bound filtered
    after matching equals matching under the bound;
  - ON takes one or more ``=`` equalities joined by AND; each equality
    must reference both aliases (key column names may differ per
    side). USING (k, ...) is the same-name shorthand. A trailing
    non-equality conjunct after the ON equalities (DuckDB's
    ``ON a.k = b.k AND a.ts >= b.ts`` spelling) is rejected loudly —
    the as-of comparison and residual bounds belong in
    MATCH_CONDITION;
  - right columns surface as ``<ra>_<col>`` after the rewrite (the
    rewriter maps ``ra.col`` references automatically; literals inside
    single-quoted strings are left untouched);
  - plain ASOF JOIN is inner (unmatched left rows dropped, the
    Snowflake/DuckDB default); ASOF LEFT JOIN keeps them with NULLs;
  - SQL NULL semantics: right rows with a NULL match key or NULL
    timestamp never match (they are filtered before the join), and a
    left row with a NULL key/timestamp matches nothing (inner: dropped;
    LEFT: kept with an all-NULL right payload). Equality keys behave
    this way in every engine; for the ORDERING column this is the
    strict Snowflake-style rule — DuckDB 1.0 instead inherits its
    sort order there (a NULL timestamp sorts last and can carry a
    match; measured, see tests/test_hypothesis_edges.py's v2 fuzz,
    which normalizes the oracle accordingly);
  - equal-(key, ts) right duplicates are broken by the largest right
    ts ordering position (operator default); pass data with unique
    (key, ts) per side for a deterministic match, as with any ASOF
    engine.

Scale notes (100 TB): the rewrite is driver-side string work on the
query TEXT only — zero data moves through Python; the spliced plan is
the same union+window physical shape j9/j9b pin in plan-quality tests,
and the residual bound is a post-window Catalyst filter/projection.
"""

from __future__ import annotations

import itertools
import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.operators.asof import asof_join

_HEAD_RE = re.compile(
    r"""
    FROM\s+(?P<lt>\w+)\s+(?:AS\s+)?(?P<la>\w+)\s+
    ASOF\s+(?P<outer>LEFT\s+)?JOIN\s+(?P<rt>\w+)\s+(?:AS\s+)?(?P<ra>\w+)\s+
    MATCH_CONDITION\s*\(
    """,
    re.IGNORECASE | re.VERBOSE,
)
_PRIMARY_RE = re.compile(
    r"^\s*(?P<ma>\w+)\.(?P<mats>\w+)\s*(?P<op>>=|<=)\s*"
    r"(?P<mb>\w+)\.(?P<mbts>\w+)\s*(?:$|AND\s+(?P<resid>.+))",
    re.IGNORECASE | re.DOTALL,
)
# grammar extension beyond Snowflake/DuckDB (documented, loudly scoped):
# MATCH_CONDITION (NEAREST(<a>.<ts>, <b>.<ts>) [AND <residual bound>])
# — pandas merge_asof(direction='nearest') semantics: the candidate
# minimizing |gap| over both directions, exact ties preferring backward.
_NEAREST_RE = re.compile(
    r"^\s*NEAREST\s*\(\s*(?P<ma>\w+)\.(?P<mats>\w+)\s*,\s*"
    r"(?P<mb>\w+)\.(?P<mbts>\w+)\s*\)\s*(?:$|AND\s+(?P<resid>.+))",
    re.IGNORECASE | re.DOTALL,
)
_ON_RE = re.compile(
    r"""\s*ON\s+
    (?P<on>\w+\.\w+\s*=\s*\w+\.\w+(?:\s+AND\s+\w+\.\w+\s*=\s*\w+\.\w+)*)
    """,
    re.IGNORECASE | re.VERBOSE,
)
_EQ_RE = re.compile(
    r"(?P<a>\w+)\.(?P<ak>\w+)\s*=\s*(?P<b>\w+)\.(?P<bk>\w+)", re.IGNORECASE
)
_USING_RE = re.compile(
    r"\s*USING\s*\(\s*(?P<ks>\w+(?:\s*,\s*\w+)*)\s*\)", re.IGNORECASE
)

_VIEW_SEQ = itertools.count()

# single-quoted SQL string literals ('' = escaped quote) — alias
# rewrites must never touch their contents
_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")


def _resolve(side_alias: str, la: str, ra: str, what: str) -> bool:
    """True when the alias names the LEFT side; loud error otherwise.
    Aliases compare case-insensitively, like SQL identifiers."""
    if side_alias.lower() == la.lower():
        return True
    if side_alias.lower() == ra.lower():
        return False
    raise ValueError(
        f"asof_sql: {what} references alias {side_alias!r}, expected "
        f"{la!r} or {ra!r}"
    )


def _resolve_pair(a: str, b: str, la: str, ra: str, what: str) -> bool:
    """Validate that a clause's two sides name DIFFERENT tables; return
    True when ``a`` is the left side. Both aliases are checked — a
    clause like ``ON q.key = q.key2`` is rejected, never silently
    reinterpreted (r9 ADVICE)."""
    a_left = _resolve(a, la, ra, what)
    b_left = _resolve(b, la, ra, what)
    if a_left == b_left:
        raise ValueError(
            f"asof_sql: {what} must reference both table aliases, got "
            f"{a!r} and {b!r} on the same side"
        )
    return a_left


def _scan_balanced(text: str, start: int) -> int:
    """Index just past the ')' matching the '(' that ``start`` points
    AFTER; literal-aware so a ')' inside a string doesn't close."""
    depth = 1
    i = start
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            m = _LITERAL_RE.match(text, i)
            if not m:
                raise ValueError("asof_sql: unterminated string literal")
            i = m.end()
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("asof_sql: unbalanced parens in MATCH_CONDITION")


def _sub_outside_literals(pattern: re.Pattern, repl, text: str) -> str:
    """re.sub applied only to the segments OUTSIDE single-quoted
    literals, so an alias-like token inside a string (e.g. 'p.s.')
    survives the rewrite (r9 ADVICE)."""
    out = []
    pos = 0
    for m in _LITERAL_RE.finditer(text):
        out.append(pattern.sub(repl, text[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(pattern.sub(repl, text[pos:]))
    return "".join(out)


def _rewrite_refs(text: str, la: str, ra: str, pref: str) -> str:
    """Qualified references: la.x -> x, ra.x -> ra_x. Case-insensitive
    on the ALIAS (matching the case-insensitive parse); the column part
    is preserved as written. String literals untouched."""
    la_pat = re.compile(rf"\b{re.escape(la)}\.(\w+)", re.IGNORECASE)
    ra_pat = re.compile(rf"\b{re.escape(ra)}\.(\w+)", re.IGNORECASE)
    text = _sub_outside_literals(la_pat, r"\1", text)
    return _sub_outside_literals(ra_pat, rf"{pref}\1", text)


def asof_sql(spark: SparkSession, text: str) -> DataFrame:
    """Run a Spark SQL string that may contain ASOF JOIN clauses (see
    module docstring for the grammar). Non-ASOF SQL passes through to
    ``spark.sql`` untouched."""
    return spark.sql(_rewrite_asof(spark, text))


def _rewrite_asof(spark: SparkSession, text: str) -> str:
    """The ASOF splice as TEXT → TEXT: materialize each ASOF JOIN
    through operators.asof.asof_join behind a temp view and return the
    rewritten statement (still ordinary Spark SQL), so other text-level
    surfaces (QUALIFY) can compose on top."""
    while True:
        m = _HEAD_RE.search(text)
        if m is None:
            break
        la, ra = m["la"], m["ra"]
        mc_end = _scan_balanced(text, m.end())
        mc_body = text[m.end() : mc_end - 1]
        nm = _NEAREST_RE.match(mc_body)
        pm = None if nm else _PRIMARY_RE.match(mc_body)
        if nm is not None:
            # NEAREST(a.ts, b.ts): direction-free — argument order only
            # fixes which alias owns which timestamp
            a_is_left = _resolve_pair(
                nm["ma"], nm["mb"], la, ra, "MATCH_CONDITION NEAREST"
            )
            if a_is_left:
                left_ts, right_ts = nm["mats"], nm["mbts"]
            else:
                left_ts, right_ts = nm["mbts"], nm["mats"]
            direction = "nearest"
            residual = nm["resid"]
        elif pm is None:
            raise ValueError(
                "asof_sql: MATCH_CONDITION must start with "
                "'<a>.<ts> >=|<= <b>.<ts>' or "
                "'NEAREST(<a>.<ts>, <b>.<ts>)' (optionally AND a "
                f"residual bound), got: {mc_body.strip()!r}"
            )
        else:
            # MATCH_CONDITION sides -> left/right timestamps + direction
            a_is_left = _resolve_pair(
                pm["ma"], pm["mb"], la, ra, "MATCH_CONDITION"
            )
            if a_is_left:
                left_ts, right_ts, left_op = pm["mats"], pm["mbts"], pm["op"]
            else:
                # mirror: ra.ts >= la.ts  ==  la.ts <= ra.ts
                left_ts, right_ts = pm["mbts"], pm["mats"]
                left_op = "<=" if pm["op"] == ">=" else ">="
            direction = "backward" if left_op == ">=" else "forward"
            residual = pm["resid"]

        # key clause: ON equalities or USING same-name list
        om = _ON_RE.match(text, mc_end)
        um = None if om else _USING_RE.match(text, mc_end)
        keys: list[tuple[str, str]] = []
        if om:
            for eq in _EQ_RE.finditer(om["on"]):
                if _resolve_pair(eq["a"], eq["b"], la, ra, "ON"):
                    keys.append((eq["ak"], eq["bk"]))
                else:
                    keys.append((eq["bk"], eq["ak"]))
            clause_end = om.end()
            # _ON_RE consumes only the leading run of equality
            # conjuncts; a trailing non-equality conjunct (the natural
            # DuckDB spelling 'ON a.k = b.k AND a.ts >= b.rts') would
            # otherwise dangle as 'AND ...' after the spliced FROM and
            # surface as an opaque Spark parse error. Reject it loudly
            # here, per the documented grammar (r10 ADVICE).
            dangling = re.match(r"\s*AND\b", text[clause_end:], re.IGNORECASE)
            if dangling:
                raise ValueError(
                    "asof_sql: ON accepts only '=' equality conjuncts; "
                    "put the as-of comparison and any residual bounds "
                    "inside MATCH_CONDITION (...) — got a trailing "
                    f"non-equality conjunct after ON: "
                    f"{text[clause_end:clause_end + 60].strip()!r}"
                )
        elif um:
            keys = [(k.strip(), k.strip()) for k in um["ks"].split(",")]
            clause_end = um.end()
        else:
            raise ValueError(
                "asof_sql: expected ON <equalities> or USING (<keys>) "
                "after MATCH_CONDITION"
            )
        lks = [lk for lk, _ in keys]
        if len(set(k.lower() for k in lks)) != len(lks):
            raise ValueError(f"asof_sql: duplicate left key in {lks}")

        left = spark.table(m["lt"])
        right = spark.table(m["rt"])
        pref = f"{ra}_"
        # rename right columns up front (collision-proof payload) and
        # surface the join keys under the LEFT key names, the contract
        # of operators.asof.asof_join. SQL NULL semantics: a NULL key
        # or NULL ordering ts never matches — drop those right rows
        # before the join (the window would otherwise group/order them).
        r_nonnull = reduce(
            lambda acc, c: acc & F.col(c).isNotNull(),
            [rk for _, rk in keys],
            F.col(right_ts).isNotNull(),
        )
        r2 = right.filter(r_nonnull).select(
            *[F.col(rk).alias(lk) for lk, rk in keys],
            *[F.col(c).alias(pref + c) for c in right.columns],
        )
        joined = asof_join(
            left,
            r2,
            key=lks,
            left_ts=left_ts,
            right_ts=pref + right_ts,
            right_payload=[pref + c for c in right.columns],
            direction=direction,
        )
        # keep = this left row has a REAL match under SQL semantics:
        # a right row was carried, the left side's own key/ts are
        # non-NULL (NULL never satisfies =/>=; the forward window
        # would otherwise hand a NULL-ts left row the earliest right
        # row), and the residual bound (if any) holds.
        l_nonnull = reduce(
            lambda acc, k: acc & F.col(k).isNotNull(),
            lks,
            F.col(left_ts).isNotNull(),
        )
        keep = F.col(pref + right_ts).isNotNull() & l_nonnull
        if residual:
            res_expr = _rewrite_refs(residual, la, ra, pref)
            keep = keep & F.coalesce(F.expr(res_expr), F.lit(False))
        if m["outer"]:
            # LEFT: keep every left row, null the payload when no
            # (bounded) match — engine ASOF LEFT semantics
            joined = joined.select(
                *left.columns,
                *[
                    F.when(keep, F.col(pref + c)).alias(pref + c)
                    for c in right.columns
                ],
            )
        else:
            joined = joined.filter(keep)
        view = f"__asof_{next(_VIEW_SEQ)}"
        joined.createOrReplaceTempView(view)

        rest = text[: m.start()] + f"FROM {view}" + text[clause_end:]
        text = _rewrite_refs(rest, la, ra, pref)
    return text


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE clause (SURVEY.md §2.5 W10 / §4.3 SQL surface)
# ---------------------------------------------------------------------------

_MR_HEAD_RE = re.compile(
    r"FROM\s+(?P<t>\w+)\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE
)
_MR_BODY_RE = re.compile(
    r"""
    \s*PARTITION\s+BY\s+(?P<part>\w+(?:\s*,\s*\w+)*)
    \s+ORDER\s+BY\s+(?P<ord>\w+(?:\s*,\s*\w+)*)
    \s+MEASURES\s+(?P<meas>.+?)
    (?:\s+ONE\s+ROW\s+PER\s+MATCH)?
    (?:\s+AFTER\s+MATCH\s+SKIP\s+
       (?P<skipmode>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW
        |TO\s+FIRST\s+\w+))?
    \s+PATTERN\s*\(\s*(?P<pat>[^()^$]*(?:\([^()^$]*\)[^()^$]*)*)\)
    \s+DEFINE\s+(?P<defs>.+?)\s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)
_MR_BODY_ALL_RE = re.compile(
    r"""
    \s*PARTITION\s+BY\s+(?P<part>\w+(?:\s*,\s*\w+)*)
    \s+ORDER\s+BY\s+(?P<ord>\w+(?:\s*,\s*\w+)*)
    \s+ALL\s+ROWS\s+PER\s+MATCH
    (?:\s+AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW)?
    \s+PATTERN\s*\(\s*(?P<pat>[^()^$]*(?:\([^()^$]*\)[^()^$]*)*)\)
    \s+DEFINE\s+(?P<defs>.+?)\s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)
_MEAS_RE = re.compile(
    r"^\s*(?P<fn>FIRST|LAST|MIN|MAX|SUM|AVG|COUNT)\s*\(\s*"
    r"(?:(?P<lbl>\w+)\s*\.\s*)?(?P<col>\w+|\*)\s*\)\s+"
    r"AS\s+(?P<alias>\w+)\s*$",
    re.IGNORECASE,
)
_MATCHNO_RE = re.compile(
    r"^\s*MATCH_NUMBER\s*\(\s*\)\s+AS\s+(?P<alias>\w+)\s*$",
    re.IGNORECASE,
)
_DEFINE_RE = re.compile(r"^\s*(?P<lbl>\w+)\s+AS\s+(?P<pred>.+)$", re.DOTALL)
_PREV_RE = re.compile(r"\b(?P<kind>PREV|NEXT)\s*\(", re.IGNORECASE)
# the alias-looking token after MATCH_RECOGNIZE(...) that is really the
# start of the next clause
_MR_STOPWORDS = frozenset(
    "WHERE GROUP ORDER LIMIT HAVING UNION INTERSECT EXCEPT QUALIFY "
    "JOIN LEFT RIGHT INNER CROSS FULL ON ASOF SEMI ANTI".split()
)


def _split_top_commas(text: str) -> list[str]:
    """Split on commas at paren depth 0 (outside string literals)."""
    parts: list[str] = []
    last = 0
    for i, ch in _top_level_spans(text):
        if ch == ",":
            parts.append(text[last:i])
            last = i + 1
    parts.append(text[last:])
    return parts


def _null_skipping_sum(cols: list):
    """SUM semantics across per-leg partials: NULL legs skipped, all
    NULL -> NULL (SQL aggregate-over-empty)."""
    out = cols[0]
    for c in cols[1:]:
        out = (
            F.when(out.isNull(), c)
            .when(c.isNull(), out)
            .otherwise(out + c)
        )
    return out


def match_recognize_sql(spark: SparkSession, text: str) -> DataFrame:
    """Run a Spark SQL string whose FROM clause may contain a
    MATCH_RECOGNIZE block — the ISO SQL:2016 row-pattern clause
    [PK: ISO/IEC 9075-2:2016 §R; Oracle/Snowflake MATCH_RECOGNIZE,
    Flink CEP] that Spark SQL 4.1 lacks. The rewriter compiles the
    block through ``operators.patterns`` (gaps-and-islands keyed
    windows where the pattern is overlap-free; the bucketed sequential
    island scan otherwise — auto-routed) and splices the result as a
    temp view, so everything around it stays ordinary Spark SQL.

    Supported grammar (the run-pattern subset, loudly rejected
    otherwise; see operators/patterns.py for the exactness rules):

        FROM <table> MATCH_RECOGNIZE (
          PARTITION BY k [, ...]
          ORDER BY o [, ...]                   -- plain columns, ASC
          MEASURES <m> AS <alias> [, ...]
          [ONE ROW PER MATCH]
          [AFTER MATCH SKIP PAST LAST ROW      -- default: non-overlap
           | AFTER MATCH SKIP TO NEXT ROW      -- overlapping matches
           | AFTER MATCH SKIP TO FIRST <lbl>]  -- chained matches
          PATTERN ( E1 E2 ... )                -- E := L[q]
                                               --    | ( BR | BR ... )[?]
                                               --    | PERMUTE(L[q], ...)
          DEFINE L AS <predicate> [, ...]
        ) [AS <alias>]

    where quantifiers are + * ? {m[,n]}; an alternation group (one
    nesting level, ISO ordered choice; a trailing ? adds the empty
    branch) or PERMUTE (the alternation of all orderings) compiles by
    branch expansion — a match through one branch leaves the other
    branches' measures NULL, so COUNT(L.*) = 0 tells branches apart.
    Group repetition quantifiers and nested groups are rejected.

    or, for row-level output, the ALL ROWS PER MATCH form — the same
    clauses WITHOUT a MEASURES list:

        FROM <table> MATCH_RECOGNIZE (
          PARTITION BY k [, ...]  ORDER BY o [, ...]
          ALL ROWS PER MATCH
          [AFTER MATCH SKIP PAST LAST ROW]
          PATTERN ( ... )  DEFINE ...
        ) [AS <alias>]

    which emits every input row participating in a match plus
    ``match_no`` (MATCH_NUMBER()) and ``classifier`` (CLASSIFIER()) —
    running-measure semantics inside ALL ROWS are out of scope, and
    this form requires the default skip mode (ALL ROWS + SKIP TO NEXT
    ROW would tag one row into several matches — rejected loudly).
    Self-overlapping patterns auto-route to the bucketed sequential
    all-rows matcher (match_runs_all_rows_sequential, r12), exactly
    like the ONE-ROW form.

    SKIP TO NEXT ROW routes to ``match_runs_overlapping``: matches may
    overlap, every qualifying start row emits one, MATCH_NUMBER()
    numbers them per key in start-row order, and — because overlap is
    allowed — self-overlapping patterns (W-shapes, PERMUTE) compile
    all-JVM with no sequential fallback in this mode.

    Semantics notes (documented divergences from full ISO):
      - row labelling is deterministic: DEFINE predicates evaluate in
        clause order, FIRST satisfied wins; rows satisfying none get a
        NULL label (match nothing, break runs). Full MR lets the NFA
        pick among simultaneously-true labels per state — that needs
        sequential row state; the classic disjoint defines
        (value > PREV(value) / < / =) are unaffected. Every PATTERN
        label must be DEFINEd (an undefined label in ISO means TRUE,
        which under first-wins would shadow everything — rejected).
      - predicates may call PREV(<expr>[, n]) and NEXT(<expr>[, n])
        (integer-literal offsets, default 1), compiled to lag/lead
        columns over the PARTITION BY/ORDER BY window and evaluated
        per ROW during labelling (consistent with the deterministic
        first-wins rule above); FIRST/LAST (match-anchored)
        navigation inside DEFINE is not supported.
      - MEASURES support FIRST/LAST/MIN/MAX/SUM/AVG(L.col),
        COUNT(L.*), COUNT(*) and MATCH_NUMBER() (the 1-based per-key
        match ordinal, computed as a cumulative count of match ends
        over the same island window — no extra shuffle); the output is PARTITION BY columns + measures
        (ONE ROW PER MATCH). A label used on several legs aggregates
        across its legs (FIRST = first present leg, COUNT = summed
        rows, ...); legs absent from a match (optional) contribute
        NULL / zero rows.
      - a bare label in PATTERN means exactly one row ({1,1}) per ISO
        — which the island compilation only accepts on interior legs
        (end legs need an unbounded max; the operator explains why).

    Scale notes (100 TB): text-only driver-side rewrite; the spliced
    plan is the W10 operator's — keyed windows + island collapse on
    the PARTITION BY key (growing-key parallelism), lag-chain
    detection, no per-row Python unless the pattern self-overlaps (then
    the bucketed island scan, Python seeing runs, never rows).
    """
    return spark.sql(_rewrite_match_recognize(spark, text))


def _rewrite_match_recognize(spark: SparkSession, text: str) -> str:
    from nipd_spark.operators import patterns as _pat

    while True:
        m = _MR_HEAD_RE.search(text)
        if m is None:
            return text
        body_end = _scan_balanced(text, m.end())
        body = text[m.end() : body_end - 1]
        all_rows = re.search(
            r"\bALL\s+ROWS\s+PER\s+MATCH\b", body, re.IGNORECASE
        )
        skip = re.search(
            r"\bSKIP\s+(?!PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW"
            r"|TO\s+FIRST\s+\w+)",
            body,
            re.IGNORECASE,
        )
        if skip:
            raise ValueError(
                "match_recognize_sql: only AFTER MATCH SKIP PAST LAST "
                "ROW / SKIP TO NEXT ROW / SKIP TO FIRST <label> are "
                "supported (SKIP TO LAST resumes mid-island — the "
                "partial-first-island exactness rule rejects it)"
            )
        to_next = (
            re.search(r"\bSKIP\s+TO\s+NEXT\s+ROW\b", body, re.IGNORECASE)
            is not None
        )
        tf = re.search(
            r"\bSKIP\s+TO\s+FIRST\s+(\w+)\b", body, re.IGNORECASE
        )
        to_first = tf.group(1) if tf else None
        if (to_next or to_first) and all_rows:
            raise ValueError(
                "match_recognize_sql: ALL ROWS PER MATCH with an "
                "overlapping skip mode (TO NEXT ROW / TO FIRST) is "
                "not supported — one row would belong to several "
                "matches"
            )
        bm = (_MR_BODY_ALL_RE if all_rows else _MR_BODY_RE).match(body)
        if bm is None:
            raise ValueError(
                "match_recognize_sql: expected PARTITION BY ... ORDER "
                "BY ... MEASURES ... PATTERN (...) DEFINE ... (or, for "
                "ALL ROWS PER MATCH, the same WITHOUT a MEASURES "
                "clause) — got: "
                f"{body.strip()[:120]!r}"
            )
        part = [c.strip() for c in bm["part"].split(",")]
        order = [c.strip() for c in bm["ord"].split(",")]
        elements = _pat.parse_pattern(bm["pat"])
        legs = _pat.flatten(elements)
        pat_labels = {lab for lab, _, _ in legs}

        # DEFINE: label -> predicate (PREV/NEXT(expr[, n]) hoisted to
        # lag/lead columns over the partition/order window)
        defines: list[tuple[str, str]] = []
        for item in _split_top_commas(bm["defs"]):
            dm = _DEFINE_RE.match(item)
            if dm is None:
                raise ValueError(
                    f"match_recognize_sql: DEFINE item {item.strip()!r} "
                    "is not '<label> AS <predicate>'"
                )
            defines.append((dm["lbl"], dm["pred"].strip()))
        def_labels = [lbl for lbl, _ in defines]
        if len(set(l.upper() for l in def_labels)) != len(def_labels):
            raise ValueError("match_recognize_sql: duplicate DEFINE label")
        missing = pat_labels - {l for l in def_labels}
        if missing:
            raise ValueError(
                f"match_recognize_sql: PATTERN labels {sorted(missing)} "
                "have no DEFINE (ISO's implicit TRUE would shadow every "
                "other label under first-wins labelling — define them)"
            )
        extra = [l for l in def_labels if l not in pat_labels]
        if extra:
            raise ValueError(
                f"match_recognize_sql: DEFINE labels {extra} do not "
                "appear in PATTERN"
            )

        # MEASURES (absent by grammar in the ALL ROWS PER MATCH form:
        # that mode outputs the input rows themselves + MATCH_NUMBER/
        # CLASSIFIER; running-measure semantics are out of scope)
        measures: list[tuple[str, str | None, str, str]] = []
        for item in [] if all_rows else _split_top_commas(bm["meas"]):
            mnm = _MATCHNO_RE.match(item)
            if mnm is not None:
                measures.append(("MATCH_NUMBER", None, "", mnm["alias"]))
                continue
            mm = _MEAS_RE.match(item)
            if mm is None:
                raise ValueError(
                    f"match_recognize_sql: measure {item.strip()!r} is "
                    "not FIRST|LAST|MIN|MAX|SUM|AVG(<label>.<col>), "
                    "COUNT(<label>.*) or COUNT(*) AS <alias>"
                )
            fn = mm["fn"].upper()
            lbl, col, alias = mm["lbl"], mm["col"], mm["alias"]
            if col == "*" and fn != "COUNT":
                raise ValueError(
                    f"match_recognize_sql: {fn}(*) is not a measure"
                )
            if fn != "COUNT" and lbl is None:
                raise ValueError(
                    f"match_recognize_sql: {fn} needs a label-qualified "
                    f"column, got {item.strip()!r}"
                )
            if lbl is not None and lbl not in pat_labels:
                raise ValueError(
                    f"match_recognize_sql: measure label {lbl!r} not in "
                    "PATTERN"
                )
            measures.append((fn, lbl, col, alias))

        rel = spark.table(m["t"])
        # PREV(expr) -> lag columns over the partition/order window
        from pyspark.sql import Window as _W

        w_row = _W.partitionBy(*part).orderBy(*[F.col(c) for c in order])
        prev_map: dict[str, str] = {}

        def hoist_prev(pred: str) -> str:
            out = pred
            while True:
                pm = _PREV_RE.search(out)
                if pm is None:
                    return out
                end = _scan_balanced(out, pm.end())
                inner = out[pm.end() : end - 1].strip()
                parts = _split_top_commas(inner)
                if len(parts) == 1:
                    expr, off = inner, 1
                elif len(parts) == 2 and parts[1].strip().isdigit():
                    expr, off = parts[0].strip(), int(parts[1])
                else:
                    raise ValueError(
                        "match_recognize_sql: "
                        f"{pm.group('kind').upper()}({inner!r}) — the "
                        "navigation offset must be an integer literal "
                        "(PREV/NEXT(<expr>[, n]))"
                    )
                key = (pm.group("kind").upper(), expr, off)
                name = prev_map.get(key)
                if name is None:
                    name = f"__mr_nav{len(prev_map)}"
                    prev_map[key] = name
                out = out[: pm.start()] + name + out[end:]

        preds = [(lbl, hoist_prev(pred)) for lbl, pred in defines]
        for (kind, expr, off), name in prev_map.items():
            nav = F.lag(F.expr(expr), off) if kind == "PREV" else F.lead(
                F.expr(expr), off
            )
            rel = rel.withColumn(name, nav.over(w_row))
        label = None
        for lbl, pred in preds:
            cond = F.expr(pred)
            label = (
                F.when(cond, F.lit(lbl))
                if label is None
                else label.when(cond, F.lit(lbl))
            )

        if all_rows:
            # ALL ROWS PER MATCH: input columns + MATCH_NUMBER() AS
            # match_no + CLASSIFIER() AS classifier (the __mr_prev
            # helper columns are dropped)
            base_cols = spark.table(m["t"]).columns
            all_rows_matcher = (
                _pat.match_runs_all_rows
                if _pat.windows_compilable(elements)
                else _pat.match_runs_all_rows_sequential
            )
            result = all_rows_matcher(
                rel, part, order, label, elements
            ).select(*base_cols, "match_no", "classifier")
            view = f"__mr_{next(_VIEW_SEQ)}"
            result.createOrReplaceTempView(view)
            tail_at = body_end
            am = re.match(
                r"\s*(?:AS\s+)?(\w+)", text[tail_at:], re.IGNORECASE
            )
            alias = None
            if am and am.group(1).upper() not in _MR_STOPWORDS:
                alias = am.group(1)
                tail_at += am.end()
            text = text[: m.start()] + f"FROM {view}" + text[tail_at:]
            if alias:
                apat = re.compile(
                    rf"\b{re.escape(alias)}\.(\w+)", re.IGNORECASE
                )
                text = _sub_outside_literals(apat, r"\1", text)
            continue

        # island aggs required by the measures (deduped)
        ostruct = F.struct(*[F.col(c) for c in order])
        aggs: dict[str, object] = {}
        need_mn = any(fn == "MATCH_NUMBER" for fn, _, _, _ in measures)
        for fn, _lbl, col, _alias in measures:
            if fn in ("COUNT", "MATCH_NUMBER"):
                continue
            if fn == "AVG":
                # avg across a label's legs needs per-island partials
                aggs.setdefault(f"sum_{col}", F.sum(col))
                aggs.setdefault(f"cnt_{col}", F.count(col))
                continue
            key = f"{fn.lower()}_{col}"
            if key in aggs:
                continue
            aggs[key] = {
                "FIRST": F.min_by(F.col(col), ostruct),
                "LAST": F.max_by(F.col(col), ostruct),
                "MIN": F.min(col),
                "MAX": F.max(col),
                "SUM": F.sum(col),
            }[fn]

        if to_next:
            matcher = _pat.match_runs_overlapping
        elif to_first is not None:
            # label case-matching: DEFINE labels are the authority

            def matcher(*a, **kw):
                return _pat.match_runs_sequential(
                    *a, **kw, skip_to_first=to_first
                )

        else:
            matcher = (
                _pat.match_runs
                if _pat.windows_compilable(elements)
                else _pat.match_runs_sequential
            )
        matched = matcher(
            rel, part, order, label, elements, aggs, with_match_no=need_mn
        )

        # assemble measures across the legs carrying each label
        legs_of = {
            lab: [i for i, (l2, _, _) in enumerate(legs) if l2 == lab]
            for lab in pat_labels
        }
        out_cols = [F.col(c) for c in part]
        for fn, lbl, col, alias in measures:
            if fn == "MATCH_NUMBER":
                v = F.col("match_no")
                out_cols.append(v.alias(alias))
                continue
            if fn == "COUNT":
                idxs = (
                    list(range(len(legs))) if lbl is None else legs_of[lbl]
                )
                v = None
                for i in idxs:
                    c = F.coalesce(F.col(f"seg{i}_n"), F.lit(0))
                    v = c if v is None else v + c
            elif fn == "AVG":
                # sum-of-partials / count-of-partials, NULL-skipping
                # per SQL aggregate semantics (all-absent -> NULL)
                idxs = legs_of[lbl]
                tot = _null_skipping_sum(
                    [F.col(f"seg{i}_sum_{col}") for i in idxs]
                )
                n = None
                for i in idxs:
                    c = F.coalesce(F.col(f"seg{i}_cnt_{col}"), F.lit(0))
                    n = c if n is None else n + c
                v = F.when(n > 0, tot / n)
            else:
                key = f"{fn.lower()}_{col}"
                cols = [F.col(f"seg{i}_{key}") for i in legs_of[lbl]]
                if fn == "FIRST":
                    v = F.coalesce(*cols) if len(cols) > 1 else cols[0]
                elif fn == "LAST":
                    v = (
                        F.coalesce(*reversed(cols))
                        if len(cols) > 1
                        else cols[0]
                    )
                elif fn == "MIN":
                    v = F.least(*cols) if len(cols) > 1 else cols[0]
                elif fn == "MAX":
                    v = F.greatest(*cols) if len(cols) > 1 else cols[0]
                else:  # SUM
                    v = _null_skipping_sum(cols)
            out_cols.append(v.alias(alias))
        result = matched.select(*out_cols)
        view = f"__mr_{next(_VIEW_SEQ)}"
        result.createOrReplaceTempView(view)

        # optional trailing alias (AS m | m), not a clause keyword
        tail_at = body_end
        am = re.match(
            r"\s*(?:AS\s+)?(\w+)", text[tail_at:], re.IGNORECASE
        )
        alias = None
        if am and am.group(1).upper() not in _MR_STOPWORDS:
            alias = am.group(1)
            tail_at += am.end()
        text = text[: m.start()] + f"FROM {view}" + text[tail_at:]
        if alias:
            apat = re.compile(
                rf"\b{re.escape(alias)}\.(\w+)", re.IGNORECASE
            )
            text = _sub_outside_literals(apat, r"\1", text)


# ---------------------------------------------------------------------------
# QUALIFY clause (SURVEY.md §2.5 windows / §4.3 SQL surface)
# ---------------------------------------------------------------------------

_QUALIFY_AUX_SEQ = itertools.count()


def _top_level_spans(text: str):
    """Yield (index, char) for characters at paren depth 0, skipping
    single-quoted literals."""
    depth = 0
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            m = _LITERAL_RE.match(text, i)
            if not m:
                raise ValueError("qualify_sql: unterminated string literal")
            i = m.end()
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            yield i, ch
        i += 1


def _find_top_keyword(text: str, word: str) -> int:
    """Index of the first top-level (depth-0, outside literals)
    occurrence of ``word`` as a whole keyword; -1 if absent."""
    wl = len(word)
    up = text.upper()
    for i, _ in _top_level_spans(text):
        if up.startswith(word, i):
            before_ok = i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_")
            j = i + wl
            after_ok = j >= len(up) or not (up[j].isalnum() or up[j] == "_")
            if before_ok and after_ok:
                return i
    return -1


def _extract_windows(pred: str) -> tuple[str, list[tuple[str, str]]]:
    """Replace each inline ``fn(...) OVER (...)`` in ``pred`` with a
    generated alias; return (rewritten_pred, [(alias, window_expr)])."""
    out = pred
    aux: list[tuple[str, str]] = []
    while True:
        k = _find_top_keyword(out, "OVER")
        if k < 0:
            break
        # right side: the balanced OVER ( ... )
        open_paren = out.find("(", k)
        if open_paren < 0:
            raise ValueError("qualify_sql: OVER without a window spec")
        end = _scan_balanced(out, open_paren + 1)
        # left side: scan back over whitespace, then a balanced arg
        # list, then the function name
        j = k - 1
        while j >= 0 and out[j].isspace():
            j -= 1
        if j < 0 or out[j] != ")":
            raise ValueError(
                "qualify_sql: expected fn(...) immediately before OVER"
            )
        depth = 0
        start = j
        while start >= 0:
            if out[start] == ")":
                depth += 1
            elif out[start] == "(":
                depth -= 1
                if depth == 0:
                    break
            start -= 1
        m = re.search(r"(\w+)\s*$", out[:start])
        if not m:
            raise ValueError("qualify_sql: window function name not found")
        expr = out[m.start(1) : end]
        alias = f"__qw{next(_QUALIFY_AUX_SEQ)}"
        aux.append((alias, expr))
        out = out[: m.start(1)] + alias + out[end:]
    return out, aux


def qualify_sql(spark: SparkSession, text: str) -> DataFrame:
    """Run a Spark SQL string that may end in a QUALIFY clause — the
    post-window filter Snowflake/DuckDB/BigQuery standardized [PK] and
    Spark SQL 4.1 lacks. Evaluation order matches those engines:
    SELECT list and window functions first, then the QUALIFY
    predicate, then ORDER BY / LIMIT.

    Supported grammar (v1, loudly rejected otherwise): one top-level
    SELECT whose QUALIFY clause appears after WHERE/GROUP BY/HAVING
    and before an optional trailing ORDER BY / LIMIT. The predicate
    may reference select-list aliases and/or inline window
    expressions (``row_number() OVER (...) = 1``); inline windows are
    hoisted into the select list under generated ``__qw<n>`` aliases,
    the predicate becomes a post-projection filter, and the auxiliary
    columns are dropped from the result — so the output schema equals
    the original select list, exactly as in the native engines.
    Columns not in the select list cannot be referenced (the rewrite
    filters the PROJECTED relation; Spark raises its ordinary
    unresolved-column error). When the predicate carries inline window
    expressions, a head with top-level SELECT DISTINCT or a set
    operation (UNION/INTERSECT/EXCEPT) is rejected loudly — hoisting
    the auxiliary column would change the dedup set or land in one
    branch only (QUALIFY without inline windows, referencing
    select-list aliases, still composes with DISTINCT: the filter is a
    row-function of the projected columns, so it commutes with the
    dedup).

    Scale notes (100 TB): text-only driver-side rewrite; the plan is
    the ordinary window + filter Catalyst would build for the
    subquery spelling — same shuffles, same pushdown, nothing
    materializes.
    """
    k = _find_top_keyword(text, "QUALIFY")
    if k < 0:
        return spark.sql(text)
    head = text[:k]
    rest = text[k + len("QUALIFY") :]
    # the trailing ORDER BY / LIMIT must be TOP-LEVEL — an ORDER BY
    # inside an inline OVER (...) window spec belongs to the predicate
    cut = min(
        (
            p
            for p in (
                _find_top_keyword(rest, "ORDER"),
                _find_top_keyword(rest, "LIMIT"),
            )
            if p >= 0
        ),
        default=-1,
    )
    pred, tail = (
        (rest[:cut], rest[cut:]) if cut >= 0 else (rest, "")
    )
    pred = pred.strip()
    if not pred:
        raise ValueError("qualify_sql: empty QUALIFY predicate")
    pred, aux = _extract_windows(pred)
    if aux:
        # Hoisting an auxiliary window column into the select list is
        # only sound when the head is a plain SELECT: under SELECT
        # DISTINCT the extra column would change the dedup set (native
        # engines evaluate QUALIFY before DISTINCT), and under a
        # top-level set operation it would land in only the first
        # branch's select list. Loud rejection, per the module's
        # documented-grammar contract (r10 ADVICE); spell the window in
        # a subquery's select list instead.
        for kw in ("DISTINCT", "UNION", "INTERSECT", "EXCEPT"):
            if _find_top_keyword(head, kw) >= 0:
                raise ValueError(
                    "qualify_sql: QUALIFY with inline window "
                    "expressions cannot be combined with a top-level "
                    f"{kw} — the hoisted auxiliary column would change "
                    "the dedup set / apply to one branch only; name "
                    "the window in a subquery select list instead"
                )
        f = _find_top_keyword(head, "FROM")
        if f < 0:
            raise ValueError("qualify_sql: no top-level FROM")
        aux_sql = "".join(f", {e} AS {a}" for a, e in aux)
        head = head[:f] + aux_sql + " " + head[f:]
    df = spark.sql(head).filter(pred)
    if aux:
        df = df.drop(*[a for a, _ in aux])
    if tail.strip():
        view = f"__qualify_{next(_VIEW_SEQ)}"
        df.createOrReplaceTempView(view)
        df = spark.sql(f"SELECT * FROM {view} {tail}")
    return df


def sql(spark: SparkSession, text: str) -> DataFrame:
    """The combined SQL-surface entry point: run a Spark SQL string
    that may contain ALL the extensions this module adds —
    MATCH_RECOGNIZE blocks and ASOF JOIN clauses (incl. NEAREST)
    anywhere in the statement, and a trailing QUALIFY clause — in the
    order the semantics require: the MATCH_RECOGNIZE splice first
    (it replaces a whole FROM-clause table expression with a temp
    view), then the ASOF splice (FROM-clause join text), then the
    QUALIFY rewrite on the result. Plain Spark SQL passes through
    untouched, so this is a drop-in ``spark.sql`` for the documented
    grammar.

    Scale notes (100 TB): pure text-level composition of the three
    rewrites — the plan is whatever the individual surfaces produce;
    nothing additional materializes.
    """
    return qualify_sql(
        spark, _rewrite_asof(spark, _rewrite_match_recognize(spark, text))
    )
