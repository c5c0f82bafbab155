"""Row-pattern matching over ordered per-key sequences — the
MATCH_RECOGNIZE run-pattern subset (SURVEY.md §2.5 W10).

ISO SQL:2016 row pattern recognition (Oracle/Snowflake MATCH_RECOGNIZE,
Flink CEP [PK: ISO/IEC 9075-2:2016 §R; Flink MATCH_RECOGNIZE docs])
has no Spark SQL 4.1 surface. The general feature runs an NFA
sequentially per partition — inherently stateful. This operator
implements the exactly-compilable subset covering the classic
analytics uses (V/U-shapes, dip-and-recover, escalation runs), with
ONE ROW PER MATCH under BOTH ISO skip modes — AFTER MATCH SKIP PAST
LAST ROW (non-overlapping greedy scan: ``match_runs`` /
``match_runs_sequential``) and AFTER MATCH SKIP TO NEXT ROW
(overlapping, one match per qualifying start row:
``match_runs_overlapping`` — which needs NO border restriction and NO
sequential fallback, see its docstring):

    PATTERN (E1 E2 ... Ek)   where  Ei := L[q] | ( BR1 | BR2 | ... )
                                    BRj := a sequence of L[q]
                                    | PERMUTE(L1[q], ..., Lm[q])

where each quantifier ``q`` bounds the ROW length of that label's
maximal same-label run: ``+`` = {1,}, ``*`` = {0,} (leg optional),
``?`` = {0,1}, ``{m}``, ``{m,}``, ``{m,n}``. Alternation groups
(one nesting level, ISO ordered-choice semantics) and PERMUTE
(sugar for the alternation of all orderings) are compiled by
EXPANSION — each branch choice joins the optional-leg present/absent
choices in one cross-product of candidate label sequences (see
below). A group followed by ``?`` gains an empty branch (the whole
group absent). Group repetition (``(..)+``, ``(..){m,n}``) and
nested groups are outside the subset and rejected loudly. The
compile target is the gaps-and-islands idiom — pure keyed windows +
one aggregation, no per-row Python, no sequential scan:

  1. label change-points → per-key island ids (one keyed window);
  2. collapse rows to (key, island) with the caller's island-level
     aggregates (keyed partial agg — islands, not rows, flow on);
  3. detect the pattern on the ISLAND sequence: a match ends at an
     island whose predecessors carry the pattern's labels with run
     lengths inside each leg's [m, n] bounds (lag chain over the
     islands table, same keyed window). Quantifier bounds are pure
     per-island filters because an INTERIOR leg must consume its
     whole island (the neighbors' labels differ) — m <= len <= n
     exactly; the FIRST and LAST legs must consume whole islands too,
     which is exact only when their max is unbounded, so a finite max
     on an end leg is rejected loudly (see "Exactness" below).

Optional legs (min 0) and alternation branches compile to the set of
EXPANSIONS — the cross-product of branch choices and present/absent
optional-leg choices, enumerated depth-first in the NFA's
backtracking preference order (branches in written order, present
before absent); each expansion's legs keep their ORIGINAL flattened
pattern positions, so a match through one branch carries NULL seg
columns for every other branch's legs. The island string is
deterministic (adjacent islands never share a label), so the
detection ORs the expansions' lag chains, preferring the longest at
a shared end (the longer expansion starts strictly earlier — the
LEFTMOST match wins regardless of branch order) and breaking
same-length ties in preference order.

Exactness of the skip-past-last semantics WITHOUT sequential state:
maximal runs mean an occurrence of an expansion's label sequence in
the island string corresponds 1:1 to a pattern match, and the greedy
non-overlapping scan equals "emit every satisfying window" exactly
when no two occurrences with DIFFERENT ends can overlap. The
constructor therefore REJECTS patterns where any alignment of two
expansion label sequences (other than same-end LABEL-suffix nesting,
resolved longest-first = leftmost, and same-start original-leg
PREFIX nesting, resolved by lead lookahead) is label-consistent —
for a single quantifier-free expansion this reduces to the classic
KMP border condition. It also rejects (for BOTH matchers, island
granularity cannot express them):
  - adjacent equal labels in any expansion (greedy run split of one
    island across two legs is row-level state);
  - a finite max bound on the first or last leg of any expansion (the
    true NFA would consume a PARTIAL island there, so island-level
    measures and SKIP PAST LAST would be wrong);
  - patterns whose legs are all optional (empty match).
Self-overlapping patterns (e.g. W-shapes DOWN UP DOWN UP, and most
PERMUTE groups — PERMUTE(A, B)'s two orderings overlap on A B A)
pass validation only in ``match_runs_sequential`` — the documented
escape hatch running the greedy scan per key over the ISLAND table.

Scale notes (100 TB): one shuffle on the (growing) key + in-partition
sorts — the cost class of any per-key window; the island collapse
shrinks the relation before the detection window, and no stage is
keyed on a bounded-domain column. Quantifiers add lag columns over
the SAME island window — no extra shuffle.
"""

from __future__ import annotations

import re
from math import prod as _prod

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# a leg: (label, min_rows, max_rows|None for unbounded)
Leg = tuple[str, int, "int | None"]
# a pattern ELEMENT is a Leg, or an alternation group: a list of
# branches, each branch a list of Legs (an empty branch = the whole
# group absent, i.e. the ISO "(...)?" spelling)
# an expansion leg: (original_leg_index, label, min_rows>=1, max|None)
ExpLeg = tuple[int, str, int, "int | None"]

_MAX_EXPANSIONS = 32

_TOKEN_RE = re.compile(
    r"(?P<lab>\w+)\s*(?P<q>\+|\*|\?|\{\s*\d+\s*(?:,\s*\d*\s*)?\})?"
)
_GROUP_Q_RE = re.compile(r"\s*(\+|\*|\?|\{[^}]*\})")


def _parse_quant(q: "str | None", bare: tuple[int, "int | None"]):
    if q is None:
        return bare
    if q == "+":
        return 1, None
    if q == "*":
        return 0, None
    if q == "?":
        return 0, 1
    body = q.strip("{}").replace(" ", "")
    if "," in body:
        a, b = body.split(",")
        return int(a), (int(b) if b else None)
    return int(body), int(body)


def _parse_seq(text: str, who: str) -> list[Leg]:
    """A plain sequence of quantified labels (one alternation branch /
    one PERMUTE item list)."""
    legs: list[Leg] = []
    pos = 0
    text = text.strip()
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m or not m["lab"]:
            raise ValueError(
                f"{who}: expected 'LABEL[+*?{{m,n}}]' at "
                f"{text[pos:pos + 20]!r} — nested groups and anchors "
                "are outside the run-pattern subset "
                "(see operators/patterns.py)"
            )
        lo, hi = _parse_quant(m["q"], (1, 1))
        legs.append((m["lab"], lo, hi))
        pos = m.end()
    return legs


def parse_pattern(text: str) -> list:
    """Parse a MATCH_RECOGNIZE PATTERN body (the run-pattern subset)
    into pattern elements: ``DOWN{2,} (FLAT+ | UP+)`` ->
    [("DOWN",2,None), [[("FLAT",1,None)], [("UP",1,None)]]]. Per ISO,
    a BARE label means exactly one row ({1,1}); note the difference
    from the PYTHON API, where a bare string leg keeps its historical
    one-or-more meaning. Alternation groups ``( BR | BR )`` (ordered
    choice; one nesting level; a trailing ``?`` adds the empty
    branch) and ``PERMUTE(item, ...)`` (the alternation of all
    orderings of its quantified-label items, ISO 9075-2 §R sugar) are
    supported; group repetition quantifiers, nested groups and
    anchors are rejected loudly."""
    import itertools as _it

    elements: list = []
    pos = 0
    text = text.strip()
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        pm = re.compile(r"PERMUTE\s*\(", re.IGNORECASE).match(text, pos)
        if pm or text[pos] == "(":
            start = pm.end() if pm else pos + 1
            depth = 1
            i = start
            while i < len(text) and depth:
                if text[i] == "(":
                    depth += 1
                    if depth > 1:
                        raise ValueError(
                            "parse_pattern: nested groups are outside "
                            "the run-pattern subset"
                        )
                elif text[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                raise ValueError("parse_pattern: unbalanced '(' in PATTERN")
            inner, pos = text[start : i - 1], i
            if pm:
                items = [
                    _parse_seq(p, "parse_pattern") for p in inner.split(",")
                ]
                if any(len(it) != 1 for it in items) or len(items) < 2:
                    raise ValueError(
                        "parse_pattern: PERMUTE takes 2+ quantified "
                        "labels (one per comma-separated item)"
                    )
                branches = [
                    [it[0] for it in perm]
                    for perm in _it.permutations(items)
                ]
            else:
                branches = [
                    _parse_seq(b, "parse_pattern") for b in inner.split("|")
                ]
            gq = _GROUP_Q_RE.match(text, pos)
            if gq:
                if gq.group(1) != "?":
                    raise ValueError(
                        f"parse_pattern: group quantifier "
                        f"{gq.group(1)!r} (repetition) is outside the "
                        "run-pattern subset; only '?' (the empty "
                        "branch) is supported on a group"
                    )
                branches.append([])
                pos = gq.end()
            if len(branches) < 2:
                raise ValueError(
                    "parse_pattern: a group must contain '|' "
                    "alternation or a trailing '?' (plain grouping "
                    "has no effect in the run-pattern subset — drop "
                    "the parens)"
                )
            elements.append(branches)
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m or not m["lab"]:
            raise ValueError(
                "parse_pattern: expected 'LABEL[+*?{m,n}]', "
                "'( BR | BR )' or 'PERMUTE(...)' at "
                f"{text[pos:pos + 20]!r} — anchors and nested groups "
                "are outside the run-pattern subset "
                "(see operators/patterns.py)"
            )
        lo, hi = _parse_quant(m["q"], (1, 1))
        elements.append((m["lab"], lo, hi))
        pos = m.end()
    if not elements:
        raise ValueError("parse_pattern: empty pattern")
    return elements


def _normalize(pattern) -> list:
    """Python-API pattern elements: a bare string keeps the historical
    one-or-more meaning (["DOWN","UP"] == DOWN+ UP+); tuples are
    (label, min, max|None); a LIST element is an alternation group —
    a list of branches, each branch a list of string/tuple legs (an
    empty branch makes the group optional)."""

    def leg(p) -> Leg:
        if isinstance(p, str):
            return (p, 1, None)
        lab, lo, hi = p
        return (str(lab), int(lo), None if hi is None else int(hi))

    elements: list = []
    for p in pattern:
        if isinstance(p, list):
            branches = []
            for br in p:
                if not isinstance(br, (list, tuple)):
                    raise ValueError(
                        "match_runs: an alternation branch must be a "
                        f"list of legs, got {br!r}"
                    )
                branches.append([leg(x) for x in br])
            if len(branches) < 2:
                raise ValueError(
                    "match_runs: an alternation group needs 2+ branches"
                )
            elements.append(branches)
        else:
            elements.append(leg(p))
    if not elements:
        raise ValueError("match_runs: empty pattern")
    return elements


def flatten(pattern) -> list[Leg]:
    """The pattern's legs in ORIGINAL flattened order (elements left to
    right; within a group, branches then legs in written order) — the
    order that numbers the output ``seg{i}_*`` columns. Accepts either
    the Python-API spelling or ``parse_pattern`` output."""
    out: list[Leg] = []
    for el in _normalize(pattern):
        if isinstance(el, tuple):
            out.append(el)
        else:
            for br in el:
                out.extend(br)
    return out


def _expansions(
    elements: list, who: str, bounded_ends: tuple = (0, -1)
) -> list[list[ExpLeg]]:
    """All candidate label sequences — the cross-product of alternation
    branch choices and present/absent choices for the optional (min 0)
    legs — in GREEDY preference order (depth-first: elements left to
    right, branches in written order, present before absent — the
    NFA's backtracking order), each validated for island-granularity
    exactness. Expansion legs carry their ORIGINAL flattened pattern
    index."""
    flat = flatten(elements)
    for lab, lo, hi in flat:
        if hi is not None and (hi < 1 or hi < lo):
            raise ValueError(
                f"{who}: leg {lab}{{{lo},{hi}}} has an empty or "
                "inverted row-length range"
            )
    # exact expansion count before enumerating
    total = 1
    for el in elements:
        if isinstance(el, tuple):
            total *= 2 if el[1] == 0 else 1
        else:
            total *= sum(
                _prod(2 if lo == 0 else 1 for _, lo, _ in br)
                for br in el
            )
    if total > _MAX_EXPANSIONS:
        raise ValueError(
            f"{who}: the pattern's branch/optional choices expand to "
            f"{total} label sequences (cap {_MAX_EXPANSIONS})"
        )
    # pre-assign original flattened indices
    idx = 0
    struct: list = []
    for el in elements:
        if isinstance(el, tuple):
            struct.append(("leg", (idx, *el)))
            idx += 1
        else:
            brs = []
            for br in el:
                brs.append([(idx + j, *l) for j, l in enumerate(br)])
                idx += len(br)
            struct.append(("grp", brs))
    out: list[list[ExpLeg]] = []

    def rec_el(i: int, cur: list[ExpLeg]) -> None:
        if i == len(struct):
            if cur:
                out.append(list(cur))
            return
        kind, payload = struct[i]
        if kind == "leg":
            oi, lab, lo, hi = payload
            cur.append((oi, lab, max(lo, 1), hi))
            rec_el(i + 1, cur)
            cur.pop()
            if lo == 0:
                rec_el(i + 1, cur)
        else:
            for br in payload:
                rec_br(i, br, 0, cur)

    def rec_br(i: int, br: list, j: int, cur: list[ExpLeg]) -> None:
        if j == len(br):
            rec_el(i + 1, cur)
            return
        oi, lab, lo, hi = br[j]
        cur.append((oi, lab, max(lo, 1), hi))
        rec_br(i, br, j + 1, cur)
        cur.pop()
        if lo == 0:
            rec_br(i, br, j + 1, cur)

    rec_el(0, [])
    if not out:
        raise ValueError(
            f"{who}: every choice of branches/optional legs is empty — "
            "the pattern admits the empty match"
        )
    for e in out:
        labs = [lab for _, lab, _, _ in e]
        for a, b in zip(labs, labs[1:]):
            if a == b:
                raise ValueError(
                    f"{who}: adjacent equal labels ({a!r} {b!r}) in the "
                    f"expansion {labs} — a greedy split of one maximal "
                    "run across two legs is row-level state the island "
                    "compilation cannot express; merge the legs (or "
                    "make the optional leg between them mandatory)"
                )
        for end in bounded_ends:
            _, lab, _, hi = e[end]
            if hi is not None:
                raise ValueError(
                    f"{who}: leg {lab!r} has a finite max row bound "
                    f"{{..,{hi}}} and sits at the "
                    f"{'start' if end == 0 else 'end'} of the "
                    f"expansion {labs} — the NFA would consume a "
                    "PARTIAL island there, so island-level measures "
                    "and the skip semantics cannot be exact; use an "
                    "unbounded max (+ / {m,}) there (under SKIP TO "
                    "NEXT ROW a finite max is allowed on the FIRST "
                    "leg only: partial-island starts are exact via "
                    "the per-start-row suffix computation)"
                )
    return out


def _overlap_conflict(p: list[ExpLeg], q: list[ExpLeg]) -> bool:
    """True when some alignment of expansion q against expansion p is
    label-consistent AND not one of the two nestings the detection
    resolves exactly:
      - same-END alignment (the shorter is then a LABEL suffix of the
        longer): the longer starts strictly earlier, so the leftmost
        rule prefers it whenever its bound conditions hold, and the
        longest-first when-chain picks exactly that — falling through
        to the shorter when the longer's bounds fail, which is also
        the NFA's behaviour (r12: label-suffix, not original-leg
        suffix — alternation branches carry distinct original legs);
      - same-START alignment where the shorter is an original-leg
        PREFIX of the longer (trailing optionals absent): the lead
        lookahead suppresses the short form when the long one extends.
        (A LABEL-only prefix from a different branch is NOT exempt:
        the lookahead checks only the longer form's extension legs,
        so differing bounds on the shared prefix would suppress
        wrongly.)
    Any other label-consistent alignment means two occurrences with
    different ends could overlap on one island string, breaking the
    equivalence of end-anchored detection and the greedy scan — for a
    single quantifier-free expansion this is exactly the KMP border
    condition."""
    pl = [lab for _, lab, _, _ in p]
    ql = [lab for _, lab, _, _ in q]
    pi = [oi for oi, _, _, _ in p]
    qi = [oi for oi, _, _, _ in q]
    for o in range(-(len(ql) - 1), len(pl)):
        if o + len(ql) == len(pl):
            # same-end: label-suffix nesting, resolved longest-first
            if (o >= 0 and ql == pl[o:]) or (o < 0 and pl == ql[-o:]):
                continue
        if o == 0:
            # same-start: exact only as original-leg prefix nesting
            n = min(len(pi), len(qi))
            if pi[:n] == qi[:n]:
                continue
        lo, hi = max(0, o), min(len(pl), o + len(ql))
        if lo >= hi:
            continue
        if all(pl[i] == ql[i - o] for i in range(lo, hi)):
            return True
    return False


def _check_windows_compilable(exps: list[list[ExpLeg]], who: str) -> None:
    for p in exps:
        for q in exps:
            if _overlap_conflict(p, q):
                raise ValueError(
                    f"{who}: label sequences "
                    f"{[l for _, l, _, _ in p]} and "
                    f"{[l for _, l, _, _ in q]} admit overlapping "
                    "occurrences (a nontrivial border / "
                    "cross-expansion overlap) — lag-chain detection "
                    "cannot reproduce AFTER MATCH SKIP PAST LAST ROW; "
                    "use match_runs_sequential for this pattern"
                )


def windows_compilable(pattern) -> bool:
    """True when ``match_runs`` accepts the pattern (island-exact AND
    overlap-free); patterns that are island-exact but self-overlapping
    return False and belong to ``match_runs_sequential``. Patterns
    outside the island subset raise in BOTH matchers."""
    legs = _normalize(pattern)
    exps = _expansions(legs, "windows_compilable")
    try:
        _check_windows_compilable(exps, "windows_compilable")
        return True
    except ValueError:
        return False


def _islands(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    label: Column,
    island_aggs: dict[str, Column],
) -> DataFrame:
    """Collapse rows to maximal same-label runs per key: the shared
    first two stages of both matchers (one keyed window for the
    change-point cumsum, one keyed partial agg)."""
    w_row = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    lab = df.withColumn("__lab", label)
    lab = lab.withColumn("__prevlab", F.lag("__lab").over(w_row))
    change = (
        F.col("__lab").isNull()
        | F.col("__prevlab").isNull()
        | (F.col("__lab") != F.col("__prevlab"))
    ).cast("long")
    isl = lab.withColumn(
        "__island",
        F.sum(change).over(
            w_row.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return isl.groupBy(*keys, "__island").agg(
        F.first("__lab").alias("__lab"),
        F.count(F.lit(1)).alias("__n"),
        *[c.alias(f"__a_{name}") for name, c in island_aggs.items()],
    )


def _leg_cond(at, off: int, lab: str, lo: int, hi: int | None) -> Column:
    c = at(off, "__lab") == lab
    if lo > 1:
        c = c & (at(off, "__n") >= lo)
    if hi is not None:
        c = c & (at(off, "__n") <= hi)
    return c


def match_runs(
    df: DataFrame,
    key: str | list[str],
    order: list[str],
    label: Column,
    pattern,
    island_aggs: dict[str, Column],
    with_match_no: bool = False,
) -> DataFrame:
    """One row per pattern match, all-JVM (keyed windows + lag chain).
    ``label`` classifies each row (NULL = matches nothing, breaks
    runs); ``order`` must be a deterministic total order within each
    key (include a unique tiebreaker). ``pattern`` legs are bare
    labels (one-or-more runs, the historical API) and/or
    ``(label, min_rows, max_rows|None)`` tuples — see the module
    docstring for the exactness rules (``parse_pattern`` maps the SQL
    quantifier spellings onto the tuples). ``island_aggs`` are
    aggregates evaluated over each leg's island rows; the output
    carries ``seg{i}_{name}`` plus ``seg{i}_n`` (row count) for every
    pattern position i — NULL when an optional leg is absent from the
    match. ``with_match_no=True`` appends ``match_no`` — the ISO
    MATCH_NUMBER(): 1-based per key in match order (a cumulative
    count of match ends over the SAME island window, no extra
    shuffle)."""
    elements = _normalize(pattern)
    exps = _expansions(elements, "match_runs")
    _check_windows_compilable(exps, "match_runs")
    # longest-first: at a shared end island the longer expansion is the
    # greedy NFA's choice (its extra legs are present-optionals)
    exps = sorted(exps, key=len, reverse=True)
    keys = [key] if isinstance(key, str) else list(key)
    segs = _islands(df, keys, order, label, island_aggs)
    k = len(flatten(elements))
    max_len = max(len(e) for e in exps)
    # trailing-optional extensions need LOOKAHEAD: when expansion e is
    # an original-leg PREFIX of a longer e2, the greedy NFA keeps
    # consuming e2's extra legs, so e may only end a match here if no
    # such extension matches the islands ahead
    exts: dict[int, list[list[ExpLeg]]] = {}
    max_lead = 0
    for idx, e in enumerate(exps):
        ei = [oi for oi, _, _, _ in e]
        for e2 in exps:
            if len(e2) > len(e) and [oi for oi, _, _, _ in e2[: len(e)]] == ei:
                exts.setdefault(idx, []).append(e2[len(e) :])
                max_lead = max(max_lead, len(e2) - len(e))
    w_isl = Window.partitionBy(*keys).orderBy("__island")
    base = ["__lab", "__n"] + [f"__a_{name}" for name in island_aggs]
    proj: list[Column] = [F.col(c) for c in segs.columns]
    for off in range(1, max_len):
        proj += [
            F.lag(c, off).over(w_isl).alias(f"__lag{off}_{c}") for c in base
        ]
    for d in range(1, max_lead + 1):
        # lead columns ride the SAME island window — no extra shuffle
        proj += [
            F.lag(c, -d).over(w_isl).alias(f"__lead{d}_{c}")
            for c in ("__lab", "__n")
        ]
    lagged = segs.select(*proj)

    def at(off: int, c: str) -> Column:
        return F.col(c) if off == 0 else F.col(f"__lag{off}_{c}")

    def ahead(d: int, c: str) -> Column:
        return F.col(f"__lead{d}_{c}")

    expi = None
    for idx, e in enumerate(exps):
        cond = F.lit(True)
        for j, (_oi, lab, lo, hi) in enumerate(e):
            cond = cond & _leg_cond(at, len(e) - 1 - j, lab, lo, hi)
        for ext in exts.get(idx, ()):
            ext_cond = F.lit(True)
            for d, (_oi, lab, lo, hi) in enumerate(ext, start=1):
                ext_cond = ext_cond & _leg_cond(
                    lambda off, c, d=d: ahead(d, c), 0, lab, lo, hi
                )
            cond = cond & ~F.coalesce(ext_cond, F.lit(False))
        expi = (
            F.when(cond, F.lit(idx))
            if expi is None
            else expi.when(cond, F.lit(idx))
        )
    matched = lagged.withColumn("__expi", expi)
    if with_match_no:
        matched = matched.withColumn(
            "__mn",
            F.sum(
                F.when(F.col("__expi").isNotNull(), 1).otherwise(0)
            ).over(w_isl.rowsBetween(Window.unboundedPreceding, 0)),
        )
    matched = matched.filter(F.col("__expi").isNotNull())
    out_cols: list[Column] = [F.col(c) for c in keys]
    for i in range(k):
        for c, out_name in [("__n", f"seg{i}_n")] + [
            (f"__a_{name}", f"seg{i}_{name}") for name in island_aggs
        ]:
            chain = None
            for idx, e in enumerate(exps):
                for j, (oi, _lab, _lo, _hi) in enumerate(e):
                    if oi == i:
                        cnd = F.col("__expi") == idx
                        v = at(len(e) - 1 - j, c)
                        chain = (
                            F.when(cnd, v)
                            if chain is None
                            else chain.when(cnd, v)
                        )
            col = chain if chain is not None else F.lit(None)
            out_cols.append(col.alias(out_name))
    if with_match_no:
        out_cols.append(F.col("__mn").cast("long").alias("match_no"))
    return matched.select(*out_cols)


def match_runs_sequential(
    df: DataFrame,
    key: str | list[str],
    order: list[str],
    label: Column,
    pattern,
    island_aggs: dict[str, Column],
    with_match_no: bool = False,
    skip_to_first: "str | None" = None,
) -> DataFrame:
    """The documented escape hatch for patterns ``match_runs`` rejects
    as self-overlapping (label sequences with a nontrivial border /
    cross-expansion overlap — the W-shape), where SKIP PAST LAST ROW
    is inherently a sequential greedy scan. Same contract, quantifier
    support, and output schema as ``match_runs``; the island-
    granularity exactness rules (adjacent-distinct labels, unbounded
    max on end legs) apply identically.

    ``skip_to_first=<label>`` switches AFTER MATCH SKIP PAST LAST ROW
    to the ISO AFTER MATCH SKIP TO FIRST <label> mode: after a match,
    scanning resumes AT the first row mapped to <label> — which is an
    island START (the leg consumed its whole maximal run), so the
    resumption is island-exact; successive matches may then share a
    tail/head (chained shapes). ISO's no-progress rule is enforced
    statically: every expansion must carry <label> on a NON-FIRST leg
    (a first-leg target would restart at the match start — ISO's
    runtime error — and a missing target has no resumption point);
    both are rejected loudly. SKIP TO LAST <label> stays unsupported
    everywhere: it resumes at the last row of an island, and a match
    from a mid-island row consumes a PARTIAL first island (the
    exactness rule both matchers reject).

    Realization: the SAME distributed island collapse (the two keyed
    stages — nothing Python touches raw rows), then ONE
    ``applyInPandas`` per key over the ISLAND table running the
    leftmost-greedy non-overlapping occurrence scan (expansions tried
    in the NFA's present-first preference order — at most one can
    label-match at a given start, so the order only breaks
    prefix-nesting ties toward the greedy choice). The Python input
    per key is the run sequence (<= rows, typically far fewer),
    Arrow-batched — the Pandas-UDF path the engine reserves for
    operators whose semantics Spark's declarative layer genuinely
    cannot express (iterative greedy consumption).

    Scale notes (100 TB): one shuffle on the (growing) key for the
    windows, one more for the grouping; the applyInPandas grouping is
    BUCKETED (xxhash64(key) mod 256, whole keys per bucket, the
    per-key scan running pandas-side inside each bucket) so Python
    invocations number n_buckets, not |keys| — the per-key invocation
    floor measured ~0.5 ms on the 100× replica before bucketing (79 s
    for 150k users; ~11 s after). Per-key island sequences are bounded
    by the key's row share, exactly like any per-key window. For
    overlap-free patterns prefer ``match_runs`` — measured equal
    results (property-tested), all-JVM plan.
    """
    import pandas as pd
    from pyspark.sql import types as T

    elements = _normalize(pattern)
    exps = _expansions(elements, "match_runs_sequential")
    if skip_to_first is not None:
        for e in exps:
            js = [j for j, (_oi, lab, _lo, _hi) in enumerate(e)
                  if lab == skip_to_first]
            if not js:
                raise ValueError(
                    "match_runs_sequential: SKIP TO FIRST "
                    f"{skip_to_first!r} — the label is absent from the "
                    f"expansion {[l for _, l, _, _ in e]}, so a match "
                    "through it would have no resumption row (ISO "
                    "raises at runtime; rejected statically — make "
                    "the target leg mandatory in every branch)"
                )
            if js[0] == 0:
                raise ValueError(
                    "match_runs_sequential: SKIP TO FIRST "
                    f"{skip_to_first!r} would resume at the match's "
                    "own start row (the ISO no-progress error) — the "
                    "target must be a non-first leg in every expansion"
                )
    keys = [key] if isinstance(key, str) else list(key)
    segs = _islands(df, keys, order, label, island_aggs)
    k = len(flatten(elements))
    agg_names = list(island_aggs)
    fields = [segs.schema[c] for c in keys]
    for i in range(k):
        fields.append(T.StructField(f"seg{i}_n", T.LongType()))
        fields += [
            T.StructField(
                f"seg{i}_{name}", segs.schema[f"__a_{name}"].dataType
            )
            for name in agg_names
        ]
    if with_match_no:
        fields.append(T.StructField("match_no", T.LongType()))
    schema = T.StructType(fields)
    cols = [f.name for f in fields]

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[dict] = []
        pdf = pdf.sort_values([*keys, "__island"])
        # dropna=False: the Spark window path groups NULL keys together
        # and can emit matches for them; pandas groupby defaults to
        # dropping NULL-key groups, which would silently diverge from
        # match_runs' contract (r11 ADVICE).
        for kv, g in pdf.groupby(keys, sort=False, dropna=False):
            kt = kv if isinstance(kv, tuple) else (kv,)
            krec = dict(zip(keys, kt))
            labs = g["__lab"].tolist()
            ns = g["__n"].tolist()
            aggl = {
                name: g[f"__a_{name}"].tolist() for name in agg_names
            }
            i = 0
            mn = 0
            while i < len(labs):
                hit = None
                for e in exps:  # present-first greedy preference
                    L = len(e)
                    if i + L > len(labs):
                        continue
                    if all(
                        labs[i + j] == lab
                        and ns[i + j] >= lo
                        and (hi is None or ns[i + j] <= hi)
                        for j, (_oi, lab, lo, hi) in enumerate(e)
                    ):
                        hit = e
                        break
                if hit is None:
                    i += 1
                    continue
                rec = dict(krec)
                # explicit None for every absent leg: pandas would
                # otherwise NaN-fill missing dict keys, collapsing an
                # all-absent timestamp seg to float64, which Arrow
                # cannot cast to timestamp (surfaced by PERMUTE at
                # sf0.01 — one bucket's matches all took one branch)
                for oi2 in range(k):
                    rec[f"seg{oi2}_n"] = None
                    for name in agg_names:
                        rec[f"seg{oi2}_{name}"] = None
                for j, (oi, _lab, _lo, _hi) in enumerate(hit):
                    rec[f"seg{oi}_n"] = ns[i + j]
                    for name in agg_names:
                        rec[f"seg{oi}_{name}"] = aggl[name][i + j]
                mn += 1
                if with_match_no:
                    rec["match_no"] = mn
                out.append(rec)
                if skip_to_first is not None:
                    # resume AT the first island mapped to the target
                    # label (strictly after i by validation)
                    i += next(
                        j
                        for j, (_oi, lab, _lo, _hi) in enumerate(hit)
                        if lab == skip_to_first
                    )
                else:
                    i += len(hit)  # AFTER MATCH SKIP PAST LAST ROW
        return pd.DataFrame(out, columns=cols)

    bkt = F.pmod(
        F.xxhash64(*[F.col(c) for c in keys]), F.lit(256)
    )
    return (
        segs.withColumn("__bkt", bkt)
        .groupBy("__bkt")
        .applyInPandas(scan_bucket, schema)
    )


def match_runs_all_rows(
    df: DataFrame,
    key: str | list[str],
    order: list[str],
    label: Column,
    pattern,
) -> DataFrame:
    """ISO ALL ROWS PER MATCH for the run-pattern subset: every INPUT
    ROW that participates in a match, carrying ``classifier`` (the
    row's matched label — CLASSIFIER()), ``match_no`` (1-based match
    ordinal per key by match order — MATCH_NUMBER()) and ``leg`` (the
    0-based original pattern position the row's island fills). Rows
    outside any match are omitted (the ISO default; no SHOW EMPTY /
    WITH UNMATCHED options). Same pattern grammar, validation, and
    greedy semantics as ``match_runs`` (overlap-free patterns only —
    self-overlapping patterns raise toward
    ``match_runs_all_rows_sequential``, the bucketed escape hatch
    with the identical output contract).

    Realization, all-JVM: label + island windows on the raw rows; the
    SAME end-anchored lag-chain detection as match_runs on the
    collapsed island table; a cumulative count of match ends gives
    MATCH_NUMBER; each island then finds its match via BOUNDED
    LOOKAHEAD (an island belongs to the match ending d islands ahead
    iff that match's expansion is longer than d — matches never
    overlap, so at most one d fires), and the attributed islands
    equi-join back to the raw rows on (key, island). NULL keys join
    null-safely, matching the window path's NULL-key grouping.

    Scale notes (100 TB): two keyed window stages + one co-keyed
    equi join back to the rows — one extra shuffle over match_runs
    (the join's (key, island) re-key); every stage is keyed on the
    growing caller key, no Python anywhere.
    """
    from functools import reduce as _reduce

    elements = _normalize(pattern)
    exps = _expansions(elements, "match_runs_all_rows")
    _check_windows_compilable(exps, "match_runs_all_rows")
    exps = sorted(exps, key=len, reverse=True)
    keys = [key] if isinstance(key, str) else list(key)
    in_cols = df.columns

    w_row = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    rows = df.withColumn("__lab", label)
    rows = rows.withColumn("__prevlab", F.lag("__lab").over(w_row))
    change = (
        F.col("__lab").isNull()
        | F.col("__prevlab").isNull()
        | (F.col("__lab") != F.col("__prevlab"))
    ).cast("long")
    rows = rows.withColumn(
        "__island",
        F.sum(change).over(w_row.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__prevlab")

    segs = rows.groupBy(*keys, "__island").agg(
        F.first("__lab").alias("__lab"),
        F.count(F.lit(1)).alias("__n"),
    )
    k_max = max(len(e) for e in exps)
    exts: dict[int, list[list[ExpLeg]]] = {}
    max_lead = 0
    for idx, e in enumerate(exps):
        ei = [oi for oi, _, _, _ in e]
        for e2 in exps:
            if len(e2) > len(e) and [oi for oi, _, _, _ in e2[: len(e)]] == ei:
                exts.setdefault(idx, []).append(e2[len(e) :])
                max_lead = max(max_lead, len(e2) - len(e))
    w_isl = Window.partitionBy(*keys).orderBy("__island")
    proj: list[Column] = [F.col(c) for c in segs.columns]
    for off in range(1, k_max):
        proj += [
            F.lag(c, off).over(w_isl).alias(f"__lag{off}_{c}")
            for c in ("__lab", "__n")
        ]
    for d in range(1, max_lead + 1):
        proj += [
            F.lag(c, -d).over(w_isl).alias(f"__lead{d}_{c}")
            for c in ("__lab", "__n")
        ]
    lagged = segs.select(*proj)

    def at(off: int, c: str) -> Column:
        return F.col(c) if off == 0 else F.col(f"__lag{off}_{c}")

    expi = None
    for idx, e in enumerate(exps):
        cond = F.lit(True)
        for j, (_oi, lab, lo, hi) in enumerate(e):
            cond = cond & _leg_cond(at, len(e) - 1 - j, lab, lo, hi)
        for ext in exts.get(idx, ()):
            ext_cond = F.lit(True)
            for d, (_oi, lab, lo, hi) in enumerate(ext, start=1):
                ext_cond = ext_cond & _leg_cond(
                    lambda off, c, d=d: F.col(f"__lead{d}_{c}"),
                    0,
                    lab,
                    lo,
                    hi,
                )
            cond = cond & ~F.coalesce(ext_cond, F.lit(False))
        expi = (
            F.when(cond, F.lit(idx))
            if expi is None
            else expi.when(cond, F.lit(idx))
        )
    det = lagged.withColumn("__expi", expi).withColumn(
        "__mn",
        F.sum(
            F.when(F.col("__expi").isNotNull(), 1).otherwise(0)
        ).over(w_isl.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # attribution: island i belongs to the match ending d islands ahead
    # iff that end's expansion spans more than d islands (matches are
    # disjoint, so at most one d fires)
    det_cols = [F.col(c) for c in det.columns]
    for d in range(1, k_max):
        det_cols += [
            F.lag(F.col(c), -d).over(w_isl).alias(f"__mlead{d}_{c}")
            for c in ("__expi", "__mn")
        ]
    det = det.select(*det_cols)

    def fwd(d: int, c: str) -> Column:
        return F.col(c) if d == 0 else F.col(f"__mlead{d}_{c}")

    mno = None
    leg = None
    for d in range(k_max):
        for idx, e in enumerate(exps):
            if len(e) <= d:
                continue
            cnd = fwd(d, "__expi") == idx
            oi = e[len(e) - 1 - d][0]
            mno = (
                F.when(cnd, fwd(d, "__mn"))
                if mno is None
                else mno.when(cnd, fwd(d, "__mn"))
            )
            leg = (
                F.when(cnd, F.lit(oi))
                if leg is None
                else leg.when(cnd, F.lit(oi))
            )
    attributed = (
        det.withColumn("__match_no", mno)
        .withColumn("__leg", leg)
        .filter(F.col("__match_no").isNotNull())
        .select(*keys, "__island", "__match_no", "__leg")
        .alias("att")
    )
    r = rows.alias("r")
    jc = _reduce(
        lambda a, b: a & b,
        [F.col(f"r.{c}").eqNullSafe(F.col(f"att.{c}")) for c in keys],
        F.col("r.__island") == F.col("att.__island"),
    )
    return r.join(attributed, jc).select(
        *[F.col(f"r.{c}") for c in in_cols],
        F.col("r.__lab").alias("classifier"),
        F.col("att.__match_no").alias("match_no"),
        F.col("att.__leg").alias("leg"),
    )


def _check_same_start(exps: list[list[ExpLeg]], who: str) -> None:
    """SKIP TO NEXT ROW validation: the greedy NFA yields at most ONE
    match per start row, so two expansions must never both label-match
    at one start unless one is an original-leg PREFIX of the other
    (trailing optionals — the lead lookahead picks the greedy longer
    form). Overlaps at other alignments are FINE here: overlapping
    matches are the point of this skip mode."""
    for p in exps:
        for q in exps:
            if p is q:
                continue
            n = min(len(p), len(q))
            if [oi for oi, *_ in p[:n]] == [oi for oi, *_ in q[:n]]:
                continue
            if all(
                p[i][1] == q[i][1] for i in range(n)
            ):
                raise ValueError(
                    f"{who}: expansions "
                    f"{[l for _, l, _, _ in p]} and "
                    f"{[l for _, l, _, _ in q]} can both match at one "
                    "start row (label-consistent same-start alignment "
                    "across different branches) — ordered-choice "
                    "resolution with differing shared-prefix bounds "
                    "is sequential state; restructure the branches"
                )


def match_runs_overlapping(
    df: DataFrame,
    key: str | list[str],
    order: list[str],
    label: Column,
    pattern,
    island_aggs: dict[str, Column],
    with_match_no: bool = False,
) -> DataFrame:
    """ISO AFTER MATCH SKIP TO NEXT ROW, all-JVM: one row per (start
    row, greedy match) — matches MAY overlap, and every input row from
    which the greedy NFA matches emits exactly one. Same pattern
    grammar and output schema as ``match_runs``; ``match_no`` numbers
    matches per key in start-row order (the ISO MATCH_NUMBER() for
    this skip mode).

    Dropping non-overlap REMOVES the border restriction entirely —
    self-overlapping patterns (W-shapes, many PERMUTEs) compile here
    with no sequential escape hatch, because end-anchored detection
    enumerates ALL matches, which is exactly this mode's semantics.
    What changes vs SKIP PAST LAST:

      - a match may start MID-island (the greedy first leg consumes
        the start row's island SUFFIX), so each detected island-level
        match explodes into one row per valid start: the first-leg
        island's rows join back and carry reverse-running (suffix)
        aggregates over the SAME (key, island) grouping — exact
        first-leg measures per start row, pure window functions;
      - a finite max bound is therefore allowed on the FIRST leg (it
        filters which start rows qualify: lo <= remaining <= hi); the
        LAST leg still needs an unbounded max (greedy would consume a
        partial island there — rejected loudly, as in match_runs);
      - several expansions may end at ONE island (same-end nesting
        with different starts — under this mode both are real
        matches), so detection emits per-expansion structs exploded
        from an array, not an exclusive when-chain; the only
        ambiguity that must not exist is two expansions matching at
        one START (checked, with the original-leg-prefix lookahead
        resolving trailing-optional nesting toward the greedy form).

    Scale notes (100 TB): the label/island windows and the lag-chain
    detection are the same keyed stages as match_runs; the start
    explosion is ONE co-keyed equi join (key, island) of detected
    matches back to first-leg rows plus suffix windows over the same
    partitioning — one extra shuffle, output bounded by (matches ×
    first-leg rows) which is the answer size itself. No Python
    anywhere, for ANY accepted pattern (no sequential fallback
    needed in this mode).
    """
    from functools import reduce as _reduce

    who = "match_runs_overlapping"
    elements = _normalize(pattern)
    exps = _expansions(elements, who, bounded_ends=(-1,))
    _check_same_start(exps, who)
    exps = sorted(exps, key=len, reverse=True)
    keys = [key] if isinstance(key, str) else list(key)
    flat = flatten(elements)
    k = len(flat)
    agg_names = list(island_aggs)

    # rows with island ids (the all_rows realization keeps the rows)
    w_row = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    rows = df.withColumn("__lab", label)
    rows = rows.withColumn("__prevlab", F.lag("__lab").over(w_row))
    change = (
        F.col("__lab").isNull()
        | F.col("__prevlab").isNull()
        | (F.col("__lab") != F.col("__prevlab"))
    ).cast("long")
    rows = rows.withColumn(
        "__island",
        F.sum(change).over(w_row.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__prevlab")

    segs = rows.groupBy(*keys, "__island").agg(
        F.first("__lab").alias("__lab"),
        F.count(F.lit(1)).alias("__n"),
        *[c.alias(f"__a_{name}") for name, c in island_aggs.items()],
    )
    max_len = max(len(e) for e in exps)
    # trailing-optional prefix nesting -> greedy lookahead suppression
    exts: dict[int, list[list[ExpLeg]]] = {}
    max_lead = 0
    for idx, e in enumerate(exps):
        ei = [oi for oi, _, _, _ in e]
        for e2 in exps:
            if len(e2) > len(e) and [oi for oi, _, _, _ in e2[: len(e)]] == ei:
                exts.setdefault(idx, []).append(e2[len(e) :])
                max_lead = max(max_lead, len(e2) - len(e))
    w_isl = Window.partitionBy(*keys).orderBy("__island")
    base = ["__lab", "__n"] + [f"__a_{name}" for name in agg_names]
    proj: list[Column] = [F.col(c) for c in segs.columns]
    for off in range(1, max_len):
        proj += [
            F.lag(c, off).over(w_isl).alias(f"__lag{off}_{c}") for c in base
        ]
    for d in range(1, max_lead + 1):
        proj += [
            F.lag(c, -d).over(w_isl).alias(f"__lead{d}_{c}")
            for c in ("__lab", "__n")
        ]
    lagged = segs.select(*proj)

    def at(off: int, c: str) -> Column:
        return F.col(c) if off == 0 else F.col(f"__lag{off}_{c}")

    # per-expansion detection structs (several may fire at one end)
    structs: list[Column] = []
    for idx, e in enumerate(exps):
        L = len(e)
        first_oi, _first_lab, first_lo, first_hi = e[0]
        cond = F.lit(True)
        for j, (_oi, lab, lo, hi) in enumerate(e):
            off = L - 1 - j
            if j == 0:
                # island-level: label + existence of a valid start
                # (remaining ranges 1..n, so one exists iff n >= lo);
                # the per-start [lo, hi] filter happens after the join
                c = at(off, "__lab") == lab
                if lo > 1:
                    c = c & (at(off, "__n") >= lo)
                cond = cond & c
            else:
                cond = cond & _leg_cond(at, off, lab, lo, hi)
        for ext in exts.get(idx, ()):
            ext_cond = F.lit(True)
            for d, (_oi, lab, lo, hi) in enumerate(ext, start=1):
                ext_cond = ext_cond & _leg_cond(
                    lambda off, c, d=d: F.col(f"__lead{d}_{c}"), 0, lab, lo, hi
                )
            cond = cond & ~F.coalesce(ext_cond, F.lit(False))
        fields = [
            F.lit(idx).alias("expi"),
            (F.col("__island") - F.lit(L - 1)).alias("start_isl"),
            F.lit(first_oi).alias("first_oi"),
            F.lit(first_lo).alias("lo1"),
            F.lit(first_hi).cast("long").alias("hi1"),
        ]
        of_leg = {oi: j for j, (oi, _, _, _) in enumerate(e)}
        for i in range(k):
            j = of_leg.get(i)
            if j is None or j == 0:
                fields.append(F.lit(None).cast("long").alias(f"n_{i}"))
                for name in agg_names:
                    fields.append(
                        F.lit(None)
                        .cast(segs.schema[f"__a_{name}"].dataType)
                        .alias(f"a_{i}_{name}")
                    )
            else:
                off = L - 1 - j
                fields.append(at(off, "__n").alias(f"n_{i}"))
                for name in agg_names:
                    fields.append(
                        at(off, f"__a_{name}").alias(f"a_{i}_{name}")
                    )
        structs.append(F.when(cond, F.struct(*fields)))
    det = (
        lagged.withColumn(
            "__m", F.explode(F.array_compact(F.array(*structs)))
        )
        .select(*keys, "__m.*")
        .alias("det")
    )

    # start explosion: join back to the first-leg island's rows, each
    # carrying suffix (start-row .. island end) measures
    w_sfx = (
        Window.partitionBy(*keys, "__island")
        .orderBy(*[F.col(c).desc() for c in order])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rows_sfx = rows.withColumn("__rem", F.count(F.lit(1)).over(w_sfx))
    for name, c in island_aggs.items():
        rows_sfx = rows_sfx.withColumn(f"__sfx_{name}", c.over(w_sfx))
    r = rows_sfx.alias("r")
    jc = _reduce(
        lambda a, b: a & b,
        [F.col(f"r.{c}").eqNullSafe(F.col(f"det.{c}")) for c in keys],
        F.col("r.__island") == F.col("det.start_isl"),
    )
    joined = r.join(det, jc).filter(
        (F.col("r.__rem") >= F.col("det.lo1"))
        & (
            F.col("det.hi1").isNull()
            | (F.col("r.__rem") <= F.col("det.hi1"))
        )
    )
    out_cols: list[Column] = [F.col(f"r.{c}") for c in keys]
    for i in range(k):
        is_first = F.col("det.first_oi") == i
        out_cols.append(
            F.when(is_first, F.col("r.__rem"))
            .otherwise(F.col(f"det.n_{i}"))
            .alias(f"seg{i}_n")
        )
        for name in agg_names:
            out_cols.append(
                F.when(is_first, F.col(f"r.__sfx_{name}"))
                .otherwise(F.col(f"det.a_{i}_{name}"))
                .alias(f"seg{i}_{name}")
            )
    if with_match_no:
        w_mn = Window.partitionBy(
            *[F.col(f"r.{c}") for c in keys]
        ).orderBy(
            F.col("r.__island"), *[F.col(f"r.{c}") for c in order]
        )
        out_cols.append(
            F.row_number().over(w_mn).cast("long").alias("match_no")
        )
    return joined.select(*out_cols)


def match_runs_all_rows_sequential(
    df: DataFrame,
    key: str | list[str],
    order: list[str],
    label: Column,
    pattern,
) -> DataFrame:
    """ISO ALL ROWS PER MATCH for SELF-OVERLAPPING patterns (the ones
    ``match_runs_all_rows`` rejects toward sequential state — W-shapes,
    PERMUTE): the sequential escape hatch's row-level output mode,
    closing the asymmetry documented since r12's all-rows landing.
    Same contract and output schema as ``match_runs_all_rows``
    (input rows + ``classifier`` / ``match_no`` / ``leg``), same
    greedy SKIP PAST LAST semantics as ``match_runs_sequential``.

    Realization: the SAME distributed island collapse; the bucketed
    per-key greedy island scan emits the tiny ATTRIBUTION table
    (key, island, match_no, leg) instead of measures — Python still
    sees runs, never rows — and one co-keyed equi join on
    (key, island) carries the attribution back to the raw rows
    (NULL keys join null-safely, matching the window path).

    Scale notes (100 TB): identical stages to match_runs_sequential
    plus the one join-back shuffle match_runs_all_rows already pays —
    every stage keyed on the growing caller key; the Python stage's
    output is islands-participating-in-matches, bounded by the island
    count, never row-sized.
    """
    from functools import reduce as _reduce

    import pandas as pd
    from pyspark.sql import types as T

    who = "match_runs_all_rows_sequential"
    elements = _normalize(pattern)
    exps = _expansions(elements, who)
    keys = [key] if isinstance(key, str) else list(key)
    in_cols = df.columns

    w_row = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    rows = df.withColumn("__lab", label)
    rows = rows.withColumn("__prevlab", F.lag("__lab").over(w_row))
    change = (
        F.col("__lab").isNull()
        | F.col("__prevlab").isNull()
        | (F.col("__lab") != F.col("__prevlab"))
    ).cast("long")
    rows = rows.withColumn(
        "__island",
        F.sum(change).over(w_row.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__prevlab")

    segs = rows.groupBy(*keys, "__island").agg(
        F.first("__lab").alias("__lab"),
        F.count(F.lit(1)).alias("__n"),
    )
    fields = [segs.schema[c] for c in keys]
    fields += [
        T.StructField("__island", T.LongType()),
        T.StructField("__match_no", T.LongType()),
        T.StructField("__leg", T.IntegerType()),
    ]
    schema = T.StructType(fields)
    cols = [f.name for f in fields]

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[dict] = []
        pdf = pdf.sort_values([*keys, "__island"])
        for kv, g in pdf.groupby(keys, sort=False, dropna=False):
            kt = kv if isinstance(kv, tuple) else (kv,)
            krec = dict(zip(keys, kt))
            labs = g["__lab"].tolist()
            ns = g["__n"].tolist()
            isls = g["__island"].tolist()
            i = 0
            mn = 0
            while i < len(labs):
                hit = None
                for e in exps:  # present-first greedy preference
                    L = len(e)
                    if i + L > len(labs):
                        continue
                    if all(
                        labs[i + j] == lab
                        and ns[i + j] >= lo
                        and (hi is None or ns[i + j] <= hi)
                        for j, (_oi, lab, lo, hi) in enumerate(e)
                    ):
                        hit = e
                        break
                if hit is None:
                    i += 1
                    continue
                mn += 1
                for j, (oi, _lab, _lo, _hi) in enumerate(hit):
                    rec = dict(krec)
                    rec["__island"] = isls[i + j]
                    rec["__match_no"] = mn
                    rec["__leg"] = oi
                    out.append(rec)
                i += len(hit)  # AFTER MATCH SKIP PAST LAST ROW
        return pd.DataFrame(out, columns=cols)

    bkt = F.pmod(F.xxhash64(*[F.col(c) for c in keys]), F.lit(256))
    att = (
        segs.withColumn("__bkt", bkt)
        .groupBy("__bkt")
        .applyInPandas(scan_bucket, schema)
        .alias("att")
    )
    r = rows.alias("r")
    jc = _reduce(
        lambda a, b: a & b,
        [F.col(f"r.{c}").eqNullSafe(F.col(f"att.{c}")) for c in keys],
        F.col("r.__island") == F.col("att.__island"),
    )
    return r.join(att, jc).select(
        *[F.col(f"r.{c}") for c in in_cols],
        F.col("r.__lab").alias("classifier"),
        F.col("att.__match_no").alias("match_no"),
        F.col("att.__leg").alias("leg"),
    )
