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


_tok = st.sampled_from(["a", "b", "c", "d"])  # tiny alphabet → repeats common


@given(docs=st.lists(st.lists(_tok, min_size=5, max_size=20), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_repetition_metrics_match_python_reference(spark, docs):
    """l23's in-row higher-order-function metrics == a pure-Python
    reference (Counter-based) on randomized token streams — evidence
    independent of the DuckDB oracle."""
    from collections import Counter

    from pyspark.sql import functions as F

    from nipd_spark.operators import text

    pdf = pd.DataFrame(
        {"doc_id": range(len(docs)), "text": [" ".join(d) for d in docs]}
    )
    sdf = spark.createDataFrame(pdf)

    def gram_counts(g):
        return F.transform(
            F.array_distinct(g), lambda x: F.size(F.filter(g, lambda y: y == x))
        )

    g2 = text.shingles(F.col("text"), 2)
    g5 = text.shingles(F.col("text"), 5)
    got = {
        r.doc_id: (r.top2, r.dup5)
        for r in sdf.select(
            "doc_id",
            (F.array_max(gram_counts(g2)).cast("double") / F.size(g2)).alias("top2"),
            (
                F.aggregate(
                    F.filter(gram_counts(g5), lambda c: c > 1),
                    F.lit(0),
                    lambda a, c: a + c,
                ).cast("double")
                / F.size(g5)
            ).alias("dup5"),
        ).collect()
    }
    for i, toks in enumerate(docs):
        two = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        five = [" ".join(toks[j : j + 5]) for j in range(len(toks) - 4)]
        c2, c5 = Counter(two), Counter(five)
        exp_top2 = max(c2.values()) / len(two)
        exp_dup5 = sum(c for c in c5.values() if c > 1) / len(five)
        assert abs(got[i][0] - exp_top2) < 1e-12, (i, toks)
        assert abs(got[i][1] - exp_dup5) < 1e-12, (i, toks)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=30),
    budget=st.sampled_from([64, 512, 1000]),
)
@settings(**_SETTINGS)
def test_sequence_packing_matches_python_reference(spark, sizes, budget):
    """The packing rule (doc joins the sequence where its cumsum span
    begins) == a sequential Python fold, per bucket, at any budget —
    including docs larger than the budget (span straddles)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(sizes)),
            "bucket": [i % 3 for i in range(len(sizes))],
            "n": sizes,
        }
    )
    sdf = spark.createDataFrame(pdf)
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r.doc_id: r.seq_id
        for r in sdf.select(
            "doc_id", ((F.sum("n").over(w) - F.col("n")) / budget).cast("long").alias("seq_id")
        ).collect()
    }
    for b in set(pdf.bucket):
        cum = 0
        for _, row in pdf[pdf.bucket == b].iterrows():
            assert got[row.doc_id] == cum // budget, (b, row.doc_id)
            cum += row.n


@given(
    docs=st.lists(
        st.lists(_tok, min_size=0, max_size=12), min_size=1, max_size=6
    ),
    n=st.integers(min_value=2, max_value=5),
)
@settings(**_SETTINGS)
def test_shingles_match_python_reference(spark, docs, n):
    """operators/text.shingles (folded zip_with form) == the obvious
    Python sliding-window reference on randomized token lists, for all
    gram sizes — including docs shorter than n (empty array) and the
    n-1 trailing positions the null-padding must cut."""
    from pyspark.sql import functions as F

    from nipd_spark.operators.text import shingles

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r.i: r.s
        for r in df.select("i", shingles(F.col("text"), n).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        want = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        assert got[i] == want, (n, toks, got[i], want)


@given(
    tgt=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 3)), st.integers(0, 9)),
        min_size=0, max_size=10,
    ),
    src=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 3)), st.integers(0, 9)),
        min_size=0, max_size=10,
    ),
)
@settings(**_SETTINGS)
def test_merge_into_matches_duckdb(spark, tgt, src):
    """merge_into (update matched + insert not-matched, null-safe keys)
    == the ANSI desugaring in DuckDB (LEFT JOIN update + NOT EXISTS
    insert with IS NOT DISTINCT FROM), on randomized micro-tables with
    NULL keys and duplicate target keys. Source is pre-reduced to one
    row per key (the MERGE cardinality rule)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from nipd_spark.operators.merge import merge_into

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType(), True),
            T.StructField("v", T.IntegerType(), False),
        ]
    )
    tpdf = pd.DataFrame(tgt, columns=["k", "v"]).astype({"v": "int32"})
    spdf = pd.DataFrame(src, columns=["k", "v"]).astype({"v": "int32"})
    # unique source keys: keep the max v per key (NULL is a key too)
    spdf = spdf.groupby(["k"], dropna=False, as_index=False).max()

    tdf = spark.createDataFrame(tpdf, schema)
    sdf = spark.createDataFrame(spdf, schema)
    got = sorted(
        [
            (r.k, r.v)
            for r in merge_into(
                tdf,
                sdf,
                on=["k"],
                when_matched={"v": F.col("s.v")},
                when_not_matched={"k": F.col("s.k"), "v": F.col("s.v")},
            ).collect()
        ],
        key=lambda x: (x[0] is None, x),
    )

    con = duckdb.connect()
    con.register("t", tpdf)
    con.register("s", spdf)
    want = sorted(
        ((k if pd.notna(k) else None, int(v)) for k, v in con.execute(
            """
            SELECT t.k, CASE WHEN s.k IS NOT NULL OR s.v IS NOT NULL
                             THEN s.v ELSE t.v END AS v
            FROM t LEFT JOIN s ON t.k IS NOT DISTINCT FROM s.k
            UNION ALL
            SELECT s.k, s.v FROM s
            WHERE NOT EXISTS
              (SELECT 1 FROM t WHERE t.k IS NOT DISTINCT FROM s.k)
            """
        ).fetchall()),
        key=lambda x: (x[0] is None, x),
    )
    assert got == want


@given(
    vals=st.lists(st.integers(-5, 5), min_size=1, max_size=25),
    k=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_ranks_match_window_forms(spark, vals, k):
    """with_global_rn / with_global_running_sum / ntile_from_rn ==
    the Window.orderBy forms on randomized micro-tables: duplicate
    keys, negatives, all-equal corpora (single-bucket degenerate), and
    n < k ntile (the lazy otherwise-branch / ANSI-division edge)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nipd_spark.operators import ranks

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid: long, v: long")
    w = Window.orderBy(F.col("v").asc(), F.col("rid").asc())
    want = {
        (r.rid): (r.rn, r.run, r.t)
        for r in df.select(
            "rid",
            F.row_number().over(w).alias("rn"),
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("run"),
            F.ntile(k).over(w).alias("t"),
        ).collect()
    }
    n = len(vals)
    got_df = ranks.with_global_rn(
        df, key="v", tiebreaks=["rid"], n_buckets=4
    )
    got_df = ranks.with_global_running_sum(
        got_df, key="v", tiebreaks=["rid"], val="v", n_buckets=4, out="run"
    ).select(
        "rid",
        "rn",
        "run",
        ranks.ntile_from_rn(k, F.col("rn"), F.lit(n)).alias("t"),
    )
    got = {r.rid: (r.rn, r.run, r.t) for r in got_df.collect()}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("AB"), st.integers(-3, 3)),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_grouped_avg_rank_map_matches_python_reference(spark, rows):
    """grouped_avg_rank_map == the from-scratch tie-averaged rank on
    randomized micro-tables: heavy ties (7-value domain), all-equal
    groups (single-bucket degenerate), singleton groups. Exact
    equality — ranks are integer + half-integer, never approximate."""
    from nipd_spark.operators.ranks import grouped_avg_rank_map

    data = [(g, float(v), i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g: string, v: double, rid: long")

    want = {}
    for g in {g for g, _, _ in data}:
        vs = sorted(v for gg, v, _ in data if gg == g)
        for v in set(vs):
            lt = sum(1 for x in vs if x < v)
            eq = vs.count(v)
            want[(g, v)] = lt + (eq + 1) / 2.0
    got = {
        (r.g, r.v): r.ar
        for r in grouped_avg_rank_map(
            df, "g", "v", out="ar", n_buckets=4
        ).collect()
    }
    assert got == want


def test_hwe_chi2_matches_numpy_reference(spark, sf_dir):
    """c31's post-aggregation chi-square arithmetic equals an
    independent numpy computation of the textbook formula (not just the
    DuckDB twin, which shares the expression shape)."""
    import numpy as np

    from nipd_spark.queries.composites import c31_hardy_weinberg

    rows = c31_hardy_weinberg(spark, sf_dir).collect()
    assert rows
    checked = 0
    for r in rows[:200]:
        n = r.n0 + r.n1 + r.n2
        p = (2 * r.n0 + r.n1) / (2 * n)
        if p in (0.0, 1.0):
            assert r.chi2 is None
            continue
        exp = np.array([n * p * p, n * 2 * p * (1 - p), n * (1 - p) * (1 - p)])
        obs = np.array([r.n0, r.n1, r.n2], dtype=float)
        ref = float(((obs - exp) ** 2 / exp).sum())
        assert abs(r.chi2 - ref) < 1e-9 * max(1.0, ref)
        assert r.out_of_hwe == (r.chi2 > 3.841)
        checked += 1
    assert checked > 0


def test_ld_r2_in_unit_interval_and_matches_reference(spark, sf_dir):
    """c32's r² lies in [0, 1] and equals the D²/(pAqApBqB) reference
    recomputed independently from the reported frequencies."""
    from nipd_spark.queries.composites import c32_ld_r2

    rows = c32_ld_r2(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.r2 is not None:
            assert -1e-12 <= r.r2 <= 1 + 1e-12


def test_assoc_chi2_matches_contingency_reference(spark, sf_dir):
    """c33's shortcut N(ad-bc)²/margins equals the textbook
    Σ(obs-exp)²/exp over the four 2x2 cells (independent
    factorization; scipy's chi2_contingency(correction=False) where
    available)."""
    import numpy as np

    from nipd_spark.queries.composites import c33_assoc_chi2

    rows = c33_assoc_chi2(spark, sf_dir).collect()
    assert rows
    checked = 0
    for r in rows[:200]:
        obs = np.array([[r.a, r.b], [r.c, r.d]], dtype=float)
        n = obs.sum()
        exp = np.outer(obs.sum(1), obs.sum(0)) / n
        if (exp == 0).any():
            assert r.chi2 is None
            continue
        ref = float(((obs - exp) ** 2 / exp).sum())
        try:
            from scipy.stats import chi2_contingency

            ref_scipy = chi2_contingency(obs, correction=False)[0]
            assert abs(ref - ref_scipy) < 1e-9 * max(1.0, ref)
        except ImportError:
            pass
        assert abs(r.chi2 - ref) < 1e-9 * max(1.0, ref)
        checked += 1
    assert checked > 0


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # group
            st.integers(min_value=0, max_value=9),  # value
            st.integers(min_value=1, max_value=50),  # weight (cents)
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(**_SETTINGS)
def test_weighted_median_matches_python_reference(spark, rows):
    """a31's window-cumsum lower weighted median equals the direct
    definition (smallest value whose cumulative weight, in value order,
    reaches half the total) on randomized micro-groups with ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(g, v, w, i) for i, (g, v, w) in enumerate(rows)],
        "g int, v int, wt long, rid long",
    )
    wrun = Window.partitionBy("g").orderBy("v", "rid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("g")
    got = {
        r.g: r.wm
        for r in df.select(
            "g",
            "v",
            F.sum("wt").over(wrun).alias("cw"),
            F.sum("wt").over(wall).alias("total"),
        )
        .groupBy("g")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("total"), F.col("v"))).alias(
                "wm"
            )
        )
        .collect()
    }
    import collections

    by_g = collections.defaultdict(list)
    for i, (g, v, w) in enumerate(rows):
        by_g[g].append((v, i, w))
    for g, items in by_g.items():
        total = sum(w for _, _, w in items)
        cum = 0
        ref = None
        for v, _, w in sorted(items):
            cum += w
            if 2 * cum >= total:
                ref = v
                break
        assert got[g] == ref, (g, got[g], ref, items)


# --- prefix-filter join under randomized duplication -----------------

_words = st.sampled_from(["a", "b", "c", "d", "e"])


@given(
    bases=st.lists(
        st.lists(_words, min_size=3, max_size=8), min_size=2, max_size=6
    ),
    dups=st.lists(st.integers(min_value=1, max_value=3), min_size=6, max_size=6),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_filter_collapse_expand_equals_brute(spark, bases, dups):
    """l61's full pipeline (collapse_expand envelope + df-ordered prefix
    join + candidate-driven verify) must equal brute-force exact
    Jaccard >= 0.5 over ALL co-shingled pairs on corpora with random
    byte-identical duplication — the contract the r6 refactor moved
    into a shared operator. Tiny 5-word vocabulary makes hot shingles
    and threshold-straddling pairs common."""
    from nipd_spark.operators import minhash
    from nipd_spark.queries import dedup as dmod
    from pyspark.sql import functions as F

    rows, did = [], 0
    for i, toks in enumerate(bases):
        for _ in range(dups[i % len(dups)]):
            rows.append((did, " ".join(toks)))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = minhash.doc_shingles(docs, 3)
    brute = {
        (r.a_id, r.b_id, r.n_inter)
        for r in minhash.exact_jaccard(sh)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }

    orig_load = dmod.load
    dmod.load = lambda _s, _d, _t: docs
    try:
        got = {
            (r.a_id, r.b_id, r.n_inter)
            for r in dmod.l61_prefix_filter_join(spark, "ignored").collect()
        }
    finally:
        dmod.load = orig_load
    assert got == brute


@given(
    counts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # pid
            st.integers(min_value=0, max_value=9),   # key id (collisions common)
            st.integers(min_value=1, max_value=50),  # local count
        ),
        min_size=1,
        max_size=24,
    ),
    m=st.integers(min_value=1, max_value=4),
    k=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_certified_topk_always_exact(spark, counts, m, k):
    """a17's _certified_topk_from_partials must equal the brute-force
    GROUP BY top-k for ANY partial distribution and any (m, k) — the
    certificate may only choose BETWEEN two exact plans, never change
    the answer. Randomized pids/keys/counts with tiny m force both the
    fallback (flat, certificate fails) and fast (skewed head) branches
    across examples."""
    import pyspark.sql.functions as F

    from nipd_spark.queries.aggregates import _certified_topk_from_partials

    # collapse duplicate (pid, key) to one row: the helper's contract is
    # per-partition PARTIALS (one row per key per partition)
    agg: dict[tuple[int, str], int] = {}
    for pid, kid, c in counts:
        agg[(pid, f"k{kid}")] = agg.get((pid, f"k{kid}"), 0) + c
    rows = [(p, key, c) for (p, key), c in agg.items()]
    local = spark.createDataFrame(rows, "pid int, tok string, c long")
    got = [
        tuple(r)
        for r in _certified_topk_from_partials(local, "tok", m, k).collect()
    ]
    want = [
        tuple(r)
        for r in local.groupBy("tok")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(k)
        .collect()
    ]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # query_id: few, collide
            st.integers(min_value=0, max_value=25),  # doc_id: ties across salts
            st.integers(min_value=-4, max_value=4),  # score: heavy ties
        ),
        min_size=1,
        max_size=50,
    ),
    k=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_salted_topk_matches_plain_window(spark, rows, k):
    """The salted two-level top-k (text_llm._salted_topk — the pattern
    under l62/l65/l65b) must equal the plain per-query window top-k on
    ANY (query_id, doc_id, score) relation: same rows, same rn, same
    (score desc, doc_id asc) total order, including groups with fewer
    than k rows and maximal score ties across salt buckets."""
    from nipd_spark.queries.text_llm import _salted_topk

    data = {(q, d): float(s) for q, d, s in rows}  # unique (q, d)
    df = spark.createDataFrame(
        [(q, d, s) for (q, d), s in data.items()],
        "query_id int, doc_id long, score double",
    )
    got = sorted(
        (r.query_id, r.rn, r.doc_id, r.score)
        for r in _salted_topk(df, k=k).collect()
    )
    want = []
    by_q: dict = {}
    for (q, d), s in data.items():
        by_q.setdefault(q, []).append((d, s))
    for q, items in by_q.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for i, (d, s) in enumerate(items[:k]):
            want.append((q, i + 1, d, s))
    assert got == sorted(want)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=8
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_kneser_ney_matches_reference_on_random_corpora(spark, docs):
    """l67's interpolated-KN scores equal a from-scratch python
    reference on arbitrary corpora over a 4-token alphabet (heavy
    bigram collisions — the regime where discount/continuation terms
    actually move), and every observed context's full-vocab
    distribution sums to 1."""
    import math
    from collections import Counter

    texts = [" ".join(t) for t in docs]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    D = 0.75
    cb: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        for u, w in zip(toks, toks[1:]):
            cb[(u, w)] += 1
    cu: Counter = Counter()
    n1p_fwd: Counter = Counter()
    n1p_back: Counter = Counter()
    for (u, w), c in cb.items():
        cu[u] += c
        n1p_fwd[u] += 1
        n1p_back[w] += 1
    n_types = len(cb)

    def pkn(u, w):
        disc = max(cb.get((u, w), 0) - D, 0.0) / cu[u]
        lam = D * n1p_fwd[u] / cu[u]
        return disc + lam * (n1p_back[w] / n_types)

    for u in cu:
        total = sum(pkn(u, w) for w in n1p_back)
        assert abs(total - 1.0) < 1e-9, (u, total)

    want = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        lps = [math.log(pkn(u, w)) for u, w in zip(toks, toks[1:])]
        want[i] = (len(lps), round(sum(lps) / len(lps), 6))

    import nipd_spark.queries.text_llm as tmod

    orig_load = tmod.load
    tmod.load = lambda _s, _d, _t: sdf
    try:
        got = {
            r.doc_id: (r.n_bigrams, r.avg_logprob)
            for r in tmod.l67_kneser_ney_logprob(spark, "ignored").collect()
        }
    finally:
        tmod.load = orig_load
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) <= 1e-6, (i, got[i], want[i])


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=2, max_size=6),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_train_matches_reference(spark, docs):
    """l31b's learned merge table equals a from-scratch BPE trainer on
    random 2-letter corpora — the regime where merged symbols
    immediately re-collide ('aaaa' → 'aa' pairs) and leftmost-first
    non-overlap semantics decide the counts."""
    from collections import Counter

    texts = [" ".join(ws) for ws in docs]
    wf: Counter = Counter()
    for ws in docs:
        for w in ws:
            if len(w) >= 2:
                wf[w] += 1

    syms = {w: list(w) for w in wf}
    want = []
    for step in range(1, 6):
        counts: Counter = Counter()
        for w, f in wf.items():
            s = syms[w]
            for x, y in zip(s, s[1:]):
                counts[(x, y)] += f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((step, a, b, a + b, n))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    import nipd_spark.queries.text_llm as tmod

    orig_load = tmod.load
    tmod.load = lambda _s, _d, _t: sdf
    try:
        got = [
            (r.step, r.left, r.right, r.merged, r.n)
            for r in tmod.l31b_bpe_train(spark, "ignored").collect()
        ]
    finally:
        tmod.load = orig_load
    assert sorted(got) == sorted(want), (got, want)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_equidepth_histogram_matches_python_reference(spark, vals):
    """a32's bucket assignment floor((rn-1)·8/n) over a deterministic
    unique ordering == a plain-python sorted-list reference, including
    heavy ties (values drawn from a tiny range) and n < 8 (empty
    buckets simply absent)."""
    import nipd_spark.queries.aggregates as amod

    rows = [(float(v), i, 1) for i, v in enumerate(vals)]
    li = spark.createDataFrame(
        rows, "l_extendedprice double, l_orderkey long, l_linenumber int"
    )
    # reference: sort by (v, orderkey), bucket = (i*8)//n
    order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    n = len(vals)
    want: dict = {}
    for pos, i in enumerate(order):
        b = (pos * 8) // n
        c, lo, hi, s = want.get(b, (0, float("inf"), float("-inf"), 0.0))
        want[b] = (
            c + 1, min(lo, float(vals[i])), max(hi, float(vals[i])),
            s + float(vals[i]),
        )
    want = {b: (c, lo, hi, round(s, 2)) for b, (c, lo, hi, s) in want.items()}

    orig_load = amod.load
    amod.load = lambda _s, _d, _t: li
    try:
        got = {
            r.bucket: (r.n_rows, r.lo, r.hi, r.bucket_sum)
            for r in amod.a32_equidepth_histogram(spark, "ignored").collect()
        }
    finally:
        amod.load = orig_load
    assert got == want


@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=700), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_length_bucket_packing_matches_python_reference(spark, lens):
    """l74's per-bucket batch math == a from-scratch reference over
    random document lengths, including the 512-token cap boundary."""
    import math

    import nipd_spark.queries.text_llm as tmod

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * w)) for i, w in enumerate(lens)],
        "doc_id long, text string",
    )
    want: dict = {}
    for w in lens:
        we = min(w, 512)
        bl = math.ceil(we / 64) * 64
        c, s = want.get(bl, (0, 0))
        want[bl] = (c + 1, s + we)
    ref = {}
    for bl, (nd, st_) in want.items():
        pb = 512 // bl
        nb = math.ceil(nd / pb)
        ref[bl] = (nd, pb, nb, st_, nb * 512 - st_, st_ / (nb * 512.0))

    orig_load = tmod.load
    tmod.load = lambda _s, _d, _t: docs
    try:
        got = {
            r.bucket_len: (
                r.n_docs, r.per_batch, r.n_batches, r.sum_tokens,
                r.pad_waste, r.efficiency,
            )
            for r in tmod.l74_length_bucket_packing(
                spark, "ignored"
            ).collect()
        }
    finally:
        tmod.load = orig_load
    assert got == ref


@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_bfs_hops_matches_python_reference_random_graphs(spark, baskets):
    """g4 against plain-python BFS on random small co-purchase graphs
    (self-loop baskets dropped, multi-edges collapsed) — distances,
    counts and extrema must agree for every hop bucket."""
    from collections import deque

    import nipd_spark.queries.graph as gmod

    edges = {(min(u, v), max(u, v)) for u, v in baskets if u != v}
    if not edges:
        return  # no graph → query has no source; semantics undefined
    rows = []
    for ok, (u, v) in enumerate(sorted(edges)):
        rows += [(ok, u), (ok, v)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    src = min(adj)
    dist = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if dist[u] >= 4:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    want: dict = {}
    for node, d in dist.items():
        c, lo, hi = want.get(d, (0, node, node))
        want[d] = (c + 1, min(lo, node), max(hi, node))

    orig_load = gmod.load
    gmod.load = lambda _s, _d, _t: li
    try:
        got = {
            r.hop: (r.n_nodes, r.min_node, r.max_node)
            for r in gmod.g4_bfs_hops(spark, "ignored").collect()
        }
    finally:
        gmod.load = orig_load
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),   # supplier
            st.integers(min_value=0, max_value=5),   # q (heavy ties)
            st.integers(min_value=-3, max_value=3),  # p (heavy ties)
        ),
        min_size=40,
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_spearman_matches_python_reference(spark, rows):
    """w22 against a from-scratch average-rank Spearman on randomized
    heavily-tied micro-tables: the fractional-rank + Pearson pipeline
    must match the textbook computation to 6 dp, and zero-variance
    groups must be absent (NULL ρ filtered)."""
    import math

    import nipd_spark.queries.windows as wmod

    li = spark.createDataFrame(
        [(s, float(q), float(p)) for s, q, p in rows],
        "l_suppkey long, l_quantity double, l_extendedprice double",
    )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            # min-rank + (ties-1)/2 == average of ranks i+1..j
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                r[order[k]] = avg
            i = j
        return r

    def pearson(x, y):
        n = len(x)
        mx, my = sum(x) / n, sum(y) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(x, y)) / (n - 1)
        sx = math.sqrt(sum((a - mx) ** 2 for a in x) / (n - 1))
        sy = math.sqrt(sum((b - my) ** 2 for b in y) / (n - 1))
        if sx == 0 or sy == 0:
            return None
        return cov / (sx * sy)

    want = {}
    by_s: dict = {}
    for s, q, p in rows:
        by_s.setdefault(s, []).append((float(q), float(p)))
    for s, pts in by_s.items():
        if len(pts) < 20:
            continue
        rho = pearson(
            avg_ranks([q for q, _ in pts]), avg_ranks([p for _, p in pts])
        )
        if rho is not None:
            want[s] = (len(pts), round(rho, 6))

    orig_load = wmod.load
    wmod.load = lambda _s, _d, _t: li
    try:
        got = {
            r.l_suppkey: (r.n_lines, r.rho)
            for r in wmod.w22_spearman_corr(spark, "ignored").collect()
        }
    finally:
        wmod.load = orig_load
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s][0]
        assert abs(got[s][1] - want[s][1]) <= 1e-6, (s, got[s], want[s])


@given(
    revs=st.lists(
        st.integers(min_value=1, max_value=500), min_size=2, max_size=25
    )
)
@settings(**_SETTINGS)
def test_gini_running_sum_identity_matches_rank_form(spark, revs):
    """c35's running-sum Gini == the textbook rank form
    2·Σi·xᵢ/(n·Σx) − (n+1)/n on randomized single-nation revenue
    vectors (integer revenues → both forms exact to 6 dp), including
    heavy ties and the all-equal (G = 0) corner."""
    import nipd_spark.queries.composites as cmod

    orders = [(i, i, float(v)) for i, v in enumerate(revs)]
    o = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    c = spark.createDataFrame(
        [(i, 0) for i in range(len(revs))],
        "c_custkey long, c_nationkey long",
    )
    n = spark.createDataFrame([(0, "X")], "n_nationkey long, n_name string")
    tables = {"orders": o, "customer": c, "nation": n}

    xs = sorted(float(v) for v in revs)
    nn, sx = len(xs), sum(xs)
    want = round(
        2 * sum((i + 1) * x for i, x in enumerate(xs)) / (nn * sx)
        - (nn + 1) / nn,
        6,
    )

    orig_load = cmod.load
    cmod.load = lambda _s, _d, t: tables[t]
    try:
        rows = cmod.c35_gini_by_nation(spark, "ignored").collect()
    finally:
        cmod.load = orig_load
    assert len(rows) == 1 and rows[0].n_custs == nn
    assert abs(rows[0].gini - want) <= 1e-6, (rows[0].gini, want)


@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=12),
    forward=st.booleans(),
    outer=st.booleans(),
)
@settings(**_SETTINGS)
def test_asof_sql_matches_duckdb_on_random_tables(
    spark, left, right, forward, outer
):
    """The ASOF SQL surface (sqlext.asof_sql) == DuckDB's native ASOF
    on randomized micro-tables across all four grammar corners
    (backward/forward × inner/LEFT). Right side pre-reduced to unique
    (k, ts) so the match is unique and both engines must agree
    exactly."""
    from nipd_spark.sqlext import asof_sql

    lpdf = pd.DataFrame(left, columns=["k", "ts"])
    lpdf["lid"] = range(len(lpdf))
    rpdf = pd.DataFrame(right, columns=["k", "rts"])
    rpdf["rid"] = range(len(rpdf))
    rpdf = (
        rpdf.sort_values("rid").groupby(["k", "rts"], as_index=False).last()
    )
    spark.createDataFrame(lpdf).createOrReplaceTempView("hx_l")
    spark.createDataFrame(rpdf).createOrReplaceTempView("hx_r")

    op = "<=" if forward else ">="
    kw = "ASOF LEFT JOIN" if outer else "ASOF JOIN"
    got = {
        (r.lid, r.rid)
        for r in asof_sql(
            spark,
            f"""
            SELECT a.lid, b.rid AS rid
            FROM hx_l a {kw} hx_r b
            MATCH_CONDITION (a.ts {op} b.rts)
            ON a.k = b.k
            """,
        ).collect()
    }

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    duck_kw = "ASOF LEFT JOIN" if outer else "ASOF JOIN"
    want = {
        (lid, rid)
        for lid, rid in con.execute(
            f"""
            SELECT l.lid, r.rid FROM l
            {duck_kw} r ON l.k = r.k AND l.ts {op} r.rts
            """
        ).fetchall()
    }
    assert got == want


_nkeys = st.one_of(st.none(), _keys)
_nts = st.one_of(st.none(), _ts)


@given(
    left=st.lists(st.tuples(_nkeys, _nkeys, _nts), min_size=1, max_size=10),
    right=st.lists(st.tuples(_nkeys, _nkeys, _nts), min_size=1, max_size=10),
    forward=st.booleans(),
    outer=st.booleans(),
    bounded=st.booleans(),
    using=st.booleans(),
)
@settings(**_SETTINGS)
def test_asof_sql_v2_grammar_matches_duckdb(
    spark, left, right, forward, outer, bounded, using
):
    """The widened ASOF SQL grammar (composite ON / USING keys, bounded
    MATCH_CONDITION residual, NULL keys and timestamps) == DuckDB's
    native multi-equality ASOF across all 2^4 corners. asof_sql
    follows the strict Snowflake-style rule — a NULL equality key or
    NULL ordering timestamp never matches, on either side. DuckDB 1.0
    is MEASURED to deviate in plan-shape-dependent ways: the ordering
    column inherits its sort order (NULL ts sorts last and can carry
    a backward match), and NULL equality keys never match on base
    tables yet DO group through filtered views (the hash ASOF path's
    partition semantics — caught by this very fuzz). So the oracle
    normalizes BOTH: rows with any NULL key/ts are filtered before
    DuckDB's ASOF and, for LEFT, appended back as unmatched. The
    bound is match-then-filter on both engines (DuckDB: WHERE for
    inner, a CASE-nulled payload for LEFT — identical by construction
    since the as-of match minimizes the gap)."""
    from nipd_spark.sqlext import asof_sql

    # unique right (k1,k2,ts) so the match is deterministic; keep rid
    # of the LAST duplicate, matching both engines' pre-reduction
    seen = {}
    for i, (k1, k2, ts) in enumerate(right):
        seen[(k1, k2, ts)] = i
    rrows = [(k1, k2, ts, rid) for (k1, k2, ts), rid in seen.items()]
    lrows = [(k1, k2, ts, i) for i, (k1, k2, ts) in enumerate(left)]

    schema = "k1 long, k2 long, ts long, {} long"
    spark.createDataFrame(
        lrows, schema.format("lid")
    ).createOrReplaceTempView("hx2_l")
    spark.createDataFrame(
        [(k1, k2, ts, rid) for k1, k2, ts, rid in rrows],
        "k1 long, k2 long, rts long, rid long",
    ).createOrReplaceTempView("hx2_r")

    op = "<=" if forward else ">="
    gap = "b.rts - a.ts" if forward else "a.ts - b.rts"
    mc = f"a.ts {op} b.rts"
    if bounded:
        mc += f" AND {gap} <= 3"
    keyclause = (
        "USING (k1, k2)" if using else "ON a.k1 = b.k1 AND a.k2 = b.k2"
    )
    kw = "ASOF LEFT JOIN" if outer else "ASOF JOIN"
    got = {
        (r.lid, r.rid)
        for r in asof_sql(
            spark,
            f"""
            SELECT a.lid, b.rid AS rid
            FROM hx2_l a {kw} hx2_r b
            MATCH_CONDITION ({mc})
            {keyclause}
            """,
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l0(k1 BIGINT, k2 BIGINT, ts BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r0(k1 BIGINT, k2 BIGINT, rts BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO l0 VALUES (?,?,?,?)", lrows)
    con.executemany("INSERT INTO r0 VALUES (?,?,?,?)", rrows)
    # normalize DuckDB's NULL quirks (ordering column AND equality
    # keys — see docstring) to strict never-match semantics
    con.execute(
        "CREATE VIEW l AS SELECT * FROM l0 WHERE ts IS NOT NULL "
        "AND k1 IS NOT NULL AND k2 IS NOT NULL"
    )
    con.execute(
        "CREATE VIEW r AS SELECT * FROM r0 WHERE rts IS NOT NULL "
        "AND k1 IS NOT NULL AND k2 IS NOT NULL"
    )
    dgap = "r.rts - l.ts" if forward else "l.ts - r.rts"
    if outer:
        payload = (
            f"CASE WHEN {dgap} <= 3 THEN r.rid END" if bounded else "r.rid"
        )
        q = f"""
            SELECT l.lid, {payload} AS rid
            FROM l ASOF LEFT JOIN r
              ON l.k1 = r.k1 AND l.k2 = r.k2 AND l.ts {op} r.rts
            UNION ALL
            SELECT lid, NULL AS rid FROM l0
            WHERE ts IS NULL OR k1 IS NULL OR k2 IS NULL
            """
    else:
        where = f"WHERE {dgap} <= 3" if bounded else ""
        q = f"""
            SELECT l.lid, r.rid
            FROM l ASOF JOIN r
              ON l.k1 = r.k1 AND l.k2 = r.k2 AND l.ts {op} r.rts
            {where}
            """
    want = {(lid, rid) for lid, rid in con.execute(q).fetchall()}
    assert got == want


def test_asof_sql_v2_rejections_and_literals(spark):
    """The loud-rejection contract of the v2 grammar: same-side ON /
    MATCH_CONDITION clauses raise (never silently reinterpreted), and
    alias-lookalike text inside string literals survives the rewrite."""
    import pytest

    from nipd_spark.sqlext import asof_sql

    spark.createDataFrame(
        [(0, 1, 10)], "k long, ts long, lid long"
    ).createOrReplaceTempView("hx3_l")
    spark.createDataFrame(
        [(0, 1, 20, "p.s.")], "k long, rts long, rid long, note string"
    ).createOrReplaceTempView("hx3_r")

    with pytest.raises(ValueError, match="same side"):
        asof_sql(
            spark,
            """SELECT a.lid FROM hx3_l a ASOF JOIN hx3_r b
               MATCH_CONDITION (a.ts >= a.ts) ON a.k = b.k""",
        )
    with pytest.raises(ValueError, match="same side"):
        asof_sql(
            spark,
            """SELECT a.lid FROM hx3_l a ASOF JOIN hx3_r b
               MATCH_CONDITION (a.ts >= b.rts) ON b.k = b.k""",
        )
    # a string literal containing '<alias>.' must not be rewritten,
    # and alias case must not matter (parsed case-insensitively)
    row = asof_sql(
        spark,
        """SELECT A.lid, b.rid AS rid, 'p.s. b.x' AS tag
           FROM hx3_l a ASOF JOIN hx3_r B
           MATCH_CONDITION (a.ts >= b.rts) ON a.k = b.k
           WHERE b.note = 'p.s.'""",
    ).collect()[0]
    assert (row.lid, row.rid, row.tag) == (10, 20, "p.s. b.x")


@given(
    left=st.lists(st.tuples(_nkeys, _nts), min_size=1, max_size=10),
    right=st.lists(st.tuples(_nkeys, _nts), min_size=1, max_size=10),
    outer=st.booleans(),
    bounded=st.booleans(),
)
@settings(**_SETTINGS)
def test_asof_sql_nearest_matches_duckdb_argmin(
    spark, left, right, outer, bounded
):
    """The NEAREST grammar extension == the two-native-ASOF argmin
    re-expression in DuckDB, across inner/LEFT × bounded/unbounded and
    NULL key/ts corners (strict never-match semantics — NULL rows
    filtered from both DuckDB legs, unmatched lefts appended for
    LEFT). Tie rule: exact |gap| ties prefer the backward candidate,
    encoded as <= in the oracle's argmin."""
    from nipd_spark.sqlext import asof_sql

    seen = {}
    for i, (k, ts) in enumerate(right):
        seen[(k, ts)] = i
    rrows = [(k, ts, rid) for (k, ts), rid in seen.items()]
    lrows = [(k, ts, i) for i, (k, ts) in enumerate(left)]
    spark.createDataFrame(
        lrows, "k long, ts long, lid long"
    ).createOrReplaceTempView("hxn_l")
    spark.createDataFrame(
        rrows, "k long, rts long, rid long"
    ).createOrReplaceTempView("hxn_r")

    mc = "NEAREST(a.ts, b.rts)"
    if bounded:
        mc += " AND abs(a.ts - b.rts) <= 2"
    kw = "ASOF LEFT JOIN" if outer else "ASOF JOIN"
    got = {
        (r.lid, r.rid)
        for r in asof_sql(
            spark,
            f"""
            SELECT a.lid, b.rid AS rid
            FROM hxn_l a {kw} hxn_r b
            MATCH_CONDITION ({mc})
            ON a.k = b.k
            """,
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l0(k BIGINT, ts BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r0(k BIGINT, rts BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO l0 VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r0 VALUES (?,?,?)", rrows)
    con.execute(
        "CREATE VIEW l AS SELECT * FROM l0 "
        "WHERE ts IS NOT NULL AND k IS NOT NULL"
    )
    con.execute(
        "CREATE VIEW r AS SELECT * FROM r0 "
        "WHERE rts IS NOT NULL AND k IS NOT NULL"
    )
    cond = (
        "f.f_ts IS NULL OR (b.b_ts IS NOT NULL "
        "AND b.ts - b.b_ts <= f.f_ts - b.ts)"
    )
    pick = f"CASE WHEN {cond} THEN b.b_id ELSE f.f_id END"
    dist = f"CASE WHEN {cond} THEN b.ts - b.b_ts ELSE f.f_ts - b.ts END"
    rid_expr = (
        f"CASE WHEN {dist} <= 2 THEN {pick} END" if bounded else pick
    )
    base = f"""
        WITH b AS (
          SELECT l.lid, l.ts, r.rid AS b_id, r.rts AS b_ts
          FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.rts
        ),
        f AS (
          SELECT l.lid, r.rid AS f_id, r.rts AS f_ts
          FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts <= r.rts
        )
        SELECT b.lid, {rid_expr} AS rid FROM b JOIN f USING (lid)
    """
    if outer:
        q = (
            base
            + """
            UNION ALL
            SELECT lid, NULL AS rid FROM l0
            WHERE ts IS NULL OR k IS NULL
            """
        )
    else:
        q = f"SELECT lid, rid FROM ({base}) WHERE rid IS NOT NULL"
    want = {(lid, rid) for lid, rid in con.execute(q).fetchall()}
    assert got == want


_lab = st.sampled_from(["D", "U", "F"])


@given(
    seqs=st.lists(
        st.lists(_lab, min_size=1, max_size=14), min_size=1, max_size=4
    ),
    pidx=st.integers(min_value=0, max_value=2),
)
@settings(**_SETTINGS)
def test_match_runs_randomized_vs_reference(spark, seqs, pidx):
    """Randomized label sequences: both W10 matchers == the greedy
    run-scan reference; on border-free patterns the compiled and
    sequential matchers must also agree with each other."""
    from nipd_spark.operators import patterns as pat

    from pyspark.sql import functions as F

    pattern = [["D", "U"], ["D", "F", "U"], ["U", "D"]][pidx]
    rows = [
        (k, i, lb)
        for k, labs in enumerate(seqs)
        for i, lb in enumerate(labs)
    ]
    df = spark.createDataFrame(rows, "k int, pos int, lab string")

    def ref(labs):
        runs = []
        for i, lb in enumerate(labs):
            if runs and runs[-1][0] == lb:
                continue
            runs.append((lb, i))
        out, i = [], 0
        while i + len(pattern) <= len(runs):
            if [r[0] for r in runs[i : i + len(pattern)]] == pattern:
                out.append(
                    tuple(r[1] for r in runs[i : i + len(pattern)])
                )
                i += len(pattern)
            else:
                i += 1
        return out

    want = {
        (k, *m) for k, labs in enumerate(seqs) for m in ref(labs)
    }
    norm = lambda rs: {
        tuple([r.k] + [r[f"seg{i}_start"] for i in range(len(pattern))])
        for r in rs
    }
    got_seq = norm(
        pat.match_runs_sequential(
            df, "k", ["pos"], F.col("lab"), pattern,
            {"start": F.min("pos")},
        ).collect()
    )
    assert got_seq == want
    got_cmp = norm(
        pat.match_runs(
            df, "k", ["pos"], F.col("lab"), pattern,
            {"start": F.min("pos")},
        ).collect()
    )
    assert got_cmp == want


# quantified W10 patterns (r12): valid under the island-exactness rules
# (unbounded max on end legs, adjacent-distinct expansions). The last
# two self-overlap, so only the sequential matcher accepts them.
_QPATTERNS = [
    [("D", 2, None), ("U", 1, None)],
    [("D", 1, None), ("F", 1, 2), ("U", 1, None)],
    [("D", 1, None), ("F", 0, 2), ("U", 1, None)],  # optional interior
    [("D", 0, None), ("U", 2, None)],               # optional leading
    # optional trailing must be unbounded (F? would be a finite-max
    # end leg, which island granularity rejects)
    [("D", 1, None), ("U", 1, None), ("F", 0, None)],
    [("U", 1, None), ("D", 1, None), ("U", 1, None)],          # border
    [("D", 1, None), ("U", 1, None), ("D", 1, None), ("U", 1, None)],
    # r12 alternation groups (list element = branches):
    [("D", 2, None), [[("F", 1, None)], [("U", 1, None)]]],
    # label-suffix nesting across branches ((D U | U{2,}) — the
    # longer branch wins at a shared end = leftmost)
    [[[("D", 1, None), ("U", 1, None)], [("U", 2, None)]]],
    # PERMUTE(D+, U+): orderings overlap on D U D -> sequential-only
    [[[("D", 1, None), ("U", 1, None)], [("U", 1, None), ("D", 1, None)]]],
    # optional group with a bounded interior branch
    [("F", 1, None), [[("U", 1, 2)], []], ("D", 1, None)],
]
_QPATTERNS_SEQ_ONLY = {5, 6, 9}


@given(
    seqs=st.lists(
        st.lists(_lab, min_size=1, max_size=14), min_size=1, max_size=4
    ),
    pidx=st.integers(min_value=0, max_value=len(_QPATTERNS) - 1),
)
@settings(**_SETTINGS)
def test_match_runs_quantified_vs_regex_nfa(spark, seqs, pidx):
    """Quantified/optional W10 patterns vs the ROW-LEVEL ground truth:
    Python re.finditer has exactly the ISO MATCH_RECOGNIZE ONE ROW PER
    MATCH / SKIP PAST LAST ROW semantics for greedy quantifiers
    (leftmost non-overlapping matches, greedy with backtracking), so a
    regex with one capture group per leg is an independent reference
    for BOTH the per-leg row counts and the per-leg start positions —
    including which optional legs participate in each match. Windows
    and sequential matchers must equal it (windows only where
    compilable)."""
    import re as _re

    from pyspark.sql import functions as F

    from nipd_spark.operators import patterns as pat

    pattern = _QPATTERNS[pidx]
    k_legs = len(pat.flatten(pattern))
    rows = [
        (k, i, lb)
        for k, labs in enumerate(seqs)
        for i, lb in enumerate(labs)
    ]
    df = spark.createDataFrame(rows, "k int, pos int, lab string")

    def _leg_rx(lab, lo, hi):
        return f"({lab}{{{lo},{'' if hi is None else hi}}})"

    rx = _re.compile(
        "".join(
            "(?:"
            + "|".join(
                "".join(_leg_rx(*l) for l in br) for br in el
            )
            + ")"
            if isinstance(el, list)
            else _leg_rx(*el)
            for el in pattern
        )
    )

    def ref(labs):
        s = "".join(labs)
        out = []
        for m in rx.finditer(s):
            segs = []
            for g in range(1, k_legs + 1):
                a, b = m.span(g)
                segs += [None, None] if a == b else [b - a, a]
            out.append(tuple(segs))
        return out

    want = {
        (k, *m) for k, labs in enumerate(seqs) for m in ref(labs)
    }
    norm = lambda rs: {
        tuple(
            [r.k]
            + [
                x
                for i in range(k_legs)
                for x in (r[f"seg{i}_n"], r[f"seg{i}_start"])
            ]
        )
        for r in rs
    }
    got_seq = norm(
        pat.match_runs_sequential(
            df, "k", ["pos"], F.col("lab"), pattern,
            {"start": F.min("pos")},
        ).collect()
    )
    assert got_seq == want
    if pat.windows_compilable(pattern):
        got_cmp = norm(
            pat.match_runs(
                df, "k", ["pos"], F.col("lab"), pattern,
                {"start": F.min("pos")},
            ).collect()
        )
        assert got_cmp == want
    else:
        # only the bordered/PERMUTE patterns are sequential-only
        assert pidx in _QPATTERNS_SEQ_ONLY
        # and the border patterns must NOT silently reach the windows
        # matcher
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pat.match_runs(
                df, "k", ["pos"], F.col("lab"), pattern,
                {"start": F.min("pos")},
            )


_OPATTERNS = [
    [("D", 1, None), ("U", 1, None)],
    # the W-shape: sequential-only under SKIP PAST LAST, all-JVM here
    [("D", 1, None), ("U", 1, None), ("D", 1, None), ("U", 1, None)],
    # finite max on the FIRST leg — allowed in this mode only
    [("D", 2, 4), ("U", 1, None)],
    [("D", 2, None), [[("F", 1, None)], [("U", 1, None)]]],
    [("D", 1, None), ("F", 0, 2), ("U", 1, None)],
    [("U", 1, None), ("D", 1, None), ("U", 1, None)],
    [("D", 1, None), ("U", 1, None), ("F", 0, None)],
]


@given(
    seqs=st.lists(
        st.lists(_lab, min_size=1, max_size=14), min_size=1, max_size=4
    ),
    pidx=st.integers(min_value=0, max_value=len(_OPATTERNS) - 1),
)
@settings(**_SETTINGS)
def test_match_runs_overlapping_vs_lookahead_regex(spark, seqs, pidx):
    """SKIP TO NEXT ROW vs the ROW-LEVEL ground truth: re.finditer of
    the zero-width lookahead '(?=(pattern))' enumerates every start
    position whose greedy match succeeds — exactly one overlapping
    match per qualifying start row, the ISO semantics of this skip
    mode — with the lookahead's inner capture groups giving per-leg
    spans. match_runs_overlapping must equal it on counts AND start
    positions for every leg, including which optional legs / branches
    participate."""
    import re as _re

    from pyspark.sql import functions as F

    from nipd_spark.operators import patterns as pat

    pattern = _OPATTERNS[pidx]
    k_legs = len(pat.flatten(pattern))
    rows = [
        (k, i, lb)
        for k, labs in enumerate(seqs)
        for i, lb in enumerate(labs)
    ]
    df = spark.createDataFrame(rows, "k int, pos int, lab string")

    def _leg_rx(lab, lo, hi):
        return f"({lab}{{{lo},{'' if hi is None else hi}}})"

    inner = "".join(
        "(?:"
        + "|".join("".join(_leg_rx(*l) for l in br) for br in el)
        + ")"
        if isinstance(el, list)
        else _leg_rx(*el)
        for el in pattern
    )
    rx = _re.compile(f"(?=(?:{inner}))")

    def ref(labs):
        s = "".join(labs)
        out = []
        for m in rx.finditer(s):
            segs = []
            any_part = False
            for g in range(1, k_legs + 1):
                a, b = m.span(g)
                if a != b:
                    any_part = True
                segs += [None, None] if a == b else [b - a, a]
            if any_part:  # zero-width lookahead also "matches" empty
                out.append(tuple(segs))
        return out

    want = {
        (k, *m) for k, labs in enumerate(seqs) for m in ref(labs)
    }
    got = {
        tuple(
            [r.k]
            + [
                x
                for i in range(k_legs)
                for x in (r[f"seg{i}_n"], r[f"seg{i}_start"])
            ]
        )
        for r in pat.match_runs_overlapping(
            df, "k", ["pos"], F.col("lab"), pattern,
            {"start": F.min("pos")},
        ).collect()
    }
    assert got == want
