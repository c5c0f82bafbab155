"""Row-pattern matching over ordered per-key sequences — the
MATCH_RECOGNIZE run-pattern subset (SURVEY.md §2.5 W10).

ISO SQL:2016 row pattern recognition (Oracle/Snowflake MATCH_RECOGNIZE,
Flink CEP [PK: ISO/IEC 9075-2:2016 §R; Flink MATCH_RECOGNIZE docs])
has no Spark SQL 4.1 surface. The general feature runs an NFA
sequentially per partition — inherently stateful. This operator
implements the exactly-compilable subset that covers the classic
analytics uses (V/U-shapes, dip-and-recover, escalation runs):

    PATTERN (L1+ L2+ ... Lk+)   over caller-supplied row labels,

i.e. one-or-more runs of each label, strictly contiguous, with ONE ROW
PER MATCH and AFTER MATCH SKIP PAST LAST ROW semantics. The compile
target is the gaps-and-islands idiom — pure keyed windows + one
aggregation, no per-row Python, no sequential scan:

  1. label change-points → per-key island ids (one keyed window);
  2. collapse rows to (key, island) with the caller's island-level
     aggregates (keyed partial agg — islands, not rows, flow on);
  3. detect the pattern on the ISLAND sequence: a match ends at an
     island whose k-1 predecessors carry exactly the pattern's labels
     (lag chain over the islands table, same keyed window).

Exactness of the skip-past-last semantics WITHOUT sequential state:
maximal runs mean an occurrence of the label sequence in the island
string corresponds 1:1 to a pattern match, and occurrences of a
sequence can OVERLAP only when the sequence has a nontrivial border
(a proper prefix that is also a suffix — the KMP overlap condition).
The constructor therefore REJECTS patterns with a nontrivial border
(and adjacent-equal labels, whose greedy split is ambiguous): for
every accepted pattern, lag-chain detection emits exactly the
non-overlapping greedy matches MATCH_RECOGNIZE would. Self-overlapping
patterns (e.g. W-shapes DOWN UP DOWN UP) need the sequential matcher
and are loudly refused — the documented escape hatch is an
applyInPandas NFA per key, not a silent wrong answer.

Scale notes (100 TB): one shuffle on the (growing) key + in-partition
sorts — the cost class of any per-key window; the island collapse
shrinks the relation before the detection window, and no stage is
keyed on a bounded-domain column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _border_free(pattern: list[str]) -> bool:
    """True iff the label sequence has NO nontrivial border (KMP): no
    proper prefix equals a suffix — the condition under which
    occurrences cannot overlap."""
    n = len(pattern)
    for b in range(1, n):
        if pattern[:b] == pattern[n - b:]:
            return False
    return True


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


def match_runs(
    df: DataFrame,
    key: str | list[str],
    order: list[str],
    label: Column,
    pattern: list[str],
    island_aggs: dict[str, Column],
) -> DataFrame:
    """One row per pattern match. ``label`` classifies each row (NULL =
    matches nothing, breaks runs); ``order`` must be a deterministic
    total order within each key (include a unique tiebreaker).
    ``island_aggs`` are aggregates evaluated over each island's rows;
    the output carries ``seg{i}_{name}`` for every pattern position i,
    plus ``seg{i}_n`` (row count), for each match.
    """
    if len(pattern) < 1:
        raise ValueError("match_runs: empty pattern")
    for a, b in zip(pattern, pattern[1:]):
        if a == b:
            raise ValueError(
                "match_runs: adjacent equal labels "
                f"({a!r} {b!r}) — greedy run split is ambiguous; "
                "merge them into one position"
            )
    if not _border_free(pattern):
        raise ValueError(
            "match_runs: pattern has a nontrivial border (a proper "
            f"prefix equals a suffix): {pattern} — occurrences can "
            "overlap, so lag-chain detection cannot reproduce AFTER "
            "MATCH SKIP PAST LAST ROW; use a sequential per-key "
            "matcher (applyInPandas NFA) for this pattern"
        )
    keys = [key] if isinstance(key, str) else list(key)
    segs = _islands(df, keys, order, label, island_aggs)
    k = len(pattern)
    w_isl = Window.partitionBy(*keys).orderBy("__island")
    # the match ends at an island labelled pattern[-1] whose i-th
    # predecessor (from the end) is labelled pattern[i]
    cond = F.col("__lab") == pattern[-1]
    for i in range(k - 1):
        cond = cond & (
            F.lag("__lab", k - 1 - i).over(w_isl) == pattern[i]
        )
    out_cols: list[Column] = [F.col(c) for c in keys]
    for i in range(k):
        off = k - 1 - i
        def at(colname: str) -> Column:
            return (
                F.lag(colname, off).over(w_isl)
                if off > 0
                else F.col(colname)
            )
        out_cols.append(at("__n").alias(f"seg{i}_n"))
        out_cols += [
            at(f"__a_{name}").alias(f"seg{i}_{name}")
            for name in island_aggs
        ]
    return (
        segs.withColumn("__match", cond)
        .select(*out_cols, "__match")
        .filter(F.col("__match"))
        .drop("__match")
    )


def match_runs_sequential(
    df: DataFrame,
    key: str | list[str],
    order: list[str],
    label: Column,
    pattern: list[str],
    island_aggs: dict[str, Column],
) -> DataFrame:
    """The documented escape hatch for patterns ``match_runs`` rejects:
    label sequences WITH a nontrivial border (self-overlapping — the
    W-shape), where SKIP PAST LAST ROW is inherently a sequential
    greedy scan. Same contract and output schema as ``match_runs``.

    Realization: the SAME distributed island collapse (the two keyed
    stages — nothing Python touches raw rows), then ONE
    ``applyInPandas`` per key over the ISLAND table running the
    leftmost-greedy non-overlapping occurrence scan. The Python input
    per key is the run sequence (≤ rows/1, typically ≪ rows), Arrow-
    batched — the Pandas-UDF path the engine reserves for operators
    whose semantics Spark's declarative layer genuinely cannot
    express (iterative greedy consumption).

    Scale notes (100 TB): one shuffle on the (growing) key for the
    windows, one more for the grouping; the applyInPandas grouping is
    BUCKETED (xxhash64(key) mod 256, whole keys per bucket, the
    per-key scan running pandas-side inside each bucket) so Python
    invocations number n_buckets, not |keys| — the per-key invocation
    floor measured ~0.5 ms on the 100× replica before bucketing (79 s
    for 150k users; ~11 s after). Per-key island sequences are bounded
    by the key's row share, exactly like any per-key window. For
    border-FREE patterns prefer ``match_runs`` — measured equal
    results (property-tested), all-JVM plan.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if len(pattern) < 1:
        raise ValueError("match_runs_sequential: empty pattern")
    for a, b in zip(pattern, pattern[1:]):
        if a == b:
            raise ValueError(
                "match_runs_sequential: adjacent equal labels "
                f"({a!r} {b!r}) — greedy run split is ambiguous"
            )
    keys = [key] if isinstance(key, str) else list(key)
    segs = _islands(df, keys, order, label, island_aggs)
    k = len(pattern)
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
            while i + k <= len(labs):
                if labs[i : i + k] == pattern:
                    rec = dict(krec)
                    for j in range(k):
                        rec[f"seg{j}_n"] = ns[i + j]
                        for name in agg_names:
                            rec[f"seg{j}_{name}"] = aggl[name][i + j]
                    out.append(rec)
                    i += k  # AFTER MATCH SKIP PAST LAST ROW
                else:
                    i += 1
        return pd.DataFrame(out, columns=cols)

    bkt = F.pmod(
        F.xxhash64(*[F.col(c) for c in keys]), F.lit(256)
    )
    return (
        segs.withColumn("__bkt", bkt)
        .groupBy("__bkt")
        .applyInPandas(scan_bucket, schema)
    )
