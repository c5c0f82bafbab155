"""Batch MERGE INTO (upsert) as a composition of equi-joins
(SURVEY.md §2.1 S6 write-path; ANSI SQL:2003 MERGE, Delta/Iceberg
``MERGE INTO`` semantics re-expressed on plain DataFrames).

The three MERGE branches become three equi-keyed DataFrame legs over
the same join keys, unioned:

  - WHEN MATCHED THEN UPDATE  → inner join, update assignments applied
  - WHEN MATCHED THEN DELETE  → matched target rows simply dropped
  - (target rows w/o a match) → target LEFT ANTI source, unchanged
  - WHEN NOT MATCHED INSERT   → source LEFT ANTI target, insert exprs

Scale notes (100 TB): every leg shuffles on the same merge keys, so AQE
reuses the exchange; no leg is ever a cross product. This is the
engine-level semantics that a lakehouse MERGE compiles to — on
Delta/Iceberg the same plan feeds the file-rewrite layer
(connectors.py gates those writers behind capability probes since the
jars are absent in this container). The streaming sibling is the
foreachBatch upsert (queries/streaming_live.py t10), which applies this
operator per micro-batch.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched: dict[str, Column] | str | None = None,
    when_not_matched: dict[str, Column] | None = None,
    check_cardinality: bool = True,
) -> DataFrame:
    """MERGE source INTO target ON the equi-key columns ``on``.

    ``when_matched``: dict of target column -> Column expression over
    the aliases ``t`` (target) and ``s`` (source) — the UPDATE SET
    assignments; the string ``"delete"`` drops matched target rows;
    ``None`` leaves matched rows unchanged.
    ``when_not_matched``: dict of target column -> Column over ``s`` —
    the INSERT values (unlisted columns become NULL); ``None`` inserts
    nothing.

    Cardinality rule (standard MERGE): a *matched* target row may be
    matched by at most one source row. With ``check_cardinality`` (the
    default) the update leg carries an in-plan runtime guard — a
    per-key count window over the source rows that actually match a
    target key, plus ``assert_true`` — that raises at execution time
    when a target row is matched by k>1 source rows, mirroring Delta's
    "multiple source rows matched" error instead of silently emitting
    the row k times. Duplicate source keys that match NO target row are
    legal (they feed only the insert leg), so the count runs over
    ``source LEFT SEMI target`` — keys duplicated there violate the
    rule by construction, which keeps the guard correct even when
    Catalyst pushes the filter below the inner join (it references only
    source-side columns, so it will). The guard is lazy (no extra
    action); it costs one shuffle of the SOURCE on the merge keys plus
    a key-projection semi-join against the target (column-pruned scan,
    no wide rows move) — pass ``check_cardinality=False`` for
    pre-deduplicated sources on hot paths (see s21_merge_into).
    Keys compare null-safely (``eqNullSafe``), so a NULL key matches a
    NULL key — document per call-site if SQL-NULL semantics are wanted.
    """
    guarded = (
        check_cardinality
        and isinstance(when_matched, dict)
    )
    if guarded:
        # Per-key source count restricted to keys that exist in the
        # target: duplicates among UNMATCHED keys are legal (insert-leg
        # only), and restricting here — rather than predicating on a
        # target column post-join — keeps the guard sound under
        # Catalyst's pushdown of the source-only filter below the join.
        def _key_cond(lhs: str, rhs: str) -> Column:
            return reduce(
                lambda a, b: a & b,
                [
                    F.col(f"{lhs}.{k}").eqNullSafe(F.col(f"{rhs}.{k}"))
                    for k in on
                ],
            )

        matched_n = (
            source.select(*on)
            .alias("ms")
            .join(target.select(*on).alias("mt"), _key_cond("ms", "mt"), "left_semi")
            .groupBy(*on)
            .agg(F.count(F.lit(1)).alias("__merge_n"))
        )
        source = (
            source.alias("src")
            .join(matched_n.alias("mn"), _key_cond("src", "mn"), "left")
            .select("src.*", F.coalesce(F.col("mn.__merge_n"), F.lit(1)).alias("__merge_n"))
        )
    t, s = target.alias("t"), source.alias("s")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on],
    )
    out_cols = list(target.columns)
    if when_matched is None:
        parts = [target.select(*out_cols)]
    else:
        parts = [t.join(s, cond, "left_anti").select(*out_cols)]
        if when_matched != "delete":
            assigned = [
                (
                    when_matched[c] if c in when_matched else F.col(f"t.{c}")
                ).alias(c)
                for c in out_cols
            ]
            upd = t.join(s, cond, "inner")
            if guarded:
                # assert_true yields NULL when the predicate holds and
                # raises otherwise; filtering on isNull keeps every
                # legal row while forcing the guard to evaluate (it
                # cannot be pruned away like an unused column would be).
                upd = upd.filter(
                    F.assert_true(
                        F.col("s.__merge_n") <= 1,
                        F.lit(
                            "MERGE cardinality violation: multiple "
                            "source rows matched a target row on "
                            + ",".join(on)
                        ),
                    ).isNull()
                )
            parts.append(upd.select(*assigned))
    if when_not_matched is not None:
        types = {f.name: f.dataType for f in target.schema.fields}
        inserted = [
            (
                when_not_matched[c]
                if c in when_not_matched
                else F.lit(None).cast(types[c])
            ).alias(c)
            for c in out_cols
        ]
        parts.append(s.join(t, cond, "left_anti").select(*inserted))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
