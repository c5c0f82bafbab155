"""Versioned-parquet snapshot tables: time travel on plain storage
(SURVEY.md §2.1 S6 write-path; the snapshot/manifest design every
lakehouse table format shares — Iceberg's snapshot log, Delta's
versioned commits — reduced to its engine-visible core, since the
format jars are absent in this container and connectors.py gates the
real writers behind capability probes).

Layout:

    table_dir/
      v=1/part-*.parquet      immutable snapshot data
      v=2/...
      _manifest.json          ordered version list + row counts
      _latest                 text file holding the current version

Writers are atomic-by-rename: data lands in ``v=<n>.tmp`` and is
renamed into place, then ``_latest`` is swapped last — a reader that
races a writer sees either the old or the new version, never a torn
one (single-writer discipline; multi-writer needs a log store, which
IS the part Delta/Iceberg add on top of this layout).

Scale notes (100 TB): snapshots are append-only directories, so time
travel is free at read time (path selection, no data rewrites), and
old versions vacuum by deleting directories no longer in the manifest.
Readers get full predicate pushdown/pruning — a snapshot read IS a
parquet scan.
"""

from __future__ import annotations

import json
import os
import shutil
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifest.json")


def read_manifest(table_dir: str) -> list[dict]:
    """Ordered snapshot history: [{version, n_rows}, ...]."""
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def latest_version(table_dir: str) -> int | None:
    p = os.path.join(table_dir, "_latest")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Append df as the next snapshot version; returns the version id."""
    os.makedirs(table_dir, exist_ok=True)
    manifest = read_manifest(table_dir)
    version = (manifest[-1]["version"] + 1) if manifest else 1
    dest = os.path.join(table_dir, f"v={version}")
    tmp = dest + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    n_rows = df.sparkSession.read.parquet(tmp).count()
    os.rename(tmp, dest)
    manifest.append({"version": version, "n_rows": n_rows})
    mtmp = _manifest_path(table_dir) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, _manifest_path(table_dir))
    ltmp = os.path.join(table_dir, "_latest.tmp")
    with open(ltmp, "w") as f:
        f.write(str(version))
    os.replace(ltmp, os.path.join(table_dir, "_latest"))
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot: the given version, or the latest when None."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no snapshots in {table_dir}")
    versions = {m["version"] for m in read_manifest(table_dir)}
    if version not in versions:
        raise ValueError(
            f"version {version} not in manifest {sorted(versions)}"
        )
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))


def table_diff(pre: DataFrame, post: DataFrame, key_cols: list[str]) -> DataFrame:
    """Row-level changelog between two same-schema tables, in Delta
    CDF's vocabulary: one row per inserted/deleted key, TWO rows per
    updated key (``update_preimage`` with the old values,
    ``update_postimage`` with the new), tagged in ``_change_type``.

    Scale shape: one full-outer equi-join on the key columns (null-safe)
    plus null-safe column compares — a single key shuffle, no window,
    no collect. Updates where no non-key column changed are NOT
    emitted (no-op writes produce no changelog rows).
    """
    cols = list(pre.columns)
    if list(post.columns) != cols:
        raise ValueError(f"schema mismatch: {cols} vs {list(post.columns)}")
    non_key = [c for c in cols if c not in key_cols]
    a = pre.withColumn("_pre", F.lit(1)).alias("a")
    b = post.withColumn("_post", F.lit(1)).alias("b")
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in key_cols],
    )
    j = a.join(b, cond, "full")

    def side(s: str) -> list:
        return [F.col(f"{s}.{c}").alias(c) for c in cols]

    deletes = (
        j.filter(F.col("b._post").isNull())
        .select(*side("a"), F.lit("delete").alias("_change_type"))
    )
    inserts = (
        j.filter(F.col("a._pre").isNull())
        .select(*side("b"), F.lit("insert").alias("_change_type"))
    )
    changed = (
        reduce(
            lambda x, y: x | y,
            [~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in non_key],
        )
        if non_key
        else F.lit(False)
    )
    upd = j.filter(
        F.col("a._pre").isNotNull() & F.col("b._post").isNotNull() & changed
    )
    pre_rows = upd.select(
        *side("a"), F.lit("update_preimage").alias("_change_type")
    )
    post_rows = upd.select(
        *side("b"), F.lit("update_postimage").alias("_change_type")
    )
    return deletes.unionByName(inserts).unionByName(pre_rows).unionByName(
        post_rows
    )


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change data feed between two committed snapshot versions — the
    read side of what Delta calls CDF, computed from the immutable
    version directories (no changelog files needed: versions are full
    snapshots, so the diff IS the feed)."""
    return table_diff(
        read_snapshot(spark, table_dir, v_from),
        read_snapshot(spark, table_dir, v_to),
        key_cols,
    )


def vacuum(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots; returns the
    removed version ids. The manifest is rewritten first, then data
    directories are deleted — a racing reader of a dropped version
    fails the manifest check before touching missing files."""
    manifest = read_manifest(table_dir)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    drop, keep = manifest[:-keep_last], manifest[-keep_last:]
    if not drop:
        return []
    mtmp = _manifest_path(table_dir) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(keep, f)
    os.replace(mtmp, _manifest_path(table_dir))
    for m in drop:
        shutil.rmtree(
            os.path.join(table_dir, f"v={m['version']}"), ignore_errors=True
        )
    return [m["version"] for m in drop]
