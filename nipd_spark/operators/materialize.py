"""Spill-safe materialization of multi-consumer subplans.

``DataFrame.localCheckpoint()`` defaults to MEMORY_AND_DISK: the
materialized rows are stored as deserialized blocks INSIDE the unified
memory pool, where they compete with execution memory (joins, sorts,
hash aggregates).  For a fact-sized intermediate — e.g. the ~38 M-row
symmetrized co-purchase edge list at the 16x probe scale — that
contention is fatal: concurrent tasks of the next stage each get
pool/(2*tasks) as their guaranteed share, and with several GB of
checkpoint blocks pinned the share collapses and tasks die with
UNABLE_TO_ACQUIRE_MEMORY (observed: g2_pagerank at 16x on an 8 GB
driver, stage aborted).

``spill_checkpoint`` keeps the lineage-cut + compute-once semantics but
stores the blocks DISK_ONLY: disk blocks never touch the unified pool,
so execution keeps its full budget, and on any healthy node the OS page
cache serves re-reads at memory speed from OUTSIDE the JVM heap.  This
is the right default for every checkpoint whose size scales with the
fact tables; keep plain ``localCheckpoint()`` for vertex-sized state
(e.g. the O(nodes) label vector in iterative algorithms) where the
in-pool footprint is trivial and re-read latency matters per round.

At 100 TB the same discipline holds: an executor's storage fraction is
sized for hot state, not for fact-sized intermediates — those belong on
local disk (or a shuffle-like spill path), exactly what DISK_ONLY does.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def _no_checkpoint() -> bool:
    """NIPD_SPARK_NO_CHECKPOINT=1 turns both checkpoint helpers into
    identity (r13, r12 ADVICE): a localCheckpoint truncates the plan to
    a ``Scan ExistingRDD``, so tools/plan_lint.py and the plan-quality
    pins could no longer see the subplans BEHIND a checkpoint (l73's
    phrase selection, c20's rfm aggregate — the r11 vacuous-probe
    lesson). The lint sweep sets this flag to inspect the FULL
    pre-checkpoint plan; never set it for real execution — the
    checkpoints exist for memory/correctness reasons documented at
    each call site."""
    return os.environ.get("NIPD_SPARK_NO_CHECKPOINT") == "1"


def spill_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Local checkpoint with DISK_ONLY blocks: lineage cut + single
    computation, zero unified-memory-pool footprint.  Use for any
    materialized intermediate whose size scales with the input data."""
    if _no_checkpoint():
        return df
    return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)


def plan_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Plain-storage localCheckpoint for vertex/tiny-sized state that
    also honors the lint flag (use instead of a bare
    ``df.localCheckpoint()`` when the truncated subplan carries shape
    the lint should keep seeing)."""
    if _no_checkpoint():
        return df
    return df.localCheckpoint(eager=eager)
