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

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def spill_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Local checkpoint with DISK_ONLY blocks: lineage cut + single
    computation, zero unified-memory-pool footprint.  Use for any
    materialized intermediate whose size scales with the input data."""
    return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)
