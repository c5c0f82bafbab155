"""Connected components over an undirected edge list — the clustering
step that turns near-duplicate PAIRS into dedup GROUPS (keep one doc per
component) in an LLM data pipeline.

Algorithm: minimum-label propagation (the HashMin / "hash-to-min"
family — Rastogi et al., ICDE 2013; the DataFrame formulation of
Pregel-style CC): every node starts labeled with its own id; each round
every node takes the min label in its closed neighborhood; fixpoint =
every node carries its component's minimum id. Rounds = graph diameter,
which for near-dup clusters is tiny (dup groups are dense); for
arbitrary graphs the alternating star algorithm (Kiveris et al., SoCC
2014) trades fewer rounds for more complex steps — label propagation is
chosen here because its invariant (label monotonically decreases to the
component min) is trivially auditable and each round is two equi-keyed
shuffles.

Spark-first notes: the loop is batched into SUPERSTEPS — each superstep
lazily composes ``rounds_per_job`` propagation rounds, each followed by
``jumps`` pointer-jumping joins (two-hop path compression), then runs
exactly ONE action: an aggregate whose computation also materializes a
lazy localCheckpoint of the labels (cutting the growing lineage) and
returns the label sum. Labels only ever decrease (propagation and
jumping both take minima), so the label sum is strictly monotone and
"sum unchanged across a superstep" is the fixpoint test — no extra
join-and-count job per round.

Cost model behind the (rounds_per_job=1, jumps=4) defaults: a
propagation round joins the EDGE list (fact-sized — the expensive leg),
while a pointer jump joins the label table against itself (vertex-sized
— near-free). Each jump halves the remaining distance to the component
min, so one edge join + 4 jumps compresses ~16× per superstep; stacking
a second propagation round in the same job doubles the fact-sized work
without cutting supersteps proportionally. Measured on the sf0.01
co-purchase giant component (116k edges, 2k nodes): (1,4) = 3.2 s vs
(2,2) = 9.8 s vs (3,3) = 31 s, identical fixpoints.

At 100 TB: labels shuffle on node id each round; a giant component
makes its min node a hot key only in degenerate star topologies —
the groupBy is on the *receiving* node, which keeps load uniform.
Pointer jumping gives O(log diameter) supersteps on chain topologies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipd_spark.operators.materialize import spill_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    rounds_per_job: int = 1,
    jumps: int = 4,
) -> DataFrame:
    """(node, component) — component = min node id in each component.

    ``edges`` is undirected; self-loops and duplicate edges tolerated.
    ``max_iter`` bounds supersteps (each = ``rounds_per_job``
    propagation rounds, ``jumps`` pointer jumps after each round).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # Edge list is fact-sized: DISK_ONLY blocks stay out of the unified
    # memory pool so the per-round joins keep their execution budget
    # (materialize.spill_checkpoint rationale). The O(nodes) label
    # vector below stays on the default in-memory path.
    sym = spill_checkpoint(sym)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )

    def nbr_min_of(labels: DataFrame) -> DataFrame:
        # min label over the (open) neighborhood of each node
        return (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )

    return _label_loop(nbr_min_of, labels, max_iter, rounds_per_job, jumps)


def connected_components_adjacency(
    adj: DataFrame,
    node: str = "node",
    nbrs: str = "nbrs",
    max_iter: int = 50,
    rounds_per_job: int = 1,
    jumps: int = 4,
) -> DataFrame:
    """(node, component) from a pre-built SYMMETRIC, deduped,
    self-loop-free adjacency list ``(node, array<neighbor>)`` (r13).

    The caller materializes ``adj`` (spill_checkpoint) — it is consumed
    every propagation round. Symmetry is what makes the cheap round
    shape valid: min-over-in-neighbors equals min-over-out-neighbors,
    so each round SENDS every node's label along its out-edges — a
    node-sized join (|nodes| adjacency rows ⋈ |nodes| labels,
    co-partitioned when both exchanges share the session partition
    count) followed by a map-side explode + partial-min — instead of
    probing a fact-sized pair list with the label table (guide §2.3:
    the edge-sized stream never crosses an exchange un-aggregated).
    Fixpoint, labels, and output are identical to
    ``connected_components`` on the exploded pair list.
    """
    a = adj.select(F.col(node).alias("_n"), F.col(nbrs).alias("_vs"))
    labels = a.select(
        F.col("_n").alias("node"), F.col("_n").alias("component")
    )

    def nbr_min_of(labels: DataFrame) -> DataFrame:
        return (
            a.join(labels, a["_n"] == labels["node"])
            .select(F.explode("_vs").alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("nbr_component"))
        )

    return _label_loop(nbr_min_of, labels, max_iter, rounds_per_job, jumps)


def _label_loop(
    nbr_min_of,
    labels: DataFrame,
    max_iter: int,
    rounds_per_job: int,
    jumps: int,
) -> DataFrame:
    """Shared superstep loop: ``rounds_per_job`` propagation rounds
    (neighborhood min supplied by ``nbr_min_of``), ``jumps`` pointer
    jumps each, one checkpoint+sum action per superstep, monotone-sum
    fixpoint test (module docstring)."""
    prev_sum: object = object()  # sentinel != any first-superstep sum
    for _ in range(max_iter):
        for _ in range(rounds_per_job):
            nbr_min = nbr_min_of(labels)
            labels = labels.join(nbr_min, "node", "left").select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            # LAZY checkpoint before the jumps (r13): each jump below
            # references `labels` TWICE, so 4 lazily-composed jumps
            # embed 2^4 copies of the propagation subtree — the one
            # plan fragment that touches the fact-sized edge relation.
            # Plan-level exchange reuse covered the pair-join spelling
            # but NOT the adjacency explode+agg spelling (measured at
            # the 100× replica: 321 s/superstep vs 76 s). An RDD-backed
            # scan is shared by construction — every reference hits the
            # SAME RDD, computed once inside the superstep's single
            # action (eager=False: no extra job, no barrier).
            labels = labels.localCheckpoint(eager=False)
            # Pointer jumping (path compression): component <-
            # label(component). Every label is itself a node id, so each
            # extra equi-join halves the remaining distance to the
            # component min — and since it is lazily fused into the same
            # job, jumps cost shuffles but no extra scheduling barriers.
            for _ in range(jumps):
                parent = labels.select(
                    F.col("node").alias("p_node"),
                    F.col("component").alias("p_comp"),
                )
                labels = labels.join(
                    parent, labels["component"] == parent["p_node"], "left"
                ).select(
                    "node",
                    F.least(
                        "component", F.coalesce("p_comp", "component")
                    ).alias("component"),
                )
                # same sharing argument per jump: jump k+1 references
                # jump k's output twice; without the RDD cut the last
                # jump's plan holds 2^(k-1) copies of the first jump's
                # vertex join (15 joins instead of 4 per superstep)
                labels = labels.localCheckpoint(eager=False)
        # ONE action per superstep: the sum both materializes the lazy
        # checkpoint and tests convergence (labels are monotone
        # non-increasing, so an unchanged sum IS the fixpoint). decimal
        # accumulation cannot overflow (1e12 nodes × 2^63 ids < 10^38).
        labels = labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
