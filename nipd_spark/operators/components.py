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

Spark-first notes: each round is join(labels ⋈ edges) + groupBy(min) —
partial aggregation applies map-side; labels are localCheckpoint()ed
every round to cut the growing lineage (iterative plans otherwise
re-execute from the source and the plan tree grows without bound).
Convergence = count of changed labels == 0 (one action per round).

At 100 TB: labels shuffle on node id each round; a giant component
makes its min node a hot key only in degenerate star topologies —
the groupBy is on the *receiving* node, which keeps load uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, component) — component = min node id in each component.

    ``edges`` is undirected; self-loops and duplicate edges tolerated.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min label over the closed neighborhood of each node
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least("component", F.coalesce("nbr_component", "component")).alias(
                "component"
            ),
        )
        # Pointer jumping (path compression): component <- label(component).
        # Every label is itself a node id, so one extra equi-join per round
        # halves the remaining distance to the component min — convergence
        # drops from O(diameter) rounds to O(log diameter), which on long
        # path/chain topologies is the difference between 5 and 50 shuffles.
        parent = propagated.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            propagated.join(
                parent, propagated.component == parent.p_node, "left"
            )
            .select(
                "node",
                F.least(
                    "component", F.coalesce("p_comp", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
