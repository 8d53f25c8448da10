"""Connected components over near-duplicate pair edges — the step
that turns pairwise dedup output (q28/q30/q37) into disjoint
duplicate CLUSTERS with one canonical survivor each.

Algorithm: iterative min-label propagation. Every node starts
labeled with its own id; each round, a node adopts the minimum label
in its neighborhood; fixpoint after O(component diameter) rounds.
Near-dup graphs are unions of small dense cliques (diameter ≤ ~3),
so convergence is fast regardless of corpus size.

Scale notes:

- each round is one join + one groupBy on the edge list — shuffle
  size O(|E|), never materializing components in driver memory
  (union-find would);
- ``localCheckpoint`` every round truncates the lineage so the plan
  doesn't grow exponentially across iterations (the classic
  iterative-Spark trap);
- ``max_iter`` bounds a pathological chain; the driver-side
  convergence check is one count per round on a frame that shrinks
  to zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Output: ``node, component`` where ``component`` is the MIN node
    id reachable from ``node`` (undirected edges)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            pairs.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "v"), "v"
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels
