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


def pagerank(
    edges: DataFrame,
    src: str = "w1",
    dst: str = "w2",
    weight: str = "c",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    slot: str | None = None,
) -> DataFrame:
    """Weighted PageRank to (near-)fixpoint over an edge-count table —
    the driver-side loop around the oracle-checked single step (q109,
    ``plans/llm_queries.py``). Dangling mass is discarded each round
    (documented q109 semantics, applied consistently).

    Output: ``node, rank`` for every node with ≥1 in-edge, plus the
    constant ``(1-d)/N`` rank for source-only nodes, so ranks cover
    the full node set.

    Cross-engine determinism (the q109 convention, carried through
    the loop): per-edge contributions are IEEE-exact chains on
    identical operands (edge weights are integer counts, so the
    out-weight double sum is exact), and each round's in-edge sum
    goes through DECIMAL(38,18) rounded to 12 decimals —
    order-independent, so a CTE-unrolled SQL twin reproduces the
    ranks bit-for-bit (q118's oracle unrolls two rounds this way).

    ``tol <= 0`` pins the loop to exactly ``max_iter`` rounds and
    skips the per-round convergence aggregate (the fixed-budget mode
    q118 runs in).

    Scale notes (same discipline as :func:`connected_components`):
    one join + one groupBy per round over the COMPACT edge table —
    corpus text is never touched inside the loop; ``localCheckpoint``
    per round truncates lineage; convergence is a driver-side max-
    delta aggregate on the vocab-sized rank table.

    ``slot``: train-once-reuse (the ``kmeans_train`` convention —
    see that docstring for the contract). The rank table is a pure
    function of (edges, hyper-parameters); its output plan rides
    fresh ``localCheckpoint`` RDDs each run, so the slot is keyed by
    an explicit :func:`caching.plan_sig` over the EDGE frame's plan
    + file listing + every hyper-parameter. Deterministic loop
    (DECIMAL in-edge sums), so a warm hit is result-identical.
    """
    from ..caching import plan_sig, slot_lookup, slot_persist

    if slot is not None:
        sig = plan_sig(edges, src, dst, weight, damping, max_iter, tol)
        hit = slot_lookup(slot, sig, edges.sparkSession)
        if hit is not None:
            return hit

    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).cast("double").alias("w"),
    ).localCheckpoint()
    out_w = e.groupBy("u").agg(F.sum("w").alias("out_w"))
    # normalize ONCE before the loop: every iteration then costs one
    # join + one groupBy instead of re-deriving the out-degree
    # aggregate and its join each round
    e_norm = (
        e.join(out_w, "u")
        .select("u", "v", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:  # empty graph → empty ranks, like connected_components
        empty = nodes.withColumn("rank", F.lit(0.0))
        return slot_persist(slot, empty, sig=sig) if slot else empty
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(max_iter):
        contrib = (
            e_norm.join(ranks.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"),
                (F.col("rank") * F.col("p")).alias("x"),
            )
        )
        inflow = contrib.groupBy("node").agg(
            F.round(F.sum(F.col("x").cast("decimal(38,18)")), 12)
            .cast("double")
            .alias("inflow")
        )
        new_ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if tol <= 0:  # fixed-budget mode: no convergence aggregate
            ranks = new_ranks
            continue
        delta = (
            new_ranks.withColumnRenamed("rank", "new_rank")
            .join(ranks, "node")
            .agg(F.max(F.abs(F.col("new_rank") - F.col("rank"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    if slot is not None:
        # vocab-sized, already localCheckpointed — the persist is
        # negligible; the slot's value is skipping the LOOP next time
        return slot_persist(slot, ranks, sig=sig)
    return ranks
