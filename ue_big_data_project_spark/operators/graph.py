"""Iterative graph operators: connected components for dedup clustering.

The canonical corpus-dedup closer: near-dup PAIRS (minhash/simhash/
jaccard output) become CLUSTERS, and one canonical document survives per
cluster. Components are computed by distributed min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint. The driver loop is CONTROL FLOW only — each
iteration is a join + grouped min over distributed data; convergence is
checked with a 1-row aggregate, never by collecting labels. Iteration
count is bounded by the component diameter (tiny for near-dup clusters,
which are dense); ``max_iters`` caps pathological chains.

Scale: every iteration shuffles on node id. For planet-scale graphs the
large-star/small-star optimization halves iterations; not needed at
near-dup-cluster diameters. AQE handles the shrinking label deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``nodes`` must contain every vertex (isolated vertices become their
    own singleton components); ``edges`` is undirected (each pair listed
    once, either direction).
    """
    # Symmetrize and MATERIALIZE the edge set once: the edge DataFrame
    # is typically the tail of an expensive pair pipeline (shingling,
    # prefix joins, verification) and every iteration would re-execute
    # that whole lineage otherwise.
    fwd = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    )
    sym = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    )
    # Convergence via the label-sum: labels only ever decrease, so the
    # sum strictly decreases until the fixpoint — one cheap scalar per
    # iteration instead of a join-and-compare pass.
    prev_sum: int | None = None
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            # Materialize so lineage doesn't snowball across iterations.
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Unconverged labels are silently WRONG clusters (a long chain
        # still propagating); downstream dedup would drop the wrong
        # documents. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "iterations; raise max_iters (iterations needed ≈ component "
            "diameter) or pre-contract the graph (large-star/small-star)"
        )
    return labels.select(
        F.col("node").alias(node_col), F.col("label").alias("component")
    )
