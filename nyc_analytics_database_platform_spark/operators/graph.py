"""Connected components over a pair/edge list - the clustering step that
turns near-duplicate PAIRS (from MinHash/SimHash/ngram dedup) into
duplicate GROUPS with one canonical representative each.

Algorithm: iterative min-label propagation (the standard large-scale
approach - a sequence of hash joins + min-aggregations, no driver-side graph
state). Each round every node adopts the smallest label among itself and its
neighbors; rounds repeat until a fixpoint. Round count is bounded by the
cluster diameter (near-dup clusters are tiny), and each round is two
shuffles: join labels->edges, then groupBy min.

At 100 TB: edges and labels are both DataFrames partitioned on node id, the
join is shuffle-hash on that key, and convergence checks are cheap count
aggregates. localCheckpoint between rounds truncates the lineage so plans
do not grow with iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in the edge list; component = min
    node id in the connected component. Deterministic."""
    both = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    both = both.distinct().localCheckpoint(eager=True)

    labels = (
        both.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iterations):
        neighbor_labels = (
            both.join(labels, both.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
        )
        propagated = (
            labels.select("node", "label")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            # materialized before the self-join below: also sidesteps a
            # Catalyst attribute-resolution failure on Union + self-join
            .localCheckpoint(eager=True)
        )
        # Pointer jumping: node.label <- label(node.label). Plain neighbor
        # propagation moves the minimum ONE hop per round (linear in the
        # component diameter); composing with the label mapping doubles the
        # reach per round, giving O(log diameter) convergence - the standard
        # large-scale CC acceleration.
        mapping = propagated.select(
            F.col("node").alias("_mn"), F.col("label").alias("_ml")
        )
        new_labels = (
            propagated.join(mapping, propagated.label == F.col("_mn"), "left")
            .select(
                "node", F.coalesce(F.col("_ml"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the bound); raise "
            "max_iterations - silently returning partial labels would keep "
            "multiple 'canonical' docs per real cluster"
        )
    return labels.select("node", F.col("label").alias("component"))
