"""Iterative graph operators: connected components over candidate-pair
edges (EXT — dedup clustering).

The near-duplicate family (operators/dedup.py) emits PAIRS; a corpus
curator needs CLUSTERS — "these 7 documents are all the same article,
keep one." Pairs → clusters is connected components, the engine's
iterative-algorithm surface.

Algorithm: Pregel-style min-label propagation. Every node starts
labeled with its own id; each round, every node takes the min of its
own label and its neighbors' labels; fixpoint is reached in
O(component diameter) rounds, and the final label of each node is the
minimum node id in its component (the canonical representative —
consistent with exact_dedup's keep-lowest-id rule).

Scale shape per round: one symmetric edge join (shuffle on node id) +
one min-groupBy. The driver loop only counts changed labels
(convergence probe, a scalar per round) — the data never leaves the
cluster. Lineage is truncated every round with ``localCheckpoint``:
without it the plan doubles per iteration and the job dies on plan
explosion long before data size matters. (On a real cluster prefer
``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
executor-loss resilience; local mode has no such loss model.)

No reference counterpart (the reference has no graph surface); the SQL
oracle is a DuckDB recursive CTE computing min reachable id, so even
this iterative operator gets the full value-hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id1",
    dst_col: str = "id2",
    max_iter: int = 50,
) -> DataFrame:
    """Label each node of the undirected edge set with the minimum node
    id reachable from it. Output: (node, component).

    ``max_iter`` bounds the rounds (components converge in O(diameter);
    50 covers any realistic dedup graph — a chain of 2^50 near-identical
    documents does not exist). Raises if the bound is hit without
    convergence rather than returning a partial labeling.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    sym = sym.distinct().localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbor labels flow along (symmetrized) edges; keep own label too
        msgs = sym.join(
            labels, sym["src"] == labels["node"], "inner"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.select("node", "label")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    pairs: DataFrame,
    id1_col: str = "id1",
    id2_col: str = "id2",
) -> DataFrame:
    """Near-duplicate pairs → cluster assignment: (doc_id, cluster_id,
    is_representative). ``cluster_id`` is the minimum doc id in the
    duplicate cluster; the representative (the row to KEEP) is the one
    whose id equals it — transitively consistent, unlike dropping the
    higher id of each pair independently (A~B, B~C with no A~C edge
    must still collapse to one survivor)."""
    comp = connected_components(pairs, id1_col, id2_col)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_representative"),
    )
