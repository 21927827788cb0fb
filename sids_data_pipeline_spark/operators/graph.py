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


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank with integer-micros state: ranks live as
    BIGINT micros and every per-edge contribution rounds to micros
    BEFORE the per-node sum, so each iteration is an order-free integer
    aggregation — bit-identical under any shuffle order and mirrorable
    as unrolled SQL. Dangling-node mass is dropped (ranks then sum to
    < 1e6; standard simplification, documented rather than silently
    redistributed).

    Scale shape per iteration: one equi-join ranks⋈edges on the source
    key + one map-side-combined groupBy on the destination — the classic
    two-shuffle PR round, lineage kept shallow because ``iters`` is a
    small constant. Teleport re-attaches via a single-row broadcast.
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("_n"))
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.round(F.lit(1_000_000.0) / F.col("_n"), 0).cast("long").alias("rank_micros")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks["node"])
            .join(F.broadcast(deg), src_col)
            .select(
                F.col(dst_col).alias("node"),
                F.round(F.col("rank_micros") / F.col("_deg"), 0)
                .cast("long")
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                F.round(
                    F.lit(1 - damping) * 1_000_000 / F.col("_n")
                    + F.lit(damping) * F.coalesce("_in", F.lit(0)),
                    0,
                )
                .cast("long")
                .alias("rank_micros"),
            )
        )
    return ranks
