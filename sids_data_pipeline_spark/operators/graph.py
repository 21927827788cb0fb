"""Iterative graph operators: connected components over candidate-pair
edges (EXT — dedup clustering).

The near-duplicate family (operators/dedup.py) emits PAIRS; a corpus
curator needs CLUSTERS — "these 7 documents are all the same article,
keep one." Pairs → clusters is connected components, the engine's
iterative-algorithm surface.

Algorithm: HYBRID. A few rounds of Pregel-style min-label propagation
first — each round one edge join + one min-groupBy, the cheapest
per-round plan, and dense near-dup clusters (this operator's actual
workload: diameters of 2-4) converge inside the budget. Graphs that
don't converge switch to alternating LARGE-STAR / SMALL-STAR (Kiveris
et al. 2014, "Connected Components in MapReduce and Beyond"): each
round rewires the edge set toward rooted stars — large-star links
every strictly-larger neighbor of a node to the minimum of its
neighborhood, small-star links every smaller neighbor (and the node
itself) to that minimum. Fixpoint — the edge set stops changing — is
a forest of stars whose root is the minimum node id of each component
(the canonical representative, consistent with exact_dedup's
keep-lowest-id rule). The star phase converges in O(log² n) rounds
worst-case (~log n practical) versus O(component diameter) for pure
propagation: a 100k-node chain finishes in ~15 star rounds instead of
100k — the propagation-only r9 implementation could not complete it
at any max_iter a user would wait for. The star phase is seeded with
the propagated label links, so the propagation rounds also accelerate
deep graphs instead of being discarded.

Scale shape: propagation rounds are one shuffle join + one combined
min-agg; star rounds are two groupBy-min + equi-join passes over
CANONICAL (u > v) edges — on that orientation each phase is a single
emission per edge with no symmetric-union doubling — plus a
count-gated set-difference convergence probe that runs at most once
before the final round. Edge count never grows (each round emits ≤
one edge per input edge + one per node, deduplicated). The data never
leaves the cluster. Lineage is truncated every round with
``localCheckpoint``: without it the plan doubles per iteration and
the job dies on plan explosion long before data size matters. (On a
real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
``checkpoint()`` for executor-loss resilience; local mode has no such
loss model.)

No reference counterpart (the reference has no graph surface); the SQL
oracle is a DuckDB recursive CTE computing min reachable id, so even
this iterative operator gets the full value-hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(df: DataFrame) -> DataFrame:
    """Canonical undirected form (u = greater endpoint, v = smaller),
    self-loops dropped, deduplicated — the orientation both star
    phases operate on (they preserve it, so this runs once)."""
    return (
        df.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


# label-propagation rounds before switching to star alternation: dense
# near-dup clusters (the operator's actual workload) converge within a
# few rounds of the cheaper propagation (2-3 shuffles/round vs ~5); the
# switch only happens for genuinely deep graphs, where propagation
# would need O(diameter) rounds and the stars need O(log²)
PROPAGATE_ROUNDS = 4


def connected_components(
    edges: DataFrame,
    src_col: str = "id1",
    dst_col: str = "id2",
    max_iter: int = 50,
) -> DataFrame:
    """Label each node of the undirected edge set with the minimum node
    id reachable from it. Output: (node, component).

    Hybrid (see module docstring): up to ``PROPAGATE_ROUNDS`` of
    min-label propagation — the cheap per-round plan that finishes
    shallow dedup graphs outright — then, if not converged, alternating
    large-star/small-star over the original edges PLUS the propagated
    label links (each node enters the star phase already shortcut
    toward its best-known minimum, so the propagation rounds are never
    wasted). Each star round is two groupBy-min rewires; the fixpoint
    edge set is a star forest (node → component-min) read off directly
    as the labeling. ``max_iter`` bounds the total rounds (the star
    phase is O(log² n) worst case — 50 covers graphs astronomically
    past any dedup corpus). Raises if the bound is hit without
    convergence rather than returning a partial labeling.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    # non-eager checkpoints throughout (r15, guide §1 — job-count floor):
    # every round already ends in a count() whose job materializes the
    # round's checkpoint, so the eager form paid one extra driver-side
    # job barrier per round (and two at setup) for nothing — the
    # lineage truncation is identical once materialized
    sym = sym.distinct().localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    rounds_left = max_iter
    for _ in range(min(PROPAGATE_ROUNDS, max_iter)):
        rounds_left -= 1
        msgs = sym.join(
            labels, sym["src"] == labels["node"], "inner"
        ).select(
            F.col("dst").alias("node"),
            "label",
            F.lit(None).cast(labels.schema["label"].dataType).alias("_old"),
        )
        # the node's previous label rides the same min-aggregation (it is
        # unique per node, so min(_old) recovers it exactly): the changed
        # probe becomes a shuffle-free scan of the fresh checkpoint
        # instead of a second join of two checkpointed label tables
        new_labels = (
            labels.select("node", "label", F.col("label").alias("_old"))
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("_old").alias("_old"))
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))

    # not converged in the propagation budget: the graph is deep —
    # switch to the stars, seeded with the label shortcuts
    e = _canon_edges(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v")).union(
            labels.select(F.col("node").alias("u"), F.col("label").alias("v"))
        )
    ).localCheckpoint(eager=False)
    e_cnt = e.count()
    converged = False
    for _ in range(rounds_left):
        # LARGE-STAR: per node x, m(x) = min(N(x) ∪ {x}); every
        # strictly-larger neighbor of x re-links to m(x). On canonical
        # edges this is ONE emission per edge — (u,v) with u > v makes
        # u a larger neighbor of v, so the round's whole output is
        # {(u, m(v))}, where m(v) = min(smaller neighbors of v ∪ {v})
        # comes from one groupBy (larger neighbors can never be the
        # min). No symmetric union, and the output is canonical by
        # construction (m(v) ≤ v < u) with no self-loops possible.
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        large = e.join(
            mins.withColumnsRenamed({"u": "v", "m": "mv"}), "v", "left"
        ).select("u", F.coalesce("mv", "v").alias("v"))
        # SMALL-STAR: per node u over its smaller neighbors (exactly
        # the canonical orientation), m = min(N⁻(u) ∪ {u}); each
        # smaller neighbor AND u itself re-link to m. Emissions are
        # again canonical (m ≤ v < u); only the v = m self-loop needs
        # dropping.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # converged ⟺ the round was a no-op on the (distinct) edge set.
        # Counts carry across rounds (one scan over the fresh checkpoint
        # per round); the set-difference probe only runs when counts
        # match, i.e. at most once before the final round.
        small_cnt = small.count()
        if (
            small_cnt == e_cnt
            and small.exceptAll(e).limit(1).count() == 0
        ):
            e = small
            converged = True
            break
        e, e_cnt = small, small_cnt
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # fixpoint is a star forest: every non-root has exactly one edge
    # (node, root); roots label themselves
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .distinct()
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


def cobasket_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int = 64,
) -> DataFrame:
    """Distinct undirected co-occurrence edges: items sharing a group
    (parts in one order, tokens in one doc) become an edge (src < dst).

    Pair generation is quadratic in group size, so groups larger than
    ``max_group_size`` are dropped BEFORE pairs are emitted — the same
    degenerate-bucket guard the LSH pipeline uses (dedup.py): one hot
    basket of 10^4 items would otherwise emit 10^8 pairs into the
    shuffle. The cap is part of the operator's contract (mirrored by the
    SQL oracle), not a silent truncation.

    Shape (r14, guide §2.2 — shuffle less): ONE ``collect_set``
    aggregation (map-side combined) builds each group's distinct item
    set, the size cap filters the arrays, and the i<j pairs expand
    JVM-side from the sorted array — replacing the former 5-shuffle
    chain (distinct → size agg → semi-join → per-group self-join →
    distinct) with groupBy + final distinct. The emitted edge set is
    identical: pairs of a sorted distinct array under i<j are exactly
    the item<item pairs of the old self-join.
    """
    # NULL faithfulness to the join form: NULL groups emitted no pairs
    # (equi-join drops them), and a NULL item counted one distinct row
    # toward the size cap without ever pairing. The i<j expansion is two
    # chained codegen Generate nodes (posexplode + sliced explode) — the
    # single-expression HOF form (array-of-structs + flatten) measured
    # 1.6x slower interpreted.
    return (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.array_sort(F.collect_set(item_col)).alias("_items"),
            F.max(F.col(item_col).isNull().cast("int")).alias("_null"),
        )
        .filter(F.size("_items") + F.col("_null") <= max_group_size)
        .select("_items", F.posexplode("_items").alias("_i", "src"))
        .select(
            "src",
            F.explode(
                F.expr("slice(_items, _i + 2, size(_items))")
            ).alias("dst"),
        )
        .distinct()
    )


def count_triangles(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact triangle count of an undirected graph via degree-ordered
    orientation — one row (n_nodes, n_edges, n_triangles).

    Every edge is oriented from its (degree, id)-smaller endpoint to the
    larger one; the orientation is acyclic (degree-then-id is a total
    order), so each triangle has exactly one source edge (u→v) whose
    endpoints share the third node as a common OUT-neighbor:
    ``n_triangles = Σ_{(u,v)∈oriented} |N⁺(u) ∩ N⁺(v)|``. The r14 shape
    (guide §2.2 — shuffle fewer bytes) materializes per-node out-
    adjacency arrays (one groupBy) and intersects them per edge with two
    equi-joins — total shuffle O(m) adjacency entries, replacing the
    explicit wedge join + closing semi-join whose intermediate is
    O(m^1.5) rows (sf0.1: 41M wedges shuffled for 1.9M closures). The
    orientation still bounds out-degree by O(√m) (a node of degree d
    keeps ≤ √(2m) out-edges — any out-neighbor has degree ≥ d), so each
    adjacency array is ≤ √(2m) entries regardless of skew: the hub of a
    star graph keeps ZERO out-edges. All joins are equi-joins on node
    ids; no Python, no collect.
    """
    from sids_data_pipeline_spark.lifecycle import track

    e = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # e / deg / oriented each feed multiple consumers; without persist
    # the edge-generation lineage re-executes per consumer and the plan
    # tree explodes combinatorially (planaudit measured 146 Exchange
    # nodes unpersisted vs 7 persisted)
    e = track(e.persist())
    # deg feeds three consumers (both orientation joins + n_nodes):
    # persisted, the union + aggregation runs once
    deg = track(
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    keyed = e.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("deg_dst"),
    )
    oriented = track(oriented.persist())
    # out-adjacency arrays, ≤ √(2m) entries each by the degree bound;
    # intersection size is order-insensitive so no sort is needed, and
    # arrays are exact sets (e is distinct) so the distinct-semantics of
    # array_intersect is the exact set intersection
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("_adj"))
    au = adj.select(F.col("src"), F.col("_adj").alias("_au"))
    av = adj.select(F.col("src").alias("dst"), F.col("_adj").alias("_av"))
    per_edge = (
        oriented.select("src", "dst")
        .join(au, "src")
        .join(av, "dst", "left")  # a sink node has no out-adjacency row
        .select(
            F.when(F.col("_av").isNull(), F.lit(0))
            .otherwise(F.size(F.array_intersect("_au", "_av")))
            .alias("_t")
        )
    )
    n_tri = per_edge.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_triangles")
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


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
            # deg is O(V) rows — no broadcast hint (forcing it would OOM
            # at 1e8+ nodes); AQE picks broadcast itself on small graphs
            .join(deg, src_col)
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
