"""Connected components / dedup clustering: transitive closure over
pair edges, hand-checked fixtures."""

from __future__ import annotations

import pytest

from sids_data_pipeline_spark.operators import graph


def test_chain_collapses_to_one_cluster(spark):
    # A-B, B-C, C-D: no direct A-D edge, but all one component
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id1 long, id2 long"
    )
    comp = {r.node: r.component for r in graph.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_stay_separate(spark):
    edges = spark.createDataFrame(
        [(1, 2), (10, 11), (11, 12), (20, 21)], "id1 long, id2 long"
    )
    comp = {r.node: r.component for r in graph.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_edge_direction_irrelevant(spark):
    # min id appears as id2: propagation must flow both ways
    edges = spark.createDataFrame([(5, 1), (5, 9)], "id1 long, id2 long")
    comp = {r.node: r.component for r in graph.connected_components(edges).collect()}
    assert comp == {1: 1, 5: 1, 9: 1}


def test_dedup_clusters_representative(spark):
    pairs = spark.createDataFrame([(3, 7), (7, 5)], "id1 long, id2 long")
    rows = {r.doc_id: r for r in graph.dedup_clusters(pairs).collect()}
    assert all(r.cluster_id == 3 for r in rows.values())
    assert rows[3].is_representative
    assert not rows[5].is_representative and not rows[7].is_representative


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id1 long, id2 long")
    with pytest.raises(RuntimeError, match="converge"):
        graph.connected_components(edges, max_iter=1)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find_random(spark):
    """Property: min-label propagation equals union-find min-id labeling
    on seeded random graphs (long chains, stars, isolated pairs)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(40)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id1 long, id2 long")
        got = {
            r.node: r.component
            for r in graph.connected_components(df).collect()
        }
        assert got == _uf_components(edges), f"trial {trial}"


def test_pagerank_star_graph_hand_computed(spark):
    """Star 1->0, 2->0, 3->0 plus 0->1: hub 0 accumulates rank; values
    checked against a hand-rolled python mirror of the micros algebra."""
    from sids_data_pipeline_spark.operators.graph import pagerank

    e = [(1, 0), (2, 0), (3, 0), (0, 1)]
    edges = spark.createDataFrame(e, "src long, dst long")
    got = {r.node: r.rank_micros for r in pagerank(edges, iters=3).collect()}

    # python mirror (HALF_UP like Spark/DuckDB ROUND, not banker's)
    import math

    hround = lambda x: int(math.floor(x + 0.5))
    nodes = {0, 1, 2, 3}
    deg = {0: 1, 1: 1, 2: 1, 3: 1}
    r = {n: hround(1_000_000.0 / 4) for n in nodes}
    for _ in range(3):
        cin = {}
        for s, d in e:
            cin[d] = cin.get(d, 0) + hround(r[s] / deg[s])
        r = {
            n: hround((1 - 0.85) * 1_000_000 / 4 + 0.85 * cin.get(n, 0))
            for n in nodes
        }
    assert got == r
    assert got[0] > got[1] > got[2]  # hub dominates; 1 gets 0's mass
    assert got[2] == got[3]


def test_pagerank_ranks_sum_bounded(spark):
    """No dangling nodes -> total rank stays ~1e6 (rounding drift only)."""
    from sids_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    total = sum(
        r.rank_micros for r in pagerank(edges, iters=4).collect()
    )
    assert abs(total - 1_000_000) <= 10


def test_triangles_hand_computed(spark):
    """K4 has 4 triangles; adding a pendant edge changes nothing."""
    from sids_data_pipeline_spark.operators.graph import count_triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "src long, dst long")
    row = count_triangles(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 7, 4)


def test_triangles_match_bruteforce_random(spark):
    """Seeded random graph vs O(n^3) brute force."""
    import itertools
    import random

    from sids_data_pipeline_spark.operators.graph import count_triangles

    rng = random.Random(7)
    n = 30
    edge_set = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < 0.25
    }
    expect = sum(
        1
        for x, y, z in itertools.combinations(range(n), 3)
        if (x, y) in edge_set and (y, z) in edge_set and (x, z) in edge_set
    )
    # feed edges in mixed orientation with duplicates: canonicalization
    # must absorb both
    noisy = [(b, a) if (a + b) % 3 == 0 else (a, b) for a, b in edge_set]
    edges = spark.createDataFrame(noisy + noisy[:10], "src long, dst long")
    row = count_triangles(edges).collect()[0]
    assert row.n_triangles == expect
    assert row.n_edges == len(edge_set)


def test_cobasket_cap_drops_hot_groups(spark):
    """A group above max_group_size contributes no pairs at all."""
    from sids_data_pipeline_spark.operators.graph import cobasket_edges

    rows = [("hot", i) for i in range(10)] + [("ok", 1), ("ok", 2)]
    df = spark.createDataFrame(rows, "g string, item long")
    got = cobasket_edges(df, "g", "item", max_group_size=5).collect()
    assert [(r.src, r.dst) for r in got] == [(1, 2)]
