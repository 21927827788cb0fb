"""Similarity-search tests: exact top-k against a numpy oracle, ANN
recall against the exact result."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators import similarity
from sids_data_pipeline_spark.sources.tables import load_table

K = 10
N_QUERIES = 5


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir)


@pytest.fixture(scope="module")
def np_oracle(emb):
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    # mirror the engine's exact-integer domain
    iv = np.round(mat * 1_000_000)
    norms = np.sqrt((iv * iv).sum(axis=1))
    cos = (iv @ iv.T) / np.outer(norms, norms)
    return ids, cos


def test_topk_matches_numpy(emb, np_oracle):
    ids, cos = np_oracle
    got = similarity.topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=K
    ).collect()
    by_query: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == set(range(N_QUERIES))
    for q, rows in by_query.items():
        qi = int(np.where(ids == q)[0][0])
        sims = cos[qi].copy()
        sims[qi] = -np.inf  # exclude self
        # numpy oracle: top-k by (cosine desc, id asc)
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:K]
        want = [int(ids[j]) for j in order]
        assert [r.neighbor_id for r in rows] == want
        for r, j in zip(rows, order):
            assert abs(r.cosine - sims[j]) < 1e-5


def test_ann_lsh_recall(emb):
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = similarity.topk_bruteforce(emb, queries, k=K).collect()
    approx = similarity.ann_lsh(emb, queries, k=K).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / K for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, f"mean recall too low: {recalls}"


def test_cosine_pairs_symmetric_threshold(emb):
    pairs = similarity.cosine_pairs(emb, threshold=0.35, block_col="label").collect()
    assert all(r.id1 < r.id2 for r in pairs)
    assert all(r.cosine >= 0.35 for r in pairs)


def test_topk_zero_norm_and_empty_queries(spark):
    """Edge cases vs JVM/oracle semantics: a zero-norm candidate scores
    NaN and ranks FIRST (NaN is the largest double in Spark/DuckDB
    ordering — must survive the pandas->Arrow NULL conversion); an empty
    query set returns an empty frame with the contract schema."""
    import math

    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.similarity import topk_bruteforce

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    zero = (
        emb.limit(1)
        .withColumn("embedding", F.expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
        .withColumn("vec_id", F.lit(99999).cast("long"))
    )
    out = topk_bruteforce(emb.unionByName(zero), emb.filter("vec_id = 1"), k=3).collect()
    assert out[0].neighbor_id == 99999 and math.isnan(out[0].cosine)
    assert out[0].rank == 1

    empty = topk_bruteforce(emb, emb.filter("vec_id < 0"), k=3)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_topk_query_side_collect_is_bounded(spark):
    """A corpus-sized query frame must refuse (with the ann_lsh pointer)
    instead of collecting the whole side onto the driver; the explicit
    query_limit override re-admits it."""
    from sids_data_pipeline_spark.operators.similarity import topk_bruteforce

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="ann_lsh"):
        topk_bruteforce(emb, emb, k=2, query_limit=5)
    out = topk_bruteforce(
        emb.limit(20), emb.limit(6), k=2, query_limit=6
    )
    assert out.count() == 12  # 6 queries × k=2, exactly at the cap


def test_cosine_pairs_all_pairs_guard(spark, monkeypatch):
    """block_col=None refuses inputs above ALL_PAIRS_LIMIT instead of
    launching a quadratic crossJoin."""
    from sids_data_pipeline_spark.operators import similarity

    df = spark.range(0, 50).selectExpr(
        "id AS vec_id", "array(cast(id as float), 1.0F) AS embedding"
    )
    monkeypatch.setattr(similarity, "ALL_PAIRS_LIMIT", 10)
    with pytest.raises(ValueError, match="all-pairs"):
        similarity.cosine_pairs(df, block_col=None)
    # under the cap the exact path still works
    monkeypatch.setattr(similarity, "ALL_PAIRS_LIMIT", 1000)
    assert similarity.cosine_pairs(df, threshold=-1.0, block_col=None).count() > 0


def test_quantized_vec_range_and_zero(spark):
    from sids_data_pipeline_spark.operators import similarity
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r.q for r in df.select(
        "vec_id", similarity.quantized_vec("embedding").alias("q")
    ).collect()}
    # max-abs element maps to ±127; others scale proportionally
    assert rows[1] == [64, -127, 32]
    assert rows[2] == [0, 0, 0]


def test_quantized_topk_close_to_exact(spark):
    """Quantization is lossy but the top-1 neighbor should usually agree
    with the exact ranking on real embeddings (sanity, not exactness)."""
    from sids_data_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    exact = {
        r.query_id: r.neighbor_id
        for r in similarity.topk_bruteforce(emb, queries, k=1).collect()
    }
    quant = {
        r.query_id: r.neighbor_id
        for r in similarity.topk_quantized(emb, queries, k=1).collect()
    }
    agree = sum(exact[q] == quant[q] for q in exact)
    assert agree >= 2  # at least 2 of 3 top-1 neighbors survive int8


def test_kmeans_assign_nearest_and_tiebreak(spark):
    from sids_data_pipeline_spark.operators.similarity import kmeans_assign

    # two obvious clusters around (0,0) and (10,10); ids 0,1 seed them
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.1, -0.1]),
        (3, [9.9, 10.2]),
        (4, [5.0, 5.0]),  # equidistant -> tie breaks to centroid 0
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {r.vec_id: r.cluster for r in kmeans_assign(df, k=2).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}


def test_kmeans_assign_is_join_free_codegen(spark, sf_dir):
    from sids_data_pipeline_spark.operators.similarity import kmeans_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        kmeans_assign(emb, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Python" not in plan


def test_kmeans_fit_separates_clusters_and_converges(spark):
    from sids_data_pipeline_spark.operators.similarity import kmeans_fit

    # 3 tight blobs; seeds (ids 0,1) start in blob A -> iteration must
    # migrate a centroid out to capture blob B
    blob_a = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(4)]
    blob_b = [(10 + i, [20.0, 20.0 + 0.01 * i]) for i in range(4)]
    df = spark.createDataFrame(
        blob_a + blob_b, "vec_id bigint, embedding array<float>"
    )
    cents, assigned = kmeans_fit(df, k=2, iters=4)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    a_clusters = {got[i] for i, _ in blob_a}
    b_clusters = {got[i] for i, _ in blob_b}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters
    # centroids converged onto the blob means (micros domain)
    ca, cb = cents[list(a_clusters)[0]], cents[list(b_clusters)[0]]
    assert abs(ca[0] - 15000) < 2000 and abs(ca[1]) < 2000
    assert abs(cb[0] - 20000000) < 20000 and abs(cb[1] - 20015000) < 20000


def test_cosine_pairs_drops_zero_norm_vectors(spark):
    """An all-zero embedding must emit NO pairs: its cosine with
    everything is NaN, which Spark compares larger than any threshold —
    without the norm guard it would 'near-duplicate' its whole block
    and the dedup chain would delete real documents (round-7 review)."""
    from sids_data_pipeline_spark.operators.similarity import cosine_pairs

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    pairs = cosine_pairs(emb, threshold=0.5).collect()
    assert {(r.id1, r.id2) for r in pairs} == {(1, 2)}
    assert all(r.cosine == r.cosine for r in pairs)  # no NaN survived


def test_kmeans_fit_returns_self_consistent_pair(spark):
    """The returned assignment must be computed UNDER the returned
    centroids (the last Lloyd update used to be applied after the
    assignment was taken)."""
    from sids_data_pipeline_spark.operators.similarity import (
        kmeans_assign,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, assigned = kmeans_fit(emb, k=4, iters=2)
    redo = kmeans_assign(emb, k=4, centroids=cents)
    got = {(r.vec_id, r.cluster, r.dist2) for r in assigned.collect()}
    want = {(r.vec_id, r.cluster, r.dist2) for r in redo.collect()}
    assert got == want


def test_ann_lsh_empty_candidates(spark):
    from sids_data_pipeline_spark.operators.similarity import ann_lsh

    schema = "vec_id long, embedding array<float>"
    empty = spark.createDataFrame([], schema)
    q = spark.createDataFrame([(1, [1.0, 0.0])], schema)
    out = ann_lsh(empty, q)
    assert out.collect() == []
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_round_half_away_ratio_exact():
    from sids_data_pipeline_spark.operators.similarity import (
        _round_half_away_ratio,
    )

    assert _round_half_away_ratio(5, 2) == 3     # 2.5 -> 3 (not banker's 2)
    assert _round_half_away_ratio(-5, 2) == -3
    assert _round_half_away_ratio(4, 2) == 2
    assert _round_half_away_ratio(7, 3) == 2
    # exactness past 2^53, where float division would lose ulps
    big = 2**60 + 1
    assert _round_half_away_ratio(big * 2, 2) == big


def test_semantic_dedup_drops_copies_keeps_representative(spark):
    """SemDeDup: an exact re-embedding lands in its twin's cluster and
    is dropped (higher id); the min-id representative and unrelated
    vectors survive; zero-norm vectors never pair (NaN-cosine guard)."""
    from sids_data_pipeline_spark.operators.similarity import semantic_dedup

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, a), (1, b),
        (2, [x * 2.0 for x in a]),   # same direction as a: cosine 1.0
        (3, [0.0, 0.0, 0.0, 0.0]),   # zero-norm: must never pair
        (4, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to everything
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r.dropped for r in
           semantic_dedup(emb, k=2, threshold=0.95).collect()}
    assert got == {0: False, 1: False, 2: True, 3: False, 4: False}


def test_pca_matches_numpy_and_is_deterministic(spark):
    """pca_fit's model must equal full-precision numpy PCA on the
    collected data (same centering, same eigen-ordering, same sign
    convention), twice in a row (determinism), and the codegen
    projection must match the numpy projection per row."""
    import numpy as np
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.similarity import (
        pca_fit,
        pca_transform,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    m = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    mean = m.mean(axis=0)
    cov = (m - mean).T @ (m - mean) / m.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    want_comps = evecs[:, order].T
    for i in range(3):
        j = int(np.abs(want_comps[i]).argmax())
        if want_comps[i, j] < 0:
            want_comps[i] = -want_comps[i]

    model = pca_fit(emb, k=3)
    model2 = pca_fit(emb, k=3)
    assert model == model2  # deterministic re-fit
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["explained"], evals[order], atol=1e-9)
    assert np.allclose(model["components"], want_comps, atol=1e-8)
    # components orthonormal
    c = np.asarray(model["components"])
    assert np.allclose(c @ c.T, np.eye(3), atol=1e-9)
    # explained variance descending
    assert sorted(model["explained"], reverse=True) == model["explained"]

    got = {
        r.vec_id: np.asarray(r.pc)
        for r in pca_transform(emb, model).select("vec_id", "pc").collect()
    }
    want = (m - mean) @ want_comps.T
    for idx, r in enumerate(rows):
        assert np.allclose(got[r.vec_id], want[idx], atol=1e-8)

    import pytest

    with pytest.raises(ValueError, match="k"):
        pca_fit(emb, k=0)
    with pytest.raises(ValueError, match="outside"):
        pca_fit(emb, k=65)


def test_pca_whiten_unit_variance(spark):
    import numpy as np

    from sids_data_pipeline_spark.operators.similarity import (
        pca_fit,
        pca_transform,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = pca_fit(emb, k=3)
    w = pca_transform(emb, model, whiten=True).select("pc").collect()
    m = np.stack([np.asarray(r.pc) for r in w])
    var = m.var(axis=0)  # population variance, matching the fit's /n
    assert np.allclose(var, 1.0, atol=1e-8)


def test_pca_ignores_null_vectors(spark):
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.similarity import pca_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with_nulls = emb.unionByName(
        emb.limit(3).withColumn("embedding", F.lit(None).cast("array<float>"))
    )
    assert pca_fit(with_nulls, k=2) == pca_fit(emb, k=2)


def test_pca_transform_null_semantics(spark):
    """Pin pca_transform's null semantics (ADVICE r14): a NULL vector, a
    width-mismatched vector, AND a vector with a null element all yield
    the all-null projection array — identical to the r13 JVM zip_with
    null propagation (the null element maps to numpy NaN, poisons every
    component through the multiply-add chain, and Arrow's NaN→null
    return conversion restores SQL NULL)."""
    from sids_data_pipeline_spark.operators.similarity import (
        pca_fit,
        pca_transform,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = pca_fit(emb, k=2)
    d = len(model["mean"])
    odd = spark.createDataFrame(
        [
            (9001, None),
            (9002, [0.5] * (d - 1)),  # width mismatch
            (9003, [None] + [0.5] * (d - 1)),  # null element, right width
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.pc
        for r in pca_transform(odd, model).select("vec_id", "pc").collect()
    }
    assert got[9001] == [None, None]
    assert got[9002] == [None, None]
    assert got[9003] == [None, None]


def test_pq_encode_matches_numpy_argmin(spark, emb):
    """pq_encode's per-subspace nearest-codeword index equals the numpy
    argmin over the same integer micros domain, and topk_pq's ADC
    distances equal the numpy table-lookup sums — the whole PQ path
    (fit → encode → asymmetric search) against an independent oracle."""
    books = similarity.pq_fit(emb, m=4, kc=8, iters=2)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 16
    cb = np.asarray(books, dtype=np.int64)  # (m, kc, sub)

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.round(
        np.array(pdf["embedding"].tolist(), dtype=np.float64) * 1_000_000
    ).astype(np.int64)
    sub = mat.reshape(len(pdf), 4, 16)
    # numpy argmin with first-match tie-break == array_position semantics
    d2 = ((sub[:, :, None, :] - cb[None]) ** 2).sum(axis=3)  # (n, m, kc)
    want_codes = d2.argmin(axis=2)

    got = (
        similarity.pq_encode(emb, books)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(np.array(got["codes"].tolist()), want_codes)

    # ADC: engine dist2 for (query, neighbor) == table[s][code_s] sums
    queries = emb.filter(F.col("vec_id") < 3)
    pq = similarity.topk_pq(emb, queries, books, k=5).toPandas()
    ids = pdf["vec_id"].to_numpy()
    pos = {int(v): i for i, v in enumerate(ids)}
    for row in pq.itertuples():
        q = sub[pos[int(row.query_id)]]            # (m, 16)
        tbl = ((q[:, None, :] - cb) ** 2).sum(axis=2)  # (m, kc)
        codes = want_codes[pos[int(row.neighbor_id)]]
        assert row.dist2 == int(tbl[np.arange(4), codes].sum())
    # ranks are 1..5 per query, ADC-sorted with id tie-break
    for qid, grp in pq.groupby("query_id"):
        assert list(grp.sort_values("rank")["rank"]) == [1, 2, 3, 4, 5]
        srt = grp.sort_values(["dist2", "neighbor_id"]).reset_index(drop=True)
        assert list(srt["rank"]) == [1, 2, 3, 4, 5]


def test_pq_fit_refusals(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_fit(emb, m=5)
    with pytest.raises(Exception, match="queries exceed query_limit"):
        similarity.topk_pq(
            emb, emb, similarity.pq_fit(emb, m=2, kc=4, iters=1),
            query_limit=10,
        )


def test_pq_adc_equals_reconstructed_l2(spark, emb):
    """The defining ADC identity: topk_pq over the original corpus ==
    topk_l2 over the PQ-reconstructed corpus, row-for-row including
    the exact integer distances — scale- and data-independent, unlike
    any recall bound (the r12 review killed a cosine-ranked bound that
    failed off-fixture)."""
    books = similarity.pq_fit(emb, m=4, kc=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 4)
    pq = (
        similarity.topk_pq(emb, queries, books, k=7)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    recon = similarity.pq_reconstruct(similarity.pq_encode(emb, books), books)
    l2 = (
        similarity.topk_l2(recon, queries, k=7)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert pq.equals(l2)


def test_pq_encode_refuses_width_mismatch(spark):
    import pandas as pd

    books = [[[0] * 2, [1_000_000] * 2]] * 2  # m=2, kc=2, sub=2 -> d=4
    bad = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "embedding": [[0.1, 0.2, 0.3]]})
    )
    with pytest.raises(Exception, match="embedding width 3 != codebook width 4"):
        similarity.pq_encode(bad, books).collect()


def test_ivf_pq_encode_matches_numpy(spark, emb):
    """ivf_pq_encode's cell (coarse argmin) and codes (residual-subspace
    argmin) both equal an independent numpy evaluation over the same
    integer micros domain — the full IVF-ADC index build (Jégou 2011 §V)
    against an oracle that never touches the engine expressions."""
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=4, m=4, kc=8, iters=2)
    assert len(cents) == 4 and len(books) == 4 and len(books[0]) == 8
    cent = np.asarray(cents, dtype=np.int64)
    cb = np.asarray(books, dtype=np.int64)

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    iv = np.round(
        np.array(pdf["embedding"].tolist(), dtype=np.float64) * 1_000_000
    ).astype(np.int64)
    want_cell = ((iv[:, None, :] - cent[None]) ** 2).sum(axis=2).argmin(axis=1)
    resid = iv - cent[want_cell]
    sub = resid.reshape(len(pdf), 4, -1)
    want_codes = ((sub[:, :, None, :] - cb[None]) ** 2).sum(axis=3).argmin(axis=2)

    got = (
        similarity.ivf_pq_encode(emb, cents, books)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["cell"].to_numpy(), want_cell)
    assert np.array_equal(np.array(got["codes"].tolist()), want_codes)


def test_ivf_pq_search_probes_and_adc_against_numpy(spark, emb):
    """topk_ivf_pq end-to-end against numpy: (a) ivf_probe and the
    driver-side probe pick the same nprobe cells in the same tie-break
    order; (b) every returned neighbor lives in a probed cell (the
    inverted-file property); (c) dist2 equals the exact integer
    ‖q − (centroid[cell] + codewords)‖² — the residual ADC identity."""
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=4, m=4, kc=8, iters=2)
    cent = np.asarray(cents, dtype=np.int64)
    cb = np.asarray(books, dtype=np.int64)
    queries = emb.filter(F.col("vec_id") < 3)

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    iv = np.round(
        np.array(pdf["embedding"].tolist(), dtype=np.float64) * 1_000_000
    ).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(pdf["vec_id"].to_numpy())}
    cell_of = ((iv[:, None, :] - cent[None]) ** 2).sum(axis=2).argmin(axis=1)
    resid = (iv - cent[cell_of]).reshape(len(pdf), 4, -1)
    codes = ((resid[:, :, None, :] - cb[None]) ** 2).sum(axis=3).argmin(axis=2)
    recon = cent[cell_of] + cb[np.arange(4)[None, :], codes].reshape(len(pdf), -1)

    want_probe = {}
    for qid in range(3):
        d2 = ((iv[pos[qid]][None, :] - cent) ** 2).sum(axis=1)
        want_probe[qid] = list(np.lexsort((np.arange(len(d2)), d2))[:2])
    probe = similarity.ivf_probe(queries, cents, nprobe=2).collect()
    got_probe = {}
    for r in sorted(probe, key=lambda r: (r.query_id, r.probe_rank)):
        got_probe.setdefault(int(r.query_id), []).append(int(r.cell))
    assert got_probe == want_probe

    res = similarity.topk_ivf_pq(emb, queries, cents, books, k=7, nprobe=2)
    rows = res.collect()
    assert {int(r.query_id) for r in rows} == {0, 1, 2}
    for r in rows:
        n = pos[int(r.neighbor_id)]
        assert int(cell_of[n]) in want_probe[int(r.query_id)]
        want = int(((iv[pos[int(r.query_id)]] - recon[n]) ** 2).sum())
        assert int(r.dist2) == want
    # per query: ranks are 1..7 and dist2-sorted with id tie-break
    by_q = {}
    for r in rows:
        by_q.setdefault(int(r.query_id), []).append(r)
    for q, grp in by_q.items():
        grp = sorted(grp, key=lambda r: r.rank)
        assert [r.rank for r in grp] == list(range(1, 8))
        assert grp == sorted(grp, key=lambda r: (r.dist2, r.neighbor_id))


def test_ivf_pq_refusals(spark, emb):
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=2, m=2, kc=4, iters=1)
    with pytest.raises(Exception, match="embedding width 3 != codebook width"):
        import pandas as pd

        bad = spark.createDataFrame(
            pd.DataFrame({"vec_id": [1], "embedding": [[0.1, 0.2, 0.3]]})
        )
        similarity.ivf_pq_encode(bad, cents, books).collect()
    with pytest.raises(ValueError, match="queries exceed query_limit"):
        similarity.topk_ivf_pq(emb, emb, cents, books, query_limit=10)


def test_ivf_pq_pre_encoded_candidates_match_raw(spark, emb):
    """candidates_encoded=True (the production shape: index computed at
    ingest, search scans 4+m ints) returns the identical result to the
    raw-vector path."""
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=4, m=4, kc=8, iters=1)
    queries = emb.filter(F.col("vec_id") < 3)
    raw = (
        similarity.topk_ivf_pq(emb, queries, cents, books, k=6, nprobe=2)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    enc = similarity.ivf_pq_encode(emb, cents, books)
    pre = (
        similarity.topk_ivf_pq(
            enc, queries, cents, books, k=6, nprobe=2,
            candidates_encoded=True,
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert raw.equals(pre)


def test_pq_and_ivf_adc_identity_property(spark):
    """Property form of the two ADC gates: for random corpora (including
    heavy duplicate-vector ties from a tiny value alphabet), arbitrary
    subspace widths, codebook sizes, and probe depths, the engine's ADC
    top-k must equal the exact-L2 top-k over the reconstructed corpus —
    row-for-row, dist2 and rank included. Varying (d, m, kc, kcoarse,
    nprobe) catches slicing and tie-break bugs the fixed 64-dim fixture
    cannot (e.g. sub-widths of 3, kc larger than a cell's population)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    @settings(max_examples=6, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**31 - 1),
        st.sampled_from([(6, 2), (8, 4), (12, 3)]),  # (d, m)
        st.sampled_from([4, 7]),                     # kc
        st.sampled_from([(3, 1), (4, 2)]),           # (kcoarse, nprobe)
    )
    def check(seed, dm, kc, cp):
        d, m = dm
        kcoarse, nprobe = cp
        rng = np.random.default_rng(seed)
        n = 60
        # tiny alphabet -> many exact duplicates -> dist2 ties everywhere
        vecs = rng.integers(-2, 3, size=(n, d)).astype(np.float32) * 0.25
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": np.arange(n), "embedding": list(map(list, vecs))}
            )
        )
        queries = emb.filter(F.col("vec_id") < 2)
        cols = ["query_id", "neighbor_id", "dist2", "rank"]

        books = similarity.pq_fit(emb, m=m, kc=kc, iters=1)
        pq = similarity.topk_pq(emb, queries, books, k=5).toPandas()
        recon = similarity.pq_reconstruct(
            similarity.pq_encode(emb, books), books
        )
        l2 = similarity.topk_l2(recon, queries, k=5).toPandas()
        assert (
            pq.sort_values(cols[:2]).reset_index(drop=True)[cols]
            .equals(l2.sort_values(cols[:2]).reset_index(drop=True)[cols])
        ), (seed, dm, kc)

        cents, rbooks = similarity.ivf_pq_fit(
            emb, kcoarse=kcoarse, m=m, kc=kc, iters=1
        )
        ivf = similarity.topk_ivf_pq(
            emb, queries, cents, rbooks, k=5, nprobe=nprobe
        ).toPandas()
        enc = similarity.ivf_pq_encode(emb, cents, rbooks)
        rrecon = similarity.ivf_pq_reconstruct(enc, cents, rbooks)
        probed = similarity.ivf_probe(queries, cents, nprobe=nprobe)
        q = queries.select(
            F.col("vec_id").alias("query_id"),
            similarity._int_vec("embedding").alias("_qv"),
        )
        dist2 = F.aggregate(
            F.zip_with(
                F.col("_qv"),
                similarity._int_vec("embedding"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id").orderBy(
            F.col("dist2").asc(), F.col("neighbor_id").asc()
        )
        exact = (
            rrecon.withColumnRenamed("vec_id", "neighbor_id")
            .join(F.broadcast(probed.join(q, "query_id")), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("dist2", dist2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select(*cols)
            .toPandas()
        )
        assert (
            ivf.sort_values(cols[:2]).reset_index(drop=True)[cols]
            .equals(exact.sort_values(cols[:2]).reset_index(drop=True)[cols])
        ), (seed, dm, kc, cp)

    check()


def test_pca_transform_collision_safe_temp_name(spark, emb):
    """ADVICE r14: the staged centered-vector column must not clobber a
    caller column named like the temp — an input already carrying
    ``_ctr`` (the old fixed name) or ``_ctr_pc`` (the new derived name)
    keeps its values, and the projection is unchanged."""
    model = similarity.pca_fit(emb, k=4)
    base = {
        r.vec_id: r.pc
        for r in similarity.pca_transform(emb, model).select("vec_id", "pc").collect()
    }
    poisoned = emb.withColumn("_ctr", F.lit(7)).withColumn("_ctr_pc", F.lit(9))
    got = similarity.pca_transform(poisoned, model)
    assert "_ctr" in got.columns and "_ctr_pc" in got.columns
    rows = got.select("vec_id", "pc", "_ctr", "_ctr_pc").collect()
    for r in rows:
        assert (r._ctr, r._ctr_pc) == (7, 9)
        assert np.allclose(r.pc, base[r.vec_id], atol=1e-9)


def test_topk_pq_family_schema_consistent_int_ids(spark):
    """ADVICE r14: topk_pq/topk_ivf_pq's empty-query early return
    hardcodes long ids; the non-empty path must emit the SAME schema
    even when the candidates carry int (not long) ids."""
    rows = [(i, [float(i % 3), float((i * 7) % 5)]) for i in range(12)]
    cand = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    none_q = cand.filter(F.col("vec_id") < 0)
    some_q = cand.filter(F.col("vec_id") < 2)

    books = similarity.pq_fit(cand, m=2, kc=2, iters=1)
    def shape(df):
        # nullability is advisory in Spark (row_number marks non-null);
        # the contract is names + types
        return [(fld.name, fld.dataType) for fld in df.schema.fields]

    e, f = (
        similarity.topk_pq(cand, q, books, k=3) for q in (none_q, some_q)
    )
    assert shape(e) == shape(f)
    assert f.count() > 0

    cents, books2 = similarity.ivf_pq_fit(cand, kcoarse=2, m=2, kc=2, iters=1)
    e2, f2 = (
        similarity.topk_ivf_pq(cand, q, cents, books2, k=3, nprobe=2)
        for q in (none_q, some_q)
    )
    assert shape(e2) == shape(f2)
    assert f2.count() > 0


def test_ivf_pq_recall_monotonic_in_nprobe(spark):
    """VERDICT r13 ask #5: quantify what nprobe buys on the composed
    IVF-PQ path. On a low-intrinsic-dimension corpus (real embeddings
    live on a manifold; i.i.d. gaussians give PQ nothing to rank) with
    coarse cells smaller than the 10-NN ball, recall@10 vs the exact
    topk_l2 twin must rise monotonically with nprobe and saturate at
    the residual-quantization ceiling (seeded fixture pins the curve:
    0.63 -> 0.78 -> 0.82 -> 0.82 at nprobe 1/2/4/8)."""
    import pandas as pd

    n, d, latent = 4000, 32, 2
    rng = np.random.default_rng(42)
    basis = rng.normal(size=(latent, d)).astype(np.float32)
    z = rng.normal(size=(n, latent)).astype(np.float32)
    vecs = (z @ basis + rng.normal(scale=0.05, size=(n, d))).astype(
        np.float32
    )
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, vecs))})
    ).cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    truth: dict[int, set] = {}
    for r in similarity.topk_l2(emb, queries, k=10).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    cents, books = similarity.ivf_pq_fit(emb, kcoarse=64, m=8, kc=32, iters=3)
    enc = similarity.ivf_pq_encode(emb, cents, books).cache()
    enc.count()

    def recall(nprobe: int) -> float:
        got: dict[int, set] = {}
        res = similarity.topk_ivf_pq(
            enc, queries, cents, books, k=10, nprobe=nprobe,
            candidates_encoded=True,
        )
        for r in res.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(got.get(q, set()) & t) for q, t in truth.items()
        ) / (10 * len(truth))

    curve = [recall(p) for p in (1, 2, 4, 8)]
    emb.unpersist()
    enc.unpersist()
    assert all(a <= b for a, b in zip(curve, curve[1:])), curve
    assert curve[-1] - curve[0] >= 0.1, curve  # nprobe buys real recall
    assert curve[-1] >= 0.8, curve  # quantization ceiling is high


def test_ann_lsh_schema_consistent_int_ids(spark):
    """Same branch-schema contract as the topk_pq family (r14): ann_lsh's
    empty-candidates early return hardcodes long ids; the LSH join path
    must emit the same names+types for int-id inputs."""
    # +1 offsets keep every vector nonzero-norm (cosine is undefined at
    # the origin and this test is about schemas, not zero handling)
    rows = [(i, [float(i % 5 + 1), float((i * 3) % 7 + 1)]) for i in range(30)]
    cand = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    def shape(df):
        return [(fld.name, fld.dataType) for fld in df.schema.fields]

    empty = similarity.ann_lsh(
        cand.filter(F.col("vec_id") < 0), cand.limit(2), k=3
    )
    full = similarity.ann_lsh(cand, cand.filter(F.col("vec_id") < 2), k=3)
    assert shape(empty) == shape(full)
    assert full.count() > 0


def test_opq_fit_balances_anisotropy_and_descends(spark):
    """OPQ (Ge CVPR 2013): on a sharply anisotropic corpus (4 high-
    variance directions mixed off-axis into 16 dims) a plain PCA
    rotation piles all the energy into subspace 1 and PQ distortion
    explodes; opq_fit's eigenvalue-allocation init + Procrustes
    iterations must (1) return an orthogonal rotation, (2) produce a
    non-increasing objective trace, (3) beat the plain-PCA rotation's
    distortion by a wide margin (~14x on this fixture; assert >= 5x)."""
    import pandas as pd

    n, d, m, kc = 2000, 16, 4, 16
    rng = np.random.default_rng(7)
    mix, _ = np.linalg.qr(rng.normal(size=(d, d)))
    scales = np.array([8.0] * 4 + [0.2] * 12)
    vecs = ((rng.normal(size=(n, d)) * scales) @ mix.T).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, vecs))})
    ).cache()
    emb.count()

    def pq_sse(R):
        rot = (
            similarity.opq_rotate(emb, R, out_col="_r")
            .select("vec_id", F.col("_r").alias("embedding"))
            .cache()
        )
        rot.count()
        books = similarity.pq_fit(rot, m=m, kc=kc, iters=2)
        yr = similarity.pq_reconstruct(
            similarity.pq_encode(rot, books), books, out_col="_y"
        )
        sse = (
            rot.join(yr, "vec_id")
            .select(
                F.aggregate(
                    F.zip_with("embedding", "_y", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("e")
            )
            .agg(F.sum("e"))
            .collect()[0][0]
        )
        rot.unpersist()
        return sse

    model = similarity.opq_fit(emb, m=m, kc=kc, iters=2, opq_iters=2)
    R = np.asarray(model["rotation"])
    assert np.abs(R @ R.T - np.eye(d)).max() < 1e-9
    trace = model["sse_trace"]
    assert len(trace) == 3  # opq_iters entries + final refit
    assert all(b <= a * 1.001 for a, b in zip(trace, trace[1:])), trace

    plain_pca = similarity.pca_fit(emb, k=d)["components"]
    sse_pca = pq_sse(plain_pca)
    sse_opq = pq_sse(model["rotation"])
    emb.unpersist()
    assert sse_opq * 5 < sse_pca, (sse_opq, sse_pca)


def test_ivf_pq_refine_lifts_recall_and_is_exact_at_full_shortlist(spark):
    """Two-stage retrieval (r14): the exact re-rank of the ADC shortlist
    must (1) never lower recall vs the plain IVF-PQ ranking at the same
    nprobe, (2) reach recall 1.0 on the boundary fixture once probes
    cover the 10-NN ball (nprobe=4 here — quantization misses drop out
    entirely), (3) equal topk_l2 row-for-row including exact integer
    dist2 when the shortlist is the whole corpus and every cell is
    probed, and (4) refuse k > kprime."""
    import pandas as pd

    n, d, latent = 4000, 32, 2
    rng = np.random.default_rng(42)
    basis = rng.normal(size=(latent, d)).astype(np.float32)
    z = rng.normal(size=(n, latent)).astype(np.float32)
    vecs = (z @ basis + rng.normal(scale=0.05, size=(n, d))).astype(
        np.float32
    )
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, vecs))})
    ).cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    truth: dict[int, set] = {}
    for r in similarity.topk_l2(emb, queries, k=10).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=64, m=8, kc=32, iters=2)
    enc = similarity.ivf_pq_encode(emb, cents, books).cache()
    enc.count()

    def recall(df):
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(got.get(q, set()) & t) for q, t in truth.items()
        ) / (10 * len(truth))

    for nprobe in (2, 4):
        plain = recall(
            similarity.topk_ivf_pq(
                enc, queries, cents, books, k=10, nprobe=nprobe,
                candidates_encoded=True,
            )
        )
        refined = recall(
            similarity.topk_ivf_pq_refine(
                emb, queries, cents, books, k=10, kprime=100,
                nprobe=nprobe, encoded=enc,
            )
        )
        assert refined >= plain, (nprobe, plain, refined)
        if nprobe == 4:
            assert refined == 1.0, refined

    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    full = similarity.topk_ivf_pq_refine(
        emb, queries, cents, books, k=10, kprime=n, nprobe=64, encoded=enc
    )
    l2 = similarity.topk_l2(emb, queries, k=10)
    assert sorted(map(tuple, full.select(cols).collect())) == sorted(
        map(tuple, l2.select(cols).collect())
    )

    with pytest.raises(ValueError, match="kprime"):
        similarity.topk_ivf_pq_refine(
            emb, queries, cents, books, k=20, kprime=10, encoded=enc
        )
    emb.unpersist()
    enc.unpersist()


def test_filtered_refine_property(spark):
    """Property form of the filtered-search entry: for random corpora
    (duplicate-heavy tiny alphabet), subspace widths, and predicate
    moduli, the filtered two-stage composition at degenerate depth must
    equal topk_l2 over the filtered raw table row-for-row (dist2 and
    rank included), and at a shallow operating point every returned
    neighbor must satisfy the predicate — across filter selectivities
    the fixed fixture cannot vary."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**31 - 1),
        st.sampled_from([(6, 2), (8, 4)]),  # (d, m)
        st.sampled_from([2, 3, 5]),         # predicate modulus
    )
    def check(seed, dm, mod):
        d, m = dm
        rng = np.random.default_rng(seed)
        n = 60
        vecs = rng.integers(-2, 3, size=(n, d)).astype(np.float32) * 0.25
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": np.arange(n), "embedding": list(map(list, vecs))}
            )
        )
        queries = emb.filter(F.col("vec_id") < 2)
        cents, books = similarity.ivf_pq_fit(emb, kcoarse=3, m=m, kc=4, iters=1)
        enc = similarity.ivf_pq_encode(emb, cents, books)
        encf = enc.filter(F.col("vec_id") % mod != 0)
        nf = encf.count()
        cols = ["query_id", "neighbor_id", "dist2", "rank"]
        deg = similarity.topk_ivf_pq_refine(
            emb, queries, cents, books, k=5, kprime=int(nf), nprobe=3,
            encoded=encf,
        ).toPandas()
        exact = similarity.topk_l2(
            emb.filter(F.col("vec_id") % mod != 0), queries, k=5
        ).toPandas()
        assert (
            deg.sort_values(cols[:2]).reset_index(drop=True)[cols]
            .equals(exact.sort_values(cols[:2]).reset_index(drop=True)[cols])
        ), (seed, dm, mod)
        op = similarity.topk_ivf_pq_refine(
            emb, queries, cents, books, k=5, kprime=10, nprobe=1,
            encoded=encf,
        ).collect()
        assert all(r.neighbor_id % mod != 0 for r in op), (seed, dm, mod)

    check()


def test_filtered_search_respects_predicate_and_fills_k(spark):
    """Attribute-filtered vector search (the similarity_filtered_search
    catalog shape): ONE static index encoded over the full corpus, the
    per-request predicate applied as a DataFrame filter on the CODE
    table, exact re-rank of the survivors. Pins the two filtered-ANN
    bug classes: (1) a returned neighbor violating the predicate (the
    filter leaked past the probe), (2) under-filled k when the filter
    is selective (the post-hoc-trimming bug — filtering RESULTS instead
    of candidates). Also: the degenerate depth equals topk_l2 over the
    filtered raw table row-for-row, so the filtered composition stays
    exact, and queries excluded by the predicate still retrieve."""
    import pandas as pd

    n, d = 1200, 16
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, vecs))})
    ).cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < 6)  # 0 and 3 fail the predicate
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=8, m=4, kc=8, iters=1)
    enc = similarity.ivf_pq_encode(emb, cents, books).cache()
    encf = enc.filter(F.col("vec_id") % 3 != 0)  # query-time predicate
    nf = encf.count()

    # realistic operating point: shortlist 4x deeper than k, partial probe
    op = similarity.topk_ivf_pq_refine(
        emb, queries, cents, books, k=10, kprime=40, nprobe=4, encoded=encf
    ).collect()
    assert all(r.neighbor_id % 3 != 0 for r in op)  # (1) predicate holds
    per_q = {}
    for r in op:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q) == set(range(6)) and all(
        c == 10 for c in per_q.values()
    )  # (2) every query fills k, incl. predicate-failing query ids

    # degenerate depth == exact filtered top-k (what the DuckDB oracle
    # hashes for the catalog entry)
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    deg = similarity.topk_ivf_pq_refine(
        emb, queries, cents, books, k=10, kprime=int(nf), nprobe=8,
        encoded=encf,
    )
    exact = similarity.topk_l2(
        emb.filter(F.col("vec_id") % 3 != 0), queries, k=10
    )
    assert sorted(map(tuple, deg.select(cols).collect())) == sorted(
        map(tuple, exact.select(cols).collect())
    )
    emb.unpersist()
    enc.unpersist()
