"""Dedup operator unit tests against hand-computed / pure-Python oracles."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup of 0
    (3, "pack my box with five dozen liquor jugs"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text: str, n: int = 3) -> set[str]:
    w = text.lower().split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _py_jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def test_exact_dedup_keeps_first(docs):
    kept = dedup.exact_dedup(docs, ["text"], "doc_id")
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [0, 2, 3, 4, 5]  # doc 1 deduped against doc 0


def test_shingles_match_python(docs):
    got = {
        (r.doc_id, r.shingle) for r in dedup.shingles(docs, 3).collect()
    }
    want = {
        (i, s) for i, t in DOCS for s in _py_shingles(t, 3)
    }
    assert got == want


def test_minhash_finds_near_dups(docs):
    pairs = {
        (r.id1, r.id2): r.jaccard
        for r in dedup.near_duplicates_minhash(docs, threshold=0.2).collect()
    }
    # exact duplicate pair must collide in every band with jaccard 1.0
    assert pairs[(0, 1)] == 1.0
    # verified jaccard values equal the pure-Python computation
    for (i, j), jac in pairs.items():
        want = _py_jaccard(_py_shingles(DOCS[i][1]), _py_shingles(DOCS[j][1]))
        assert abs(jac - want) < 1e-6


def test_ngram_jaccard_blocked(docs):
    pairs = {
        (r.id1, r.id2): r.jaccard
        for r in dedup.near_duplicates_ngram(docs, threshold=0.3, max_df=5).collect()
    }
    assert (0, 1) in pairs
    # unrelated docs never pair
    for bad in [(3, 4)]:
        assert bad not in pairs


def test_simhash_identical_docs_distance_zero(docs):
    out = {
        (r.id1, r.id2): r.hamming
        for r in dedup.near_duplicates_simhash(docs, max_hamming=3).collect()
    }
    assert out[(0, 1)] == 0


def test_lsh_candidates_subset_of_all_pairs(docs):
    tok = dedup.shingles(docs, 3).withColumnRenamed("shingle", "token")
    sig = dedup.minhash_signature(tok)
    cand = {(r.id1, r.id2) for r in dedup.lsh_candidate_pairs(sig).collect()}
    all_pairs = set(itertools.combinations(range(len(DOCS)), 2))
    assert cand <= all_pairs
    assert (0, 1) in cand  # identical docs always collide


def test_exact_dedup_null_vs_empty_distinct(spark):
    """NULL and '' are different keys (SQL GROUP BY semantics): a plain
    concat_ws digest would conflate them and drop one row."""
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "x")], "doc_id long, text string"
    )
    out = dedup.exact_dedup(df, ["text"], "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2]


def test_exact_dedup_multicol_separator_safe(spark):
    """Adjacent key columns containing the old separator must not merge:
    ('a','b') and ('a\x1fb','') are distinct composite keys."""
    df = spark.createDataFrame(
        [(0, "a", "b"), (1, "a\x1fb", "")], "doc_id long, k1 string, k2 string"
    )
    out = dedup.exact_dedup(df, ["k1", "k2"], "doc_id")
    assert out.count() == 2


def test_decontaminate_drops_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox runs away"),      # shares 2 trigrams
            (2, "completely unrelated text here now"),  # clean
            (3, "quick brown fox jumps over everything"),  # shares 3
        ],
        "doc_id long, text string",
    )
    kept1 = sorted(
        r.doc_id
        for r in dedup.decontaminate(corpus, bench, n=3, min_shared=3).collect()
    )
    assert kept1 == [1, 2]
    kept2 = sorted(
        r.doc_id
        for r in dedup.decontaminate(corpus, bench, n=3, min_shared=1).collect()
    )
    assert kept2 == [2]


def test_max_bucket_drops_degenerate_buckets(spark):
    """The production cap removes the quadratic escape hatch: a band
    bucket larger than max_bucket contributes no candidate pairs, while
    normal-sized buckets are untouched (cap=None ⊇ capped result)."""
    # 12 identical docs → every band bucket has 12 members
    many = spark.createDataFrame(
        [(i, "same text everywhere all the time again and again") for i in range(12)],
        "doc_id long, text string",
    )
    uncapped = dedup.near_duplicates_minhash(many, threshold=0.5, max_bucket=None)
    capped = dedup.near_duplicates_minhash(many, threshold=0.5, max_bucket=8)
    assert uncapped.count() == 12 * 11 // 2
    assert capped.count() == 0
    # a cap above the bucket size changes nothing
    roomy = dedup.near_duplicates_minhash(many, threshold=0.5, max_bucket=100)
    assert roomy.count() == 12 * 11 // 2


def test_fuzzy_join_matches_naive_including_band_boundaries(spark):
    """Band blocking must not lose pairs whose lengths straddle a band
    edge (the completeness guarantee)."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.dedup import fuzzy_join

    lrows = [(1, "abcd"), (2, "abcde"), (3, "zzzz"), (4, "abc")]
    rrows = [(10, "abcd"), (11, "abcdX"), (12, "abcdef"), (13, "qqqq")]
    left = spark.createDataFrame(lrows, "lid int, lname string")
    right = spark.createDataFrame(rrows, "rid int, rname string")
    got = {
        (r.lid, r.rid)
        for r in fuzzy_join(
            left, right, "lname", "rname", max_distance=1, band_width=4
        ).collect()
    }

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    want = {
        (li, rj)
        for li, ln in lrows
        for rj, rn in rrows
        if lev(ln, rn) <= 1
    }
    assert got == want
    assert (2, 12) in got  # len 5 vs 6 straddles the width-4 band edge


def test_fuzzy_join_plans_equi_join(spark):
    from sids_data_pipeline_spark.operators.dedup import fuzzy_join

    left = spark.createDataFrame([(1, "abc")], "lid int, lname string")
    right = spark.createDataFrame([(2, "abd")], "rid int, rname string")
    plan = (
        fuzzy_join(left, right, "lname", "rname")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_boilerplate_hot_ngram_flagged(spark):
    """A 3-gram shared by 3 docs is hot; a unique one is not."""
    from sids_data_pipeline_spark.operators.text import boilerplate_stats

    shared = "terms of service apply"
    rows = [
        (1, shared + " alpha beta gamma"),
        (2, shared + " delta epsilon zeta"),
        (3, shared + " eta theta iota"),
        (4, "completely unrelated words here now"),
        (5, "xy"),  # < 3 words → no shingles → absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in boilerplate_stats(df, min_docs=3).collect()}
    assert set(got) == {1, 2, 3, 4}
    # "terms of service" + "of service apply" appear in docs 1-3
    for d in (1, 2, 3):
        assert got[d].n_hot == 2
        assert got[d].n_shingles == 5  # 7 words → 5 trigrams
        assert got[d].boiler_ppm == 400000
    assert got[4].n_hot == 0 and got[4].boiler_ppm == 0


def test_simhash_rejects_radius_beyond_blocking_guarantee(spark):
    """4-chunk blocking is only complete through Hamming distance 3;
    a larger radius would silently drop matches (round-7 review)."""
    import pytest as _pytest

    from sids_data_pipeline_spark.operators.dedup import near_duplicates_simhash

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="max_hamming"):
        near_duplicates_simhash(docs, max_hamming=4)


def test_fuzzy_join_same_column_name(spark):
    """fuzzy_join(a, b, 'name', 'name') — the natural entity-resolution
    call — must work; colliding right columns come back suffixed."""
    from sids_data_pipeline_spark.operators.dedup import fuzzy_join

    a = spark.createDataFrame([(1, "acme corp")], "id long, name string")
    b = spark.createDataFrame([(9, "acme corp.")], "id long, name string")
    out = fuzzy_join(a, b, "name", "name", max_distance=1)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].name == "acme corp" and rows[0].name_right == "acme corp."
    assert rows[0].id == 1 and rows[0].id_right == 9


def test_exact_dedup_tolerates_map_columns_and_rn(spark):
    """A map-typed payload column must not break the tie-break hash, and
    a caller's '_rn' column must survive (round-7 review)."""
    from sids_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "x", {"k": "v"}, 7), (2, "x", {"k": "w"}, 8), (3, "y", {"k": "v"}, 9)],
        "id long, text string, meta map<string,string>, _rn long",
    )
    out = exact_dedup(df, ["text"], "id")
    assert sorted(r.id for r in out.collect()) == [1, 3]
    assert "_rn" in out.columns
    assert {r.id: r._rn for r in out.collect()} == {1: 7, 3: 9}


def test_exact_dedup_negative_zero_groups_with_zero(spark):
    """GROUP BY puts -0.0 and 0.0 in one group; the digest must too."""
    from sids_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, 0.0), (2, -0.0), (3, 1.5)], "id long, price double"
    )
    out = exact_dedup(df, ["price"], "id")
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_incremental_equals_batch_restricted(spark):
    """near_duplicates_incremental(new, old, stored_bands) must equal
    near_duplicates_minhash(old ∪ new) restricted to pairs touching a
    new doc — on a synthetic corpus with near-dups in all three
    orientations (old-old, old-new, new-new)."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.dedup import (
        minhash_band_table,
        near_duplicates_incremental,
        near_duplicates_minhash,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs right now ok",
        "how vexingly quick daft zebras jump over fences today",
    ]
    rows = []
    for i in range(60):
        t = base[i % 3]
        if i % 5 == 0:
            t = t + " extra"
        rows.append((i, t))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.filter(F.col("doc_id") < 40)
    new = docs.filter(F.col("doc_id") >= 40)

    full = {
        (r.id1, r.id2): r.jaccard
        for r in near_duplicates_minhash(docs, threshold=0.2).collect()
    }
    want = {k: v for k, v in full.items() if k[0] >= 40 or k[1] >= 40}
    stored = minhash_band_table(old)
    got = {
        (r.id1, r.id2): r.jaccard
        for r in near_duplicates_incremental(
            new, old, stored, threshold=0.2
        ).collect()
    }
    assert got == want
    assert any(k[0] < 40 for k in got)  # old-new pairs present
    assert any(k[0] >= 40 for k in got)  # new-new pairs present
