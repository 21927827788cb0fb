"""SQL front door for the geometry kernel: the reference's Entry-3 query
written as plain SQL against registered functions."""

from __future__ import annotations

import json

import pytest

from sids_data_pipeline_spark import lifecycle
from sids_data_pipeline_spark.functions.register import register_all
from sids_data_pipeline_spark.operators.zonal import zonal_stats
from sids_data_pipeline_spark.sources.raster import synthetic_raster
from sids_data_pipeline_spark.sources.vector import fixture_zones


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)


def test_entry3_query_as_sql(spark):
    """SQL zonal mean over st_contains_point equals the operator API."""
    zones = fixture_zones(spark, "zones_grid")
    pixels = synthetic_raster(spark, "rast_gradient")
    with lifecycle.temp_views(spark, zones=zones, pixels=pixels):
        # Spark disallows Python UDFs in outer-join ON clauses; the
        # supported spelling is a cross join filtered in WHERE (zones
        # with no pixels drop out — the operator keeps them as NULL)
        sql = spark.sql(
            """
            SELECT z.fid, AVG(p.val) AS mean
            FROM zones z, pixels p
            WHERE st_contains_point(z.geometry, p.lon, p.lat)
            GROUP BY z.fid ORDER BY z.fid
            """
        ).collect()
    op = (
        zonal_stats(zones, pixels, stats=("mean",))
        .filter("mean IS NOT NULL")
        .orderBy("fid")
        .collect()
    )
    assert [(r.fid, r["mean"]) for r in sql] == [(r.fid, r["mean"]) for r in op]


def test_bbox_and_geojson_functions(spark):
    zones = fixture_zones(spark, "zones_grid")
    with lifecycle.temp_views(spark, zones=zones):
        rows = spark.sql(
            """
            SELECT fid, st_bbox(geometry) AS bb,
                   st_bbox_area(geometry) AS area,
                   st_asgeojson(geometry) AS gj
            FROM zones WHERE fid = 1
            """
        ).collect()
    r = rows[0]
    assert (r.bb.xmin, r.bb.ymin, r.bb.xmax, r.bb.ymax) == (0.12, 0.12, 2.08, 2.08)
    assert abs(r.area - (2.08 - 0.12) ** 2) < 1e-12
    assert json.loads(r.gj)["type"] == "MultiPolygon"


def test_search_bm25_hand_computed(spark):
    """3-doc corpus, query {apple}: BM25 with k1=1.2, b=0.75 computed by
    hand (micros-rounded per-term contributions)."""
    import math

    from sids_data_pipeline_spark.operators.text import search_bm25

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),       # dl=3, tf=2
            (2, "banana cherry"),            # dl=2, no match
            (3, "apple"),                    # dl=1, tf=1
        ],
        "doc_id bigint, text string",
    )
    rows = search_bm25(docs, ["apple"], k=5).collect()
    n_docs, avgdl = 3, 6 / 3
    doc_freq = 2
    idf = math.log(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))

    def score(tf, dl):
        part = tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        return round(idf * part * 1_000_000)

    got = {r.doc_id: (r.n_terms_matched, r.score_micros) for r in rows}
    assert got == {1: (1, score(2, 3)), 3: (1, score(1, 1))}
    # length normalization: the very short doc 3 outranks doc 1 despite
    # doc 1's higher raw tf (b=0.75 penalizes dl=3 vs avgdl=2)
    assert [r.doc_id for r in rows] == [3, 1]


def test_search_bm25_plan_filters_postings_early(spark, sf_dir):
    """The explode output must filter to the query terms before any
    aggregation, and the ranking must be a distributed partial top-k."""
    from sids_data_pipeline_spark.operators.text import search_bm25

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        search_bm25(docs, ["vector", "hash"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
    assert plan.index("Filter") < plan.index("HashAggregate") or "token" in plan


def test_pseudonymize_deterministic_joinable_null_safe(spark):
    import hashlib

    from sids_data_pipeline_spark.operators.text import pseudonymize

    a = spark.createDataFrame(
        [(1, "alice"), (2, None)], "uid bigint, name string"
    )
    b = spark.createDataFrame([(1, "x")], "uid bigint, v string")
    pa = pseudonymize(a, ["uid", "name"], salt="k")
    pb = pseudonymize(b, ["uid"], salt="k")
    rows = {r.name: r.uid for r in pa.collect()}
    want_uid1 = hashlib.sha256(b"k1").hexdigest()[:16]
    want_name = hashlib.sha256(b"kalice").hexdigest()[:16]
    assert rows[want_name] == want_uid1
    assert None in rows  # NULL name stays NULL
    # joinability: same salt -> same token on both tables
    joined = pa.join(pb, "uid")
    assert joined.count() == 1


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    from sids_data_pipeline_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab x")], "doc_id bigint, text string"
    )
    got = {r.pair: r.n for r in bpe_pair_counts(docs).collect()}
    # 'ab' x3 + 'abc' x1 -> pair 'a b' 4 times; 'b c' once; 'x' no pairs
    assert got == {"a b": 4, "b c": 1}


def test_char_entropy_extremes(spark):
    import math

    from sids_data_pipeline_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.entropy_bits for r in char_entropy(docs).collect()}
    assert got[1] == 0.0                       # constant -> zero bits
    assert abs(got[2] - 1.0) < 1e-6            # two equiprobable symbols
    assert abs(got[3] - 2.0) < 1e-6            # four equiprobable symbols
    assert math.isfinite(got[2])


def test_bpe_train_hand_computed(spark):
    """Tiny corpus with a known merge sequence, including the abab case
    where consecutive non-overlapping pairs must both merge in one pass."""
    from sids_data_pipeline_spark.operators.text import bpe_train

    # corpus: 'abab' x3, 'abc' x2  →  word freqs {abab:3, abc:2}
    docs = spark.createDataFrame(
        [(1, "abab abab abc"), (2, "abab abc")],
        "doc_id long, text string",
    )
    rows = {r.merge_rank: r for r in bpe_train(docs, n_merges=3).collect()}
    # round 0 pairs: (a,b): abab has 2 + abc 1 → 3*2+2*1=8 ; (b,a): 3 ; (b,c): 2
    assert (rows[0].left_sym, rows[0].right_sym, rows[0].pair_count) == ("a", "b", 8)
    # after merge ab: abab→[ab,ab], abc→[ab,c]
    # round 1 pairs: (ab,ab): 3 ; (ab,c): 2
    assert (rows[1].left_sym, rows[1].right_sym, rows[1].pair_count) == ("ab", "ab", 3)
    assert rows[1].merged == "abab"
    # after merge abab: abab→[abab], abc stays [ab,c]
    # round 2: only (ab,c): 2
    assert (rows[2].left_sym, rows[2].right_sym, rows[2].pair_count) == ("ab", "c", 2)


def test_bpe_encode_hand_computed(spark):
    """Token counts under the merges test_bpe_train_hand_computed pins:
    after [ab, abab, ab+c] the words tokenize as abab→1, abc→1."""
    from sids_data_pipeline_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(1, "abab abab abc"), (2, "abab abc")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_encode(docs, n_merges=3).collect()}
    assert got[1] == (3, 3)   # abab, abab, abc → one token each
    assert got[2] == (2, 2)
    # with only the first merge (ab), abab→[ab,ab]=2 toks, abc→[ab,c]=2
    got1 = {r.doc_id: r.n_bpe_tokens
            for r in bpe_encode(docs, n_merges=1).collect()}
    assert got1[1] == 2 + 2 + 2
    assert got1[2] == 2 + 2


def test_text_ops_survive_degenerate_docs(spark):
    """Empty/whitespace/short docs must not abort under ANSI mode:
    ratios and shingle hashes go NULL instead of DIVIDE_BY_ZERO or
    INVALID_ARRAY_INDEX."""
    from sids_data_pipeline_spark.operators.text import (
        fingerprint,
        quality_score,
        token_stats,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world"), (4, "one two three four")],
        "doc_id long, text string",
    )
    ts = {r.doc_id: r for r in token_stats(docs).collect()}
    assert ts[1].avg_word_len_micros is None and ts[2].avg_word_len_micros is None
    assert ts[4].avg_word_len_micros is not None
    qs = {r.doc_id: r for r in quality_score(docs).collect()}
    assert qs[1].quality_bucket == "too_short"
    assert qs[2].stopword_ratio_micros is None
    fp = {r.doc_id: r for r in fingerprint(docs).collect()}
    assert fp[3].min_shingle_hash is None        # < 3 words: no shingle
    assert fp[4].min_shingle_hash is not None


def test_bpe_train_batched_rounds(spark):
    """merges_per_round bounds the job count; on a corpus whose top
    pairs are disjoint the batched result equals the exact one."""
    import pytest as _pytest

    from sids_data_pipeline_spark.operators.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc"), (2, "aa bb cc dd")],
        "doc_id long, text string",
    )
    exact = [(r.merge_rank, r.left_sym, r.right_sym, r.merged)
             for r in bpe_train(docs, n_merges=3).collect()]
    batched = [(r.merge_rank, r.left_sym, r.right_sym, r.merged)
               for r in bpe_train(docs, n_merges=3,
                                  merges_per_round=3).collect()]
    assert batched == exact
    with _pytest.raises(ValueError, match="merges_per_round"):
        bpe_train(docs, merges_per_round=0)
