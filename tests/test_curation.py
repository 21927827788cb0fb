"""Corpus curation composite: each stage's effect is visible and the
keep-lower-id rule holds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.jobs.curation import curate_corpus, curation_report

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "the quick brown fox jumps over the lazy dog tonight"),   # exact dup → dropped
    (2, "the quick brown fox jumps over the lazy dog at dawn"),   # near dup of 0 → dropped
    (3, "short"),                                                 # quality-filtered
    (4, "pack my box with five dozen liquor jugs every day"),
    (5, "sphinx of black quartz judge my vow said the wizard"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_curation_stages(spark, docs):
    kept = curate_corpus(docs, min_chars=20, jaccard_threshold=0.2)
    ids = sorted(r.doc_id for r in kept.collect())
    # 1 exact-dup, 2 near-dup (higher ids), 3 too short — 0/4/5 survive
    assert ids == [0, 4, 5]


def test_curation_report(spark, docs):
    kept = curate_corpus(docs, min_chars=20, jaccard_threshold=0.2)
    row = curation_report(docs, kept).collect()[0]
    assert (row.n_input, row.n_kept) == (6, 3)
    assert row.removed_ratio_micros == 500_000


def test_curation_idempotent(spark, docs):
    once = curate_corpus(docs, min_chars=20, jaccard_threshold=0.2)
    twice = curate_corpus(once, min_chars=20, jaccard_threshold=0.2)
    assert sorted(r.doc_id for r in twice.collect()) == sorted(
        r.doc_id for r in once.collect()
    )


def test_curation_report_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = curation_report(empty, curate_corpus(empty)).collect()[0]
    assert (row.n_input, row.n_kept, row.removed_ratio_micros) == (0, 0, 0)


def test_repetition_stats_hand_oracle(spark):
    from sids_data_pipeline_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "a a a a b"),          # 5 words, 2 distinct, top 'a'=4
            (1, "one two three four"),  # no repetition at all
            (2, "spam spam spam"),      # a single word repeated
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert (got[0].n_words, got[0].n_distinct) == (5, 2)
    assert got[0].dup_word_frac_micros == round((5 - 2) * 1e6 / 5)
    assert got[0].top_word_frac_micros == round(4 * 1e6 / 5)
    assert got[1].dup_word_frac_micros == 0
    assert got[1].top_word_frac_micros == 250_000
    assert (got[2].n_distinct, got[2].top_word_frac_micros) == (1, 1_000_000)
