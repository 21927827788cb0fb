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


def test_scrub_pii_redacts_and_counts(spark):
    from sids_data_pipeline_spark.operators import text as t

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@example.co.uk or call +1 (555) 123-4567."),
            (2, "server 192.168.0.1 and 10.0.0.255 are up"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in t.scrub_pii(df).collect()}
    assert "<EMAIL>" in rows[1].text and "<PHONE>" in rows[1].text
    assert rows[1].n_email == 1 and rows[1].n_phone == 1
    assert rows[2].text.count("<IPV4>") == 2 and rows[2].n_ipv4 == 2
    assert rows[3].text == "nothing sensitive here"
    assert rows[3].n_email == rows[3].n_ipv4 == rows[3].n_phone == 0


def test_chunk_documents_overlap_and_boundaries(spark):
    from sids_data_pipeline_spark.operators import text as t

    words = [f"w{i}" for i in range(250)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc only")],
        "doc_id long, text string",
    )
    out = t.chunk_documents(df, chunk_words=100, stride=80).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 250 words, window 100, stride 80 -> ceil(150/80)+1 = 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_start_word for r in c1] == [0, 80, 160]
    assert c1[0].chunk_text.split() == words[0:100]
    assert c1[1].chunk_text.split() == words[80:180]
    assert c1[2].chunk_text.split() == words[160:250]  # final ragged window
    # short doc -> exactly one chunk containing everything
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short doc only"
    # overlap: consecutive windows share chunk_words - stride words
    assert c1[0].chunk_text.split()[80:] == c1[1].chunk_text.split()[:20]


def test_vocab_counts_hand_oracle(spark):
    from sids_data_pipeline_spark.operators.text import vocab_counts

    docs = spark.createDataFrame(
        [(1, "the cat the dog"), (2, "the  cat"), (3, "bird")],
        "doc_id bigint, text string",
    )
    got = {r.token: (r.term_freq, r.doc_freq) for r in vocab_counts(docs).collect()}
    assert got == {"the": (3, 2), "cat": (2, 2), "dog": (1, 1), "bird": (1, 1)}
    rare_dropped = {
        r.token for r in vocab_counts(docs, min_count=2).collect()
    }
    assert rare_dropped == {"the", "cat"}


def test_tfidf_hand_oracle(spark):
    import math

    from sids_data_pipeline_spark.operators.text import tfidf

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id bigint, text string"
    )
    got = {(r.doc_id, r.token): r for r in tfidf(docs).collect()}
    # 'a' appears in both docs: idf = ln(3/3)+1 = 1
    assert got[(1, "a")].tf == 2 and got[(1, "a")].tfidf == 2.0
    assert got[(2, "a")].tfidf == 1.0
    # 'b' in one doc: idf = ln(3/2)+1
    expect_b = round(1 * (math.log(3 / 2) + 1), 6)
    assert abs(got[(1, "b")].tfidf - expect_b) < 1e-9
    assert got[(1, "b")].doc_freq == 1


def test_column_histogram_clamps_and_bins(spark):
    from sids_data_pipeline_spark.operators.profile import column_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (9.9,), (10.0,), (25.0,), (None,)],
        "x double",
    )
    got = {r.bucket: r.n for r in column_histogram(df, "x", 2, 0.0, 10.0).collect()}
    # [-5, 0, 4.9] -> bucket 0 (clamp below); [5, 9.9] -> 1; [10, 25] clamp to 1
    assert got == {0: 3, 1: 4}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        column_histogram(df, "x", 0, 0.0, 10.0)
    with _pytest.raises(ValueError):
        column_histogram(df, "x", 2, 10.0, 10.0)


def test_curation_job_empty_result_writes_ledger(spark, tmp_path):
    """When curation removes every doc, the job must record an empty
    manifest instead of aborting on the empty partitioned read-back."""
    from sids_data_pipeline_spark.jobs.curation import run_curation_job

    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "also")], "doc_id long, text string"
    )  # all under min_chars
    out = run_curation_job(spark, docs, str(tmp_path / "c"))
    assert out["n_curated"] == 0 and out["splits"] == {}
    # re-run skips via the ledger
    again = run_curation_job(spark, docs, str(tmp_path / "c"))
    assert again["skipped"] is True


def test_curation_config_key_is_split_order_sensitive(spark, tmp_path):
    """hash_split assignment depends on label order, so reordering the
    splits dict must NOT be treated as the same completed config."""
    from sids_data_pipeline_spark.jobs.curation import run_curation_job

    docs = spark.createDataFrame(
        [(i, f"document number {i} with plenty of text in it") for i in range(50)],
        "doc_id long, text string",
    )
    r1 = run_curation_job(
        spark, docs, str(tmp_path / "o"), splits={"a": 0.5, "b": 0.5}
    )
    assert r1["skipped"] is False
    r2 = run_curation_job(
        spark, docs, str(tmp_path / "o"), splits={"b": 0.5, "a": 0.5}
    )
    assert r2["skipped"] is False  # different assignment → re-runs


def test_curation_job_empty_result_clears_stale_corpus(spark, tmp_path):
    """An all-removed run after a populated run (different config) must
    delete the old data_dir — a reader following the new manifest would
    otherwise see the previous corpus next to n_curated=0."""
    import os

    from sids_data_pipeline_spark.jobs.curation import run_curation_job

    docs = spark.createDataFrame(
        [(i, f"document number {i} with plenty of real words " * 8)
         for i in range(12)],
        "doc_id long, text string",
    )
    out_dir = str(tmp_path / "c")
    first = run_curation_job(spark, docs, out_dir, min_chars=10)
    assert first["n_curated"] > 0
    assert os.path.isdir(os.path.join(out_dir, "data"))
    second = run_curation_job(spark, docs, out_dir, min_chars=10_000)
    assert second["n_curated"] == 0
    assert not os.path.exists(os.path.join(out_dir, "data"))


def test_curate_corpus_optional_span_removal(spark):
    """remove_span_grams appends the substring-dedup stage after
    doc-level dedup: repeated spans are cut from surviving texts while
    the default path is byte-identical to before (opt-in contract)."""
    from sids_data_pipeline_spark.jobs.curation import curate_corpus

    common = "the quick brown fox jumps over lazy dogs"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon " + common),
            (2, "zeta eta theta iota kappa mu nu " + common),
            (3, "totally unique content that goes through unchanged ok"),
        ],
        "doc_id long, text string",
    )
    plain = curate_corpus(docs, min_chars=10, jaccard_threshold=0.9)
    assert {r.doc_id for r in plain.collect()} == {1, 2, 3}
    assert {r.text for r in plain.collect()} == {r.text for r in docs.collect()}

    cleaned = curate_corpus(
        docs, min_chars=10, jaccard_threshold=0.9, remove_span_grams=8
    )
    got = {r.doc_id: r.text for r in cleaned.collect()}
    assert got[1] == "alpha beta gamma delta epsilon"
    assert got[2] == "zeta eta theta iota kappa mu nu"
    assert got[3] == "totally unique content that goes through unchanged ok"


def test_curate_corpus_span_removal_refilters_quality(spark):
    """A doc whose text is entirely duplicated spans shrinks to '' at
    the span stage; the min_chars quality gate re-applies to the
    cleaned text so such rows never reach the curated output — and the
    surviving texts keep their original casing."""
    from sids_data_pipeline_spark.jobs.curation import curate_corpus

    common = "the quick brown fox jumps over lazy dogs"
    docs = spark.createDataFrame(
        [
            (1, "Alpha BETA gamma delta EPSILON " + common),
            # near-miss of doc 1 past the LSH bar but fully covered by
            # the duplicated span: must be dropped by the re-filter,
            # not emitted as an empty row
            (2, common + " x"),
            (3, common + " y"),
        ],
        "doc_id long, text string",
    )
    cleaned = curate_corpus(
        docs, min_chars=10, jaccard_threshold=0.99, remove_span_grams=8
    )
    got = {r.doc_id: r.text for r in cleaned.collect()}
    assert got == {1: "Alpha BETA gamma delta EPSILON"}
