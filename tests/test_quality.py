"""check_expectations: declarative data-quality rules."""

from __future__ import annotations

import pytest

from sids_data_pipeline_spark.operators import quality as q


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0),
            (2, "B", 50.0),
            (2, "Z", -1.0),   # dup key, bad code, below range
            (None, "A", 200.0),  # null key, above range
        ],
        "k bigint, code string, v double",
    )


def test_rules_report_violations(spark, df):
    report = {
        r.rule: (r.n_violations, r.passed)
        for r in q.check_expectations(
            df,
            [
                q.not_null("k"),
                q.unique("k"),
                q.in_range("v", 0, 100),
                q.in_set("code", ["A", "B"]),
                q.matches("code", "^[A-C]$"),
            ],
        ).collect()
    }
    assert report["not_null(k)"] == (1, False)
    assert report["unique(k)"] == (1, False)  # one extra row on k=2
    assert report["in_range(v)"] == (2, False)  # -1 and 200
    assert report["in_set(code)"] == (1, False)  # Z
    assert report["matches(code)"] == (1, False)  # Z
    assert len(report) == 5


def test_all_pass_and_null_values_ignored_by_value_rules(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "A")], "k bigint, code string"
    )
    report = q.check_expectations(
        df, [q.unique("k"), q.in_set("code", ["A"]), q.matches("code", "^A$")]
    ).collect()
    assert all(r.passed and r.n_violations == 0 for r in report)


def test_row_local_rules_fold_into_one_aggregate(spark, df):
    """n row-local rules must not add jobs: the plan has exactly one
    aggregate over the input (plus the explode unpivot)."""
    plan = (
        q.check_expectations(
            df, [q.not_null("k"), q.in_range("v", 0, 100), q.in_set("code", ["A"])]
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Aggregate") == 1


def test_composite_unique_rule(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y")], "a bigint, b string"
    )
    (row,) = q.check_expectations(df, [q.unique("a", "b")]).collect()
    assert row.n_violations == 1 and not row.passed


def test_split_dead_letters_routing(spark):
    from sids_data_pipeline_spark.operators.quality import split_dead_letters

    raw = spark.createDataFrame(
        [
            (1, "100", "7"),      # clean
            (2, "oops", "8"),     # bad price
            (3, "300", None),     # NULL is absent, not malformed
            (4, "x", "y"),        # both bad
        ],
        "id int, p string, c string",
    )
    good, dead = split_dead_letters(
        raw, {"price": ("p", "bigint"), "cust": ("c", "bigint")}, id_cols=["id"]
    )
    g = {r.id: (r.price, r.cust) for r in good.collect()}
    assert g == {1: (100, 7), 3: (300, None)}
    d = {r.id: sorted(r._bad_fields) for r in dead.collect()}
    assert d == {2: ["price"], 4: ["cust", "price"]}


def test_split_dead_letters_pure_codegen(spark):
    from sids_data_pipeline_spark.operators.quality import split_dead_letters

    raw = spark.createDataFrame([(1, "1")], "id int, p string")
    good, dead = split_dead_letters(raw, {"v": ("p", "bigint")}, id_cols=["id"])
    for frame in (good, dead):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan


def test_unique_rule_exempts_nulls(spark):
    from sids_data_pipeline_spark.operators import quality as q

    df = spark.createDataFrame(
        [(None,), (None,), ("x",), ("y",)], "k string"
    )
    rows = {r.rule: r.n_violations for r in q.check_expectations(
        df, [q.unique("k")]
    ).collect()}
    # NULLs are not duplicates of each other (dbt/GE convention)
    assert rows["unique(k)"] == 0


def test_chunk_documents_empty_and_null_docs(spark):
    """Empty/whitespace/NULL documents emit NO chunks (previously a
    phantom '' or NULL chunk with n_words=1/NULL) — round-7 review."""
    from sids_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_words=2, stride=1).collect()
    assert {r.doc_id for r in out} == {1}
    assert all(r.chunk_text for r in out)


def test_token_stats_word_chars_on_raw_text(spark):
    """Unicode case mapping can change string length (İ lowers to two
    codepoints); word chars must count the RAW text so avg word length
    cannot exceed n_chars."""
    from sids_data_pipeline_spark.operators.text import token_stats

    docs = spark.createDataFrame(
        [(1, "İstanbul")], "doc_id long, text string"
    )
    r = token_stats(docs).collect()[0]
    assert r.n_chars == 8
    assert r.avg_word_len_micros == 8_000_000  # == n_chars, not 9e6


def test_bm25_null_text_excluded_and_terms_deduped(spark):
    from sids_data_pipeline_spark.operators.text import search_bm25

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat dog"), (3, None)],
        "doc_id long, text string",
    )
    a = {(r.doc_id, r.score_micros) for r in search_bm25(docs, ["cat"]).collect()}
    b = {(r.doc_id, r.score_micros)
         for r in search_bm25(docs, ["cat", "cat"]).collect()}
    assert a == b and {d for d, _ in a} == {1, 2}


def test_duplicate_spans_known_corpus(spark):
    """Hand-built corpus with known repeated regions: the shared
    8-token phrase marks its exact interval in BOTH docs (overlapping
    grams merged), unique text flags nothing, and a within-doc repeat
    counts toward min_count."""
    from sids_data_pipeline_spark.operators.text import duplicate_spans

    common = "the quick brown fox jumps over lazy dogs"        # 8 tokens
    docs = spark.createDataFrame(
        [
            # tokens 0-2 unique, 3-10 common, 11-12 unique
            (1, "alpha beta gamma " + common + " tail one"),
            # tokens 0-1 unique, 2-9 common
            (2, "delta epsilon " + common),
            (3, "entirely unique words that repeat nothing here at all"),
            # within-doc repeat: tokens 0-7 == tokens 8-15
            (4, "a b c d e f g h a b c d e f g h"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(docs, n=8).collect()
    }
    assert got == {(1, 3, 10), (2, 2, 9), (4, 0, 15)}

    # guards
    with pytest.raises(ValueError):
        duplicate_spans(docs, n=0)
    with pytest.raises(ValueError):
        duplicate_spans(docs, min_count=1)


def test_remove_duplicate_spans_known_corpus(spark):
    """The actionable Lee-et-al form: duplicated regions cut, unique
    text (whitespace-normalized) preserved, untouched docs pass through,
    empty docs survive."""
    from sids_data_pipeline_spark.operators.text import remove_duplicate_spans

    common = "the quick brown fox jumps over lazy dogs"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + common + " tail one"),
            (2, "delta  epsilon\t" + common),
            (3, "entirely unique words that repeat nothing here at all"),
            (4, ""),
            # fully duplicated: every token dropped, row must survive
            (5, common),
            (6, common),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.clean_text, r.n_tokens_removed)
           for r in remove_duplicate_spans(docs, n=8).collect()}
    assert got == {
        1: ("alpha beta gamma tail one", 8),
        2: ("delta epsilon", 8),
        3: ("entirely unique words that repeat nothing here at all", 0),
        4: ("", 0),
        5: ("", 8),
        6: ("", 8),
    }


def test_lm_perplexity_hand_computed(spark):
    """Tiny corpus where the bigram LM is computable by hand: the
    boilerplate doc (seen bigrams, high counts) must score LOWER NLL
    than the doc full of singleton bigrams, values matching a direct
    float evaluation of the add-alpha formula."""
    import math

    from sids_data_pipeline_spark.operators.text import lm_perplexity

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c"), (3, "x"), (4, "")],
        "doc_id long, text string",
    )
    # corpus bigrams: (a,b)x4  (b,a)x2  (b,c)x1 ; contexts: a->4, b->3
    # vocab V=4 {a,b,c,x}; alpha=0.1
    a = 0.1
    V = 4
    nll_ab = round(-math.log((4 + a) / (4 + a * V)) * 1e6)
    nll_ba = round(-math.log((2 + a) / (3 + a * V)) * 1e6)
    nll_bc = round(-math.log((1 + a) / (3 + a * V)) * 1e6)
    got = {r.doc_id: (r.n_bigrams, r.avg_nll_micros)
           for r in lm_perplexity(docs).collect()}
    assert got[1] == (5, round((3 * nll_ab + 2 * nll_ba) / 5))
    assert got[2] == (2, round((nll_ab + nll_bc) / 2))
    assert got[3] == (0, None)   # single token: no bigrams
    assert got[4] == (0, None)   # empty doc
    assert got[1][1] < got[2][1]  # boilerplate scores lower NLL


def test_remove_duplicate_spans_preserves_case(spark):
    """Span DETECTION is case-insensitive (shared lowercase tokenizer)
    but the rebuilt text keeps the original casing of every surviving
    token — a curated training set must not be silently case-folded."""
    from sids_data_pipeline_spark.operators.text import remove_duplicate_spans

    common = "The Quick Brown Fox Jumps Over Lazy Dogs"
    docs = spark.createDataFrame(
        [
            (1, "Alpha BETA gamma " + common + " Tail ONE"),
            # same span, different case: still detected as duplicated
            (2, "delta Epsilon " + common.lower()),
            (3, "Entirely UNIQUE Words that Repeat nothing HERE at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.clean_text, r.n_tokens_removed)
           for r in remove_duplicate_spans(docs, n=8).collect()}
    assert got == {
        1: ("Alpha BETA gamma Tail ONE", 8),
        2: ("delta Epsilon", 8),
        3: ("Entirely UNIQUE Words that Repeat nothing HERE at all", 0),
    }


def test_gopher_rules_hand_computed(spark):
    """Each of the seven Gopher rules exercised by a doc built to fail
    exactly that rule; verdicts and micros signals are hand-computed."""
    from sids_data_pipeline_spark.operators.text import gopher_rules

    good = ("the data have to be of use and that is why we keep it with "
            "care " * 4) + "extra words fill the line to reach fifty total"
    docs = spark.createDataFrame(
        [
            (1, good),                        # passes everything
            (2, "too few words"),             # rule 1 (n_words < 50)
            (3, ""),                          # empty: NULL ratios, drop
            # rule 4: every line is a bullet (and <50 words)
            (4, "- a\n- b\n* c\n• d"),
            # rule 5: lines end with ellipsis
            (5, "first line...\nsecond line…\nthird"),
            # rule 7: no required words at all
            (6, "zebra quokka lemur " * 20),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert got[1].keep
    assert got[1].n_words >= 50 and got[1].n_required_words >= 2
    assert not got[2].keep and got[2].n_words == 3
    assert not got[3].keep
    assert got[3].mean_word_len_micros is None
    assert got[3].bullet_line_frac_micros is None
    assert got[4].bullet_line_frac_micros == 1_000_000
    assert not got[4].keep
    # 2 of 3 lines end with an ellipsis -> 666667 micros > 300000
    assert got[5].ellipsis_line_frac_micros == 666_667
    assert got[6].n_required_words == 0 and not got[6].keep
    # rule-2/6 signals on the good doc: all-alpha words
    assert got[1].alpha_word_frac_micros == 1_000_000


def test_remove_hot_lines_newline_mode(spark):
    """CCNet line dedup: a line present in >=2 distinct docs vanishes
    from every doc; normalization (trim+lower) drives the hot KEY but
    surviving lines keep their original text; blank lines drop; empty
    and fully-hot docs still emit a row."""
    from sids_data_pipeline_spark.operators.text import remove_hot_lines

    docs = spark.createDataFrame(
        [
            (1, "Unique opening\nCOOKIE BANNER\nunique close"),
            # trailing spaces + different case: same normalized key
            (2, "another doc\n  cookie banner  \n\nmore words"),
            (3, "cookie banner"),  # fully hot -> clean_text ''
            (4, ""),  # empty -> zero segments
            (5, "only fresh lines\nnothing shared"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_segments, r.n_removed)
        for r in remove_hot_lines(docs, min_docs=2).collect()
    }
    assert got == {
        1: ("Unique opening\nunique close", 3, 1),
        2: ("another doc\nmore words", 3, 1),
        3: ("", 1, 1),
        4: ("", 0, 0),
        5: ("only fresh lines\nnothing shared", 2, 0),
    }


def test_remove_hot_lines_window_mode_preserves_case(spark):
    """window_words segmentation for line-less corpora: the 2-word hot
    key is case-insensitive but survivors rebuild from original-case
    words; the short tail window segments too."""
    from sids_data_pipeline_spark.operators.text import remove_hot_lines

    docs = spark.createDataFrame(
        [
            (1, "Alpha Beta SHARED words tail"),
            (2, "shared WORDS gamma delta"),
            (3, "Gamma Delta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_segments, r.n_removed)
        for r in remove_hot_lines(
            docs, min_docs=2, sep_regex=None, window_words=2
        ).collect()
    }
    # doc1 windows: [Alpha Beta][SHARED words][tail]; doc2: [shared
    # WORDS][gamma delta]; doc3: [Gamma Delta]. Hot keys: 'shared
    # words' (docs 1,2) and 'gamma delta' (docs 2,3) — doc2 loses BOTH
    # its windows, each hot via a different partner doc.
    assert got == {
        1: ("Alpha Beta tail", 3, 1),
        2: ("", 2, 2),
        3: ("", 1, 1),
    }


def test_remove_hot_lines_validation(spark):
    from sids_data_pipeline_spark.operators.text import remove_hot_lines

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one"):
        remove_hot_lines(docs, sep_regex=None, window_words=None)
    with pytest.raises(ValueError, match="exactly one"):
        remove_hot_lines(docs, sep_regex=r"\n+", window_words=3)
    with pytest.raises(ValueError, match="min_docs"):
        remove_hot_lines(docs, min_docs=1)
    with pytest.raises(ValueError, match="window_words"):
        remove_hot_lines(docs, sep_regex=None, window_words=0)


def test_nb_quality_classifier_hand_computed(spark):
    """4-doc corpus small enough to verify the smoothed log-odds by
    hand: c_pos(a,b,c)=(3,1,0), c_neg=(0,2,1), N_pos=4, N_neg=3, V=3,
    alpha=1, prior=ln(3/2) with the empty positive doc included."""
    import math

    from sids_data_pipeline_spark.operators.text import nb_quality_classifier

    docs = spark.createDataFrame(
        [
            (1, "a a b", True),
            (2, "a", True),
            (3, "b b", False),
            (4, "c", False),
            (5, "", True),  # token-less: scores the prior alone
        ],
        "doc_id long, text string, is_good boolean",
    )
    got = {
        r.doc_id: (r.n_tokens, r.score_micros, r.keep)
        for r in nb_quality_classifier(docs, "is_good").collect()
    }
    wa = round(math.log((3 + 1) / (4 + 3) / ((0 + 1) / (3 + 3))) * 1e6)
    wb = round(math.log((1 + 1) / (4 + 3) / ((2 + 1) / (3 + 3))) * 1e6)
    wc = round(math.log((0 + 1) / (4 + 3) / ((1 + 1) / (3 + 3))) * 1e6)
    prior = round(math.log(3 / 2) * 1e6)
    assert (wa, wb, wc, prior) == (1232144, -559616, -847298, 405465)
    assert got == {
        1: (3, 2 * wa + wb + prior, True),
        2: (1, wa + prior, True),
        3: (2, 2 * wb + prior, False),
        4: (1, wc + prior, False),
        5: (0, prior, True),
    }


def test_nb_quality_classifier_guards(spark):
    from pyspark.errors import SparkRuntimeException

    from sids_data_pipeline_spark.operators.text import nb_quality_classifier

    docs = spark.createDataFrame(
        [(1, "a", True), (2, "b", True)],
        "doc_id long, text string, is_good boolean",
    )
    with pytest.raises(ValueError, match="alpha"):
        nb_quality_classifier(docs, "is_good", alpha=0)
    # single-class corpus: the executor-side raise_error guard fires
    with pytest.raises(SparkRuntimeException, match="non-empty"):
        nb_quality_classifier(docs, "is_good").collect()


def test_lm_cross_backoff_cases_by_hand(spark):
    """The three scoring regimes, hand-computed: seen bigram, unseen
    bigram under a seen context, wholly unseen context (→ log V)."""
    import math

    from sids_data_pipeline_spark.operators.text import lm_perplexity_cross

    train = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "a b"), (11, "b c"), (12, "z q")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll_micros)
        for r in lm_perplexity_cross(train, score, alpha_micros=100_000).collect()
    }
    # train counts: c(a,b)=1, c(b,a)=1, c(a,c)=1; c_a=2, c_b=1; V=3; α=0.1
    seen = round(-math.log((1 + 0.1) / (2 + 0.1 * 3)) * 1e6)
    unseen_bg = round(-math.log(0.1 / (1 + 0.1 * 3)) * 1e6)
    unseen_ctx = round(-math.log(0.1 / (0 + 0.1 * 3)) * 1e6)  # = ln 3
    assert got[10] == (1, seen)
    assert got[11] == (1, unseen_bg)
    assert got[12] == (1, unseen_ctx)
    assert unseen_ctx == round(math.log(3) * 1e6)


def test_lm_cross_empty_train_vocab_raises(spark):
    """A train corpus with no tokens (empty / whitespace docs) must fail
    loudly at execution, not NULL-propagate a 0 denominator through the
    add-alpha formula (the guard is in-plan, so it fires under pruning)."""
    import pytest

    from sids_data_pipeline_spark.operators.text import lm_perplexity_cross

    train = spark.createDataFrame([(1, "   "), (2, "")], "doc_id long, text string")
    score = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    with pytest.raises(Exception, match="empty"):
        lm_perplexity_cross(train, score).collect()
