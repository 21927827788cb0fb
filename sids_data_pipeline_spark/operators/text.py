"""Text-analysis operators (EXT E5 — SURVEY.md §2b).

Everything here is built from JVM-side ``pyspark.sql.functions`` string
primitives — no Python UDFs in the hot path — so the expressions inline
into whole-stage codegen and the DuckDB oracle can mirror them exactly:

- :func:`token_stats` — whitespace + regex token counting, char/word
  length stats.
- :func:`quality_score` — heuristic quality signals (length, punctuation
  ratio, stopword ratio, uppercase ratio) in an exact integer micros
  domain so scores hash-match across engines.
- :func:`language_id` — n-gram/stopword-density language heuristic.
- :func:`fingerprint` — normalized md5 document fingerprint plus a
  min-shingle-hash "winnowing lite" fingerprint for clustering.

No reference counterpart (the reference processes rasters, not text);
mandated by BASELINE.json north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions.hashing import token_hash32
from sids_data_pipeline_spark.operators.spread import spread_small_scan

MICROS = 1_000_000

# THE whitespace class (explicit, never \s — see BPE_REGEX note below)
WS_REGEX = r"[ \t\n\x0B\f\r]+"


def _words(col) -> "F.Column":
    """The module's ONE tokenize expression: lowercase whitespace
    split with empty tokens filtered. Nine operators previously
    inlined identical copies — and chunk_documents had silently
    drifted (missing the empty filter), exactly the hazard a shared
    helper removes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), WS_REGEX), lambda w: w != "")

# Tiny built-in stopword inventories for the language heuristic. Real
# deployments would swap in fastText/CLD3 behind the same operator shape.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "en"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "in"),
}

# BPE-ish word/number/punctuation tokenizer (public GPT-2 regex, simplified
# to what both regex engines support identically). Whitespace is the
# EXPLICIT class, never \s: Java's ASCII \s includes \x0B where RE2's
# does not, so the shared-constant trick only works if the class is
# spelled out (same policy as the tokenizer regexes below).
BPE_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"


def _count_matches(col, pattern: str):
    """Number of regex matches, JVM-side: size(regexp_extract_all(...))."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts: whitespace words, BPE-ish tokens, chars.

    Output: (doc_id, n_chars, n_words, n_tokens, avg_word_len_micros).
    avg word length is reported in the exact micros domain
    (round(chars_in_words / words * 1e6)) per the determinism policy;
    a zero-word (empty/whitespace) doc reports NULL instead of a
    DIVIDE_BY_ZERO abort under ANSI mode.
    """
    t = F.lower(F.col(text_col))
    words = F.split(t, WS_REGEX)
    n_words = F.size(F.filter(words, lambda w: w != ""))
    # raw text, not the lowered copy: Unicode case mapping can change
    # string LENGTH (İ → i̇), which made avg_word_len inconsistent
    # with n_chars
    word_chars = F.length(
        F.regexp_replace(F.col(text_col), WS_REGEX, "")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).alias("n_chars"),
        n_words.alias("n_words"),
        _count_matches(t, BPE_REGEX).alias("n_tokens"),
        F.when(
            n_words > 0,
            F.round(word_chars.cast("double") / n_words * MICROS, 0).cast("long"),
        ).alias("avg_word_len_micros"),
    )


def boilerplate_stats(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document hot-n-gram ("boilerplate") detection — the C4-style
    pass that flags headers/footers/templates repeated across a corpus.

    A word ``n``-gram appearing in ≥ ``min_docs`` DISTINCT documents is
    hot; each doc reports its distinct-shingle count, how many of them
    are hot, and the hot fraction in ppm. Output: (doc_id, n_shingles,
    n_hot, boiler_ppm) — docs shorter than ``n`` words carry no shingles
    and drop out (same contract as the dedup shingle pipeline).

    Scale shape: one shuffle on the shingle key for the document-
    frequency count (map-side combine), one left-semi join back, two
    doc-keyed aggregations. At 100 TB, replace the shingle string with
    its 64-bit hash before the shuffle (functions/hashing.py) — ~10×
    fewer shuffle bytes, same semantics up to hash collisions.
    """
    from sids_data_pipeline_spark.operators.dedup import shingles

    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("shingle")
    )
    per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hot_per_doc = (
        sh.join(hot, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hot"))
    )
    return (
        per_doc.join(hot_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_hot", F.lit(0)).alias("n_hot"),
            F.round(
                F.coalesce("n_hot", F.lit(0)).cast("double")
                / F.col("n_shingles")
                * MICROS,
                0,
            )
            .cast("long")
            .alias("boiler_ppm"),
        )
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition metrics: duplicate-word fraction and
    top-unigram fraction per document — the standard "document is mostly
    one phrase repeated" quality filter for training corpora.

    Distributed shape: explode words → groupBy(doc, word) → groupBy(doc),
    both with map-side partial aggregation. Linear in corpus size; the
    no-shuffle alternative (per-row ``transform(array_distinct(w), ...)``
    higher-order scan) is O(distinct·words) per document, quadratic on
    long documents, so the exploded form is the 100-TB shape.

    Fractions are reported in the exact micros domain: the numerator is
    an integer scaled by 1e6 before one double division (determinism
    policy, plans/base.py). Output: (doc_id, n_words, n_distinct,
    dup_word_frac_micros, top_word_frac_micros).
    """
    words = F.split(F.lower(F.col(text_col)), WS_REGEX)
    per_word = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy("doc_id", "_w")
        .agg(F.count(F.lit(1)).alias("_n"))
    )

    def frac(num):
        return F.round(num * F.lit(float(MICROS)) / F.col("n_words"), 0).cast(
            "long"
        )

    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("_n").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("_n").alias("top_word_n"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            frac(F.col("n_words") - F.col("n_distinct")).alias(
                "dup_word_frac_micros"
            ),
            frac(F.col("top_word_n")).alias("top_word_frac_micros"),
        )
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals per doc, micros-domain ratios.

    Output: (doc_id, n_chars, punct_ratio_micros, stopword_ratio_micros,
    digit_ratio_micros, quality_bucket). quality_bucket is a coarse
    CASE classification — the filterable column a pipeline would use.
    """
    t = F.lower(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    words = F.filter(F.split(t, WS_REGEX), lambda w: w != "")
    n_words = F.size(words)
    n_punct = _count_matches(t, r"[^a-z0-9 \t\n\x0B\f\r]")
    n_digit = _count_matches(t, r"[0-9]")
    en_stops = STOPWORDS["en"]
    n_stop = F.size(F.filter(words, lambda w: w.isin(*en_stops)))
    # a zero denominator (empty/whitespace doc) yields NULL, not an ANSI
    # DIVIDE_BY_ZERO abort; NULL ratios fall through to the CASE's else
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den * MICROS, 0).cast("long")
    )
    punct_ratio = ratio(n_punct, n_chars)
    stop_ratio = ratio(n_stop, n_words)
    bucket = (
        F.when(n_chars < 20, "too_short")
        .when(punct_ratio > 300_000, "too_punct")
        .when(stop_ratio >= 40_000, "good")
        .otherwise("low_stopword")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio_micros"),
        stop_ratio.alias("stopword_ratio_micros"),
        ratio(n_digit, n_chars).alias("digit_ratio_micros"),
        bucket.alias("quality_bucket"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-density language heuristic.

    Scores each language by its stopword hit count over the word set and
    predicts the argmax. Ties go to the lexicographically LAST language
    ('und' when all scores are 0) — the DuckDB oracle's CASE chain encodes
    the same tie-break, so keep the two in lockstep if changing this.
    Output: (doc_id, lang, predicted_lang).
    """
    words = _words(text_col)
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*stops)))
        for lang, stops in sorted(STOPWORDS.items())
    }
    best = F.lit("und")
    best_score = F.lit(0)
    # Reverse-lexicographic iteration with strict >: the first language
    # to reach a score keeps it on ties, so the lex-LAST tied language wins.
    for lang in sorted(scores, reverse=True):
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("lang").alias("lang"),
        best.alias("predicted_lang"),
    )


WINNOW_BASE = 257
WINNOW_MOD = 1_000_000_007


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints over a Rabin-Karp rolling hash.

    Classic scheme (the MOSS algorithm family): hash every k-gram of
    characters with the polynomial fingerprint
    ``h_i = Σ_j ascii(c_{i+j})·B^{k-1-j} mod P``, then keep the minimum
    hash of every w-length window of positions; the distinct minima are
    the document's fingerprints — stable under local edits, and the
    basis for plagiarism/near-dup detection at corpus scale (fingerprints
    join on equality, an inverted-index shape).

    Everything is JVM-side array math (transform over position sequences,
    no UDF), and the polynomial uses only +,*,% — so the DuckDB oracle
    reproduces it bit-for-bit. Intermediates stay < 2^40 (P ≈ 2^30 ×
    B = 257), no BIGINT overflow in either engine.
    Output: (doc_id, fingerprint) distinct rows.

    Hash-window shape (r14, guide §1.6): the k-gram terms index a
    per-document codepoint array (split + ascii, built once) instead of
    calling ``substr(_t, i+j, 1)`` per term — substr walks the UTF-8
    buffer from the start, so the old form was O(len²·k) per document
    (measured 16.1 s → 2.9 s over sf0.1 documents, identical 544 800
    fingerprint rows). Same polynomial, same exact integers — the
    DuckDB mirror keeps the substr spelling.
    """
    t = F.lower(F.col(text_col))
    # h(i) = sum_j code[i+j] * B^(k-1-j) mod P  (1-based i); codes CAST
    # to BIGINT before multiplying: ascii (int32) × coefficient (≈2^30)
    # overflows 32-bit otherwise
    codes = F.expr("transform(split(_t, ''), c -> CAST(ascii(c) AS BIGINT))")
    terms = " + ".join(
        f"(element_at(_c, i + {j}) "
        f"* {pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD)}) % {WINNOW_MOD}"
        for j in range(k)
    )
    hashes = F.expr(
        f"transform(sequence(1, length(_t) - {k - 1}), i -> ({terms}) % {WINNOW_MOD})"
    )
    mins = F.expr(
        f"transform(sequence(1, size(_h) - {w - 1}), "
        f"i -> array_min(slice(_h, i, {w})))"
    )
    return (
        spread_small_scan(docs)  # guide §2.5; no-op on wide scans
        .select(F.col(id_col).alias("doc_id"), t.alias("_t"))
        .filter(F.length("_t") >= k + w - 1)
        .withColumn("_c", codes)
        .withColumn("_h", hashes)
        .select("doc_id", F.explode(mins).alias("fingerprint"))
        .distinct()
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 over whitespace-normalized lowercase
    text (exact) + min 3-shingle hash (robust to local edits — the
    cheapest member of the winnowing family).

    Output: (doc_id, md5_fp, min_shingle_hash).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS_REGEX, " "))
    words = F.split(norm, " ")
    sh = F.expr(
        "transform(sequence(0, size(_w) - 3), "
        "i -> concat(_w[i], ' ', _w[i+1], ' ', _w[i+2]))"
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.md5(norm).alias("md5_fp"),
            words.alias("_w"),
        )
        .withColumn(
            # <3-word docs carry no shingle (NULL) — indexing _w[i+2]
            # unguarded would abort under ANSI; same contract as the
            # DuckDB mirror, whose empty range() yields list_min(NULL)
            "min_shingle_hash",
            F.when(
                F.size("_w") >= 3,
                F.array_min(F.transform(sh, lambda s: token_hash32(s))),
            ),
        )
        .drop("_w")
    )


# PII patterns chosen to behave identically in Java regex (Spark) and
# RE2 (DuckDB): no lookaround, no backreferences, and whitespace spelled
# as an explicit class — Java's \s includes vertical tab (\x0B) while
# RE2's does not, so \s itself would diverge on a \x0B between digits.
# Real deployments would extend the inventory behind the same operator
# shape.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\- \t\n\r\f]{7,}[0-9]",
}


def scrub_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact common PII (emails, IPv4 addresses, phone-like digit runs)
    with typed placeholders, counting each redaction — the standard
    pre-training scrub pass. Pure JVM ``regexp_replace`` chain (one
    projection, whole-stage codegen); patterns are RE2-compatible so the
    DuckDB oracle applies the byte-identical regex.

    Output: (doc_id, text, n_email, n_ipv4, n_phone) with ``text``
    scrubbed. Order matters: emails first (an email contains no phone
    match, but a phone pattern could bite into longer digit runs).
    """
    out = F.col(text_col)
    counts = {}
    for kind in ("email", "ipv4", "phone"):
        pat = PII_PATTERNS[kind]
        counts[kind] = _count_matches(out, pat)
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        out.alias("text"),
        *[counts[k].cast("long").alias(f"n_{k}") for k in ("email", "ipv4", "phone")],
    )


def chunk_documents(
    docs: DataFrame,
    chunk_words: int = 100,
    stride: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping word-window chunks — the standard
    context-window prep for training/embedding. JVM-side: split →
    ``sequence`` of window starts → ``slice`` + ``array_join`` →
    ``posexplode``. A document shorter than ``chunk_words`` yields one
    chunk; windows advance by ``stride`` (< chunk_words ⇒ overlap) and
    the last window starts at the final stride step that still has text.

    Output: (doc_id, chunk_idx, chunk_start_word, n_words, chunk_text).
    Row count per doc = ceil(max(n_words - chunk_words, 0) / stride) + 1
    — a pure function of the word count, so the oracle can mirror it.
    """
    if stride <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride must be positive")
    # Materialize the split ONCE per document in its own projection:
    # referencing the split expression inside the transform() lambda
    # would re-evaluate it per window — O(n_chunks × n_words) on a long
    # document (an 800k-word doc = 8×10⁹ re-splits) instead of O(n_words).
    # Empty tokens filter like every other operator (an empty/whitespace
    # doc used to report n_words=1 and emit a phantom '' chunk), and
    # zero-word docs — including NULL text — emit NO chunks.
    split_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), WS_REGEX), lambda w: w != ""
        ).alias("_ws"),
    ).filter(F.size("_ws") > 0)
    words = F.col("_ws")
    n = F.size(words)
    n_chunks = (
        F.ceil(F.greatest(n - chunk_words, F.lit(0)).cast("double") / stride)
        .cast("int")
        + 1
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(words, s + 1, chunk_words), " ")
    )
    return (
        split_docs.select(
            "doc_id",
            n.alias("n_words"),
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .withColumn("chunk_start_word", F.col("chunk_idx") * stride)
        .select("doc_id", "chunk_idx", "chunk_start_word", "n_words", "chunk_text")
    )


def vocab_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: per-token term frequency (total occurrences)
    and document frequency (docs containing it) — the input to tokenizer
    training and to IDF weighting. Whitespace-lowercase tokenization,
    consistent with :func:`token_stats` / the dedup shingle pipeline.

    Scale shape: explode + ONE shuffle on the token key; term counts
    combine map-side, doc frequency is count_distinct(doc) per token
    (exact — at 100 TB swap to approx_count_distinct if ±5% is fine).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            _words(text_col)
        ).alias("token"),
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("term_freq"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("term_freq") >= min_count)
    )


def tfidf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, token) smoothed TF-IDF:
    ``tf * (ln((N + 1) / (doc_freq + 1)) + 1)``, the sklearn-style
    smooth-idf. Output weights are rounded to 6 decimals; tf and
    doc_freq are exact integers, so the single rounded double keeps the
    result reproducible across engines.

    Scale shape: two aggregations sharing the token-exploded frame
    (token tf per doc; doc_freq per token) + one broadcast of the scalar
    N + one equi-join on the token key. No driver loops, no all-pairs.
    """
    from pyspark.storagelevel import StorageLevel

    from sids_data_pipeline_spark.lifecycle import track

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            _words(text_col)
        ).alias("token"),
    )
    # the explode feeds BOTH aggregation branches (tf per doc, df per
    # token); without the persist each branch re-scans the corpus
    tok = track(tok.persist(StorageLevel.MEMORY_AND_DISK))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("doc_freq"))
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("n"))
    return (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "doc_freq",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n") + 1).cast("double") / (F.col("doc_freq") + 1))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )


def search_bm25(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-text search: BM25-ranked top-``k`` documents for a bag of
    query terms (Robertson/Sparck-Jones idf with the Lucene +1 floor,
    whitespace-lowercase tokens consistent with :func:`vocab_counts`).

    Determinism: each term's contribution rounds to integer micros
    BEFORE the per-doc sum, so the score is an order-free integer sum —
    reproducible under any shuffle/combine order and mirrorable in SQL.

    Scale shape: the token explode filters to the query terms
    immediately (the posting lists for |Q| terms, not the corpus);
    doc-frequency and corpus stats are term-count-sized broadcasts; the
    final ranking is a distributed partial top-k. No all-pairs, no
    Python.

    Query semantics are a SET: duplicate terms collapse (repeating a
    term adds no weight — the tf/df grouping would dedupe it silently
    anyway, so the contract states it). NULL-text documents are
    excluded from the corpus statistics — previously n_docs counted
    them while avgdl skipped them, biasing both idf and the length
    normalization by unmatchable rows.
    """
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    tok = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        _words(text_col).alias("_ws"),
    )
    stats = tok.select(
        "doc_id", F.size("_ws").alias("dl"), F.explode("_ws").alias("token")
    ).filter(F.col("token").isin(terms))
    corpus = tok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("_ws")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = stats.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("doc_freq") + 0.5)
        / (F.col("doc_freq") + 0.5)
    )
    tf_part = (
        F.col("tf") * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    contrib = F.round(idf * tf_part * 1_000_000, 0).cast("long")
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", contrib.alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("_c").alias("score_micros"),
        )
    )
    return scored.orderBy(
        F.desc("score_micros"), F.col("doc_id").asc()
    ).limit(k)


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    prefix_len: int = 16,
) -> DataFrame:
    """Deterministic pseudonymization: replace each named column with a
    salted sha2-256 surrogate (first ``prefix_len`` hex chars). The same
    input value always maps to the same token, so joins and group-bys on
    the pseudonymized key keep working across tables — the standard
    GDPR-style de-identification that :func:`scrub_pii` (redaction)
    cannot provide. NULLs stay NULL.

    One codegen projection, no shuffle; the salt must come from a secret
    store — with it, re-identification is a dictionary attack away, so
    treat tokens as pseudonymous, not anonymous.
    """
    out = df
    for c in cols:
        # concat/sha2 propagate NULL, so NULL inputs stay NULL without an
        # explicit guard
        tok = F.substring(
            F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256),
            1,
            prefix_len,
        )
        out = out.withColumn(c, tok)
    return out


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """First step of BPE tokenizer training: corpus-wide frequency of
    adjacent symbol pairs within words (symbols = characters here; rerun
    after each merge for full BPE). Words are the whitespace-lowercase
    tokens the rest of the text stack uses; the pair count weights each
    word by its corpus frequency rather than re-scanning duplicates.

    Scale shape: words aggregate FIRST (one shuffle collapses the corpus
    to its vocabulary — orders of magnitude smaller), then pairs explode
    from the vocabulary only; the final count is map-side combined and
    top-k is a distributed partial sort.
    """
    words = docs.select(
        F.explode(
            _words(text_col)
        ).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_word"))
    chars = F.split(F.col("word"), "")
    pairs = vocab.select(
        "n_word",
        F.explode(
            F.zip_with(
                F.slice(chars, 1, F.size(chars) - 1),
                F.slice(chars, 2, F.size(chars) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_word").alias("n"))
        .orderBy(F.desc("n"), F.col("pair").asc())
        .limit(top_k)
    )


BPE_SEP = "\x1f"  # unit separator; assumed absent from corpus symbols


def bpe_train(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    return_encoding: bool = False,
    merges_per_round: int = 1,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Iterative BPE tokenizer training: learn the top ``n_merges``
    merge rules over the corpus. Output one row per learned rule:
    (rank, left, right, merged, pair_count). With
    ``return_encoding=True``, returns ``(rules, encoded)`` where
    ``encoded`` is the final per-word delimited encoding
    (word, n_word, s) — still persisted; the caller releases it — so
    :func:`bpe_encode` reuses the training rounds' work instead of
    re-deriving the vocabulary and re-applying every merge.

    The working set is the VOCABULARY (word, freq) — one corpus shuffle
    collapses 100 TB of text to its distinct words, and every round
    after that touches only vocabulary-sized data (exactly how
    production BPE trainers scale). Each round: count adjacent symbol
    pairs weighted by word freq (map-side combined), take the global
    argmax (count desc, then lexicographic — a ONE-ROW collect per
    round, like PageRank's teleport scalar), and apply the merge.

    Merge application is a literal string replace over an
    each-symbol-individually-delimited encoding (``␟a␟␟b␟`` →
    ``␟ab␟``): non-overlapping left-to-right replacement — exactly
    greedy BPE — and because the delimiters of adjacent symbols are not
    shared, consecutive pairs (``abab``) merge in one pass. The same
    ``replace`` exists in ANSI SQL, so the entire training loop unrolls
    into a DuckDB oracle that verifies every learned rule AND its count.

    Job-count bound: training runs exactly ``ceil(n_merges /
    merges_per_round)`` count-argmax Spark jobs (each collecting
    ``merges_per_round`` rows) plus the final action — with the default
    ``merges_per_round=1`` that is one job per merge, EXACT classic BPE
    (the oracle's semantics). A real 30k-merge vocabulary should pass
    ``merges_per_round≈64``: pair counts are recomputed only once per
    round and the round's top-k pairs merge in recorded order against
    the stale counts — the standard trainer approximation (counts of
    later pairs in a round may have shifted where pairs overlap; a rule
    whose pair was consumed earlier in the round applies as a no-op).
    30k merges then cost ~470 jobs, not 30k sequential ones.
    """
    if merges_per_round < 1:
        raise ValueError(
            f"merges_per_round must be >= 1, got {merges_per_round}"
        )
    words = docs.select(
        F.explode(
            _words(text_col)
        ).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_word"))
    sep = F.lit(BPE_SEP)
    encoded = vocab.select(
        "word",
        "n_word",
        F.concat_ws(
            "", F.transform(F.split("word", ""), lambda c: F.concat(sep, c, sep))
        ).alias("s"),
    )
    # localCheckpoint (eager): materializes the vocabulary once AND
    # truncates lineage every round. The previous persist+unpersist
    # rotation had two compounding costs: unpersisting the old cache
    # before the new frame materialized re-ran the corpus explode +
    # vocabulary shuffle EVERY round, and the logical plan still nested
    # one level per round (caching doesn't truncate the analyzed plan),
    # so late rounds paid ballooning re-analysis — round 15 of a
    # 16-merge run cost 8.7 s against a 0.4 s steady state. Same cure
    # as the Pregel loop in operators/graph.py.
    encoded = encoded.localCheckpoint()
    spark = docs.sparkSession
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        k = min(merges_per_round, n_merges - len(merges))
        # symbols back out of the encoding: strip outer seps, split
        # on the doubled inner separator
        syms = F.split(
            F.expr("substring(s, 2, length(s) - 2)"), BPE_SEP + BPE_SEP
        )
        pairs = encoded.select(
            "n_word",
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.size(syms) - 1),
                    F.slice(syms, 2, F.size(syms) - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n_word").alias("n"))
            .orderBy(F.desc("n"), F.col("a").asc(), F.col("b").asc())
            .limit(k)
            .collect()
        )
        if not best:
            break
        # apply the round's merges in recorded order as ONE chained
        # projection (k string replaces, still a single narrow stage)
        s_expr = F.col("s")
        for row in best:
            a, b, n = row.a, row.b, row.n
            merged = a + b
            merges.append((len(merges), a, b, merged, n))
            s_expr = F.replace(
                s_expr,
                F.lit(f"{BPE_SEP}{a}{BPE_SEP}{BPE_SEP}{b}{BPE_SEP}"),
                F.lit(f"{BPE_SEP}{merged}{BPE_SEP}"),
            )
        # eager checkpoint: the old blocks release as soon as the
        # new ones are written, and the next round's plan starts
        # from a leaf instead of an ever-deeper select chain
        encoded = encoded.select(
            "word", "n_word", s_expr.alias("s")
        ).localCheckpoint()
        if len(best) < k:
            break  # vocabulary exhausted mid-round
    rules = spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )
    if return_encoding:
        # already materialized (eager checkpoint); blocks free with
        # the RDD when the consumer drops the reference — nothing to
        # unpersist even on the caller's failure path
        return rules, encoded
    return rules


def bpe_encode(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE tokenizer to the corpus: per document, the
    exact token count under the ``n_merges`` rules :func:`bpe_train`
    learns from the same corpus. Output: (doc_id, n_words,
    n_bpe_tokens) — the numbers a training-data pipeline needs for
    budgeting, packing, and mixture weighting under its REAL tokenizer
    rather than the whitespace proxy.

    Scale shape: training's final per-word encoding is REUSED directly
    (``bpe_train(..., return_encoding=True)`` — no second vocabulary
    shuffle, no re-applied merges); the per-word token counts
    broadcast-join back onto the (doc, word) stream — no Python, no
    per-doc state.
    """
    _, encoded = bpe_train(
        docs, n_merges=n_merges, text_col=text_col, return_encoding=True
    )
    # already materialized (eager localCheckpoint inside training); its
    # blocks free when the reference drops — no persist lifecycle needed
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            _words(text_col)
        ).alias("word"),
    )
    per_word = encoded.select(
        "word",
        F.size(
            F.split(F.expr("substring(s, 2, length(s) - 2)"), BPE_SEP + BPE_SEP)
        ).alias("_w_toks"),
    )
    return (
        toks.join(F.broadcast(per_word), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_w_toks").alias("n_bpe_tokens"),
        )
    )


def char_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution (bits)
    — the classic gibberish/boilerplate detector: natural text sits
    ~4±0.7 bits, base64 blobs near 6, repeated filler near 0.

    Entropy derives from exact integer character counts; per-character
    plog terms round to micros BEFORE the sum, so the result is an
    order-free integer sum — deterministic and SQL-mirrorable. One
    explode + one (doc, char) shuffle + one doc shuffle, all map-side
    combined.
    """
    chars = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log2(p) * 1_000_000, 0).cast("long")
    return (
        counts.join(totals, "doc_id")
        .select("doc_id", term.alias("_t"))
        .groupBy("doc_id")
        .agg(
            (F.sum("_t").cast("double") / 1_000_000.0).alias("entropy_bits")
        )
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """E5/E2: exact repeated-span detection — the substring-granular
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), recast Spark-first: instead of a suffix
    array, every ``n``-token gram groups by VALUE, grams occurring
    ``min_count``+ times anywhere in the corpus mark their token
    positions duplicated, and per-document overlapping-or-adjacent
    covered intervals merge with one gaps-and-islands window.

    Output: (doc_id, span_start, span_end) — inclusive 0-based token
    indexes of each maximal duplicated region (a caller removes them by
    re-splitting the text). Complements the existing doc-level operators
    (exact_dedup, MinHash near-dup) and the winnowing fingerprints: this
    finds the boilerplate span INSIDE otherwise-unique documents.

    Scale shape: one row per token position through a single groupBy —
    the honest cost of substring dedup (the suffix-array paper pays the
    same linear token pass). The gram string itself is the grouping key
    so the DuckDB twin is exact; at corpus scale swap the key for
    ``xxhash64(gram)`` to shrink shuffle payloads (collision risk 2^-64
    per pair, the standard trade the paper also makes via hashing).
    Everything is JVM expressions + one shuffle + one window.
    """
    if n < 1:
        raise ValueError(f"span gram n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), _words(text_col).alias("_w"))
        .filter(F.size("_w") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(_w) - {n} + 1), "
                    f"i -> concat_ws(' ', slice(_w, i, {n})))"
                )
            ).alias("pos", "gram"),
        )
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select(
        "doc_id",
        F.col("pos").cast("long").alias("s"),  # posexplode is 0-based
        (F.col("pos") + n - 1).cast("long").alias("e"),
    )
    from pyspark.sql.window import Window

    ww = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        ww.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_e.isNull() | (F.col("s") > prev_max_e + 1), 1
    ).otherwise(0)
    islands = hits.withColumn(
        "_isl", F.sum(new_island).over(ww)
    )
    return (
        islands.groupBy("doc_id", "_isl")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
        )
        .drop("_isl")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The actionable form of :func:`duplicate_spans` (what Lee et al.
    actually do): cut every duplicated region out of the text. Returns
    (doc_id, clean_text, n_tokens_removed) for EVERY input document.
    Span DETECTION is case-insensitive (the shared tokenizer's
    lowercase grams, like every text operator here), but the surviving
    text is rebuilt from the ORIGINAL-case tokens — only whitespace is
    normalized; casing in untouched regions is preserved exactly.

    Plan: one left-anti join of the per-position token table against
    the span table — doc_id is the equi key, the span range is the
    residual condition, so the static plan is a sort-merge anti-join
    and AQE broadcasts the span side at runtime whenever it is actually
    small (spans grow O(n_docs) on boilerplate-heavy corpora, so a
    forced broadcast would be a scale hazard). Merged spans are
    disjoint by construction, so no dedup pass is needed. Surviving
    tokens re-assemble with one array_sort + concat_ws per document.
    One token shuffle beyond duplicate_spans' own; no Python nodes.
    """
    spans = duplicate_spans(docs, n, min_count, text_col, id_col)
    # original-case split: identical positions to _words (lowercasing
    # never creates/destroys whitespace or empties a token)
    orig = F.filter(
        F.split(F.col(text_col), WS_REGEX), lambda w: w != ""
    )
    base = docs.select(F.col(id_col).alias("doc_id"), orig.alias("_w"))
    toks = base.select(
        "doc_id", F.posexplode("_w").alias("pos", "tok")
    )
    sp = spans.select(
        F.col("doc_id").alias("s_doc"), "span_start", "span_end"
    )
    kept_agg = (
        toks.join(
            sp,
            (F.col("doc_id") == F.col("s_doc"))
            & (F.col("pos") >= F.col("span_start"))
            & (F.col("pos") <= F.col("span_end")),
            "left_anti",
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, tok)))"
                    ", s -> s.tok)"
                ),
            ).alias("_clean"),
            F.count(F.lit(1)).alias("_kept"),
        )
    )
    # left join back onto EVERY input doc: empty docs (no token rows)
    # and fully-duplicated docs (every token dropped) both still emit a
    # row — clean_text '' with the full token count removed
    return (
        base.select("doc_id", F.size("_w").alias("_n0"))
        .join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_clean", F.lit("")).alias("clean_text"),
            (F.col("_n0") - F.coalesce("_kept", F.lit(0)))
            .alias("n_tokens_removed"),
        )
    )


def nb_quality_classifier(
    docs: DataFrame,
    positive_col: str,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """E5: quality-classifier filtering — the GPT-3/LLaMA CommonCrawl
    recipe (train a classifier on "looks like the reference corpus" weak
    labels, keep docs it scores highly), with the classic multinomial
    Naive Bayes baseline standing in for fastText: NB's train step is
    pure counting, so the WHOLE pipeline — train AND score — is two
    corpus shuffles of JVM expressions, no gradient loop, no Python.

    ``positive_col`` names a boolean column with the weak label (e.g.
    ``lang = 'en'``, or "sampled from Wikipedia"). Add-``alpha`` smoothed
    per-token log-odds are rounded to integer micros FIRST, so each doc's
    score is an exact integer sum and hash-matches the DuckDB twin:

        w(t)  = round(1e6 * ln( (c_pos(t)+a)/(N_pos+aV)
                              / ((c_neg(t)+a)/(N_neg+aV)) ))
        score = round(1e6 * ln(D_pos/D_neg)) + Σ_t n_doc(t) · w(t)

    Output: (doc_id, n_tokens, score_micros, keep) for every input doc —
    token-less docs score the prior alone. Both classes must be present
    (raise_error guards the degenerate corpus executor-side).

    Scale shape: one (doc, token) count shuffle, one vocab-keyed model
    aggregate (map-side combined), one equi-join of doc-token counts
    against the vocab-sized model (AQE broadcasts it when the vocab is
    small — the common case: vocab ≪ corpus), one doc-keyed sum. The
    1-row totals/prior frames attach by broadcast cross join. At 100 TB
    swap the token string key for xxhash64 (boilerplate_stats note).

    No reference counterpart (rasters, not text); mandated by
    BASELINE.json north_star. Public semantics: Brown et al. 2020
    appendix A (quality classifier), NB per McCallum & Nigam 1998.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    pos = F.col(positive_col).cast("boolean")
    base = docs.select(
        F.col(id_col).alias("doc_id"), pos.alias("_pos"), _words(text_col).alias("_w")
    )
    tc = (
        base.select("doc_id", "_pos", F.explode("_w").alias("tok"))
        .groupBy("doc_id", "_pos", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    model = tc.groupBy("tok").agg(
        F.sum(F.when(F.col("_pos"), F.col("cnt")).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("_pos"), F.col("cnt")).otherwise(0)).alias("c_neg"),
    )
    totals = model.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    a = F.lit(float(alpha))
    w = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            F.round(
                (
                    F.log((F.col("c_pos") + a) / (F.col("n_pos") + a * F.col("v")))
                    - F.log((F.col("c_neg") + a) / (F.col("n_neg") + a * F.col("v")))
                )
                * MICROS
            )
            .cast("long")
            .alias("w_micros"),
        )
    )
    d_pos = F.sum(F.when(F.col("_pos"), 1).otherwise(0))
    d_neg = F.sum(F.when(~F.col("_pos"), 1).otherwise(0))
    prior = base.agg(
        F.when(
            (d_pos == 0) | (d_neg == 0),
            F.raise_error(
                F.lit("nb_quality_classifier: both classes must be non-empty")
            ).cast("long"),
        )
        .otherwise(F.round(F.log(d_pos / d_neg) * MICROS).cast("long"))
        .alias("prior_micros")
    )
    per_doc = (
        tc.join(w, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("_n_tok"),
            F.sum(F.col("cnt") * F.col("w_micros")).alias("_s"),
        )
    )
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            F.coalesce("_n_tok", F.lit(0)).alias("n_tokens"),
            (F.coalesce("_s", F.lit(0)) + F.col("prior_micros")).alias(
                "score_micros"
            ),
            (F.coalesce("_s", F.lit(0)) + F.col("prior_micros") > 0).alias("keep"),
        )
    )


def remove_hot_lines(
    docs: DataFrame,
    min_docs: int = 2,
    sep_regex: str | None = r"\n+",
    window_words: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """E5/E2: cross-document line-level dedup — the CCNet/FineWeb
    paragraph pass (Wenzek et al. 2020 §3.1): a line whose normalized
    form appears in ≥ ``min_docs`` DISTINCT documents is boilerplate
    (headers, footers, cookie banners, navigation) and is removed from
    EVERY document; survivors reassemble in original order.

    Segmentation is either ``sep_regex`` (default: newline lines, the
    CCNet definition) or ``window_words=k`` — non-overlapping k-word
    windows for corpora without line structure (the hash key is the
    lowercased segment; reassembly uses the ORIGINAL-case text, same
    casing contract as :func:`remove_duplicate_spans`). Exactly one of
    the two must be set. Empty/whitespace-only segments are dropped.

    Output: (doc_id, clean_text, n_segments, n_removed) for every input
    document — a doc whose every segment is hot emits clean_text ''.

    Scale shape: one shuffle on the segment key for the distinct-doc
    frequency (map-side combined approx? no — exact countDistinct, two-
    stage partial aggregate), one left-anti equi-join back, one doc-keyed
    reassembly aggregation. No Python nodes; no window functions. At
    100 TB swap the key string for ``xxhash64(key)`` before the shuffle
    (same trade documented on boilerplate_stats). The hot-key table is
    corpus-boilerplate-sized, so AQE broadcasts the anti-join side when
    it is genuinely small; a forced broadcast would be a scale hazard on
    template-heavy crawls.

    No reference counterpart (rasters, not text); mandated by
    BASELINE.json north_star. Public semantics: CCNet's dedup_ step /
    FineWeb line-dedup filter.
    """
    if (sep_regex is None) == (window_words is None):
        raise ValueError("set exactly one of sep_regex / window_words")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if window_words is not None:
        if window_words < 1:
            raise ValueError(f"window_words must be >= 1, got {window_words}")
        k = window_words
        orig_words = F.filter(
            F.split(F.col(text_col), WS_REGEX), lambda w: w != ""
        )
        base = docs.select(
            F.col(id_col).alias("doc_id"), orig_words.alias("_wo")
        )
        # segment i (0-based) covers original-case words [k*i, k*i+k-1];
        # the KEY lowercases the same slice, so key/orig positions agree
        segs_expr = F.expr(
            # greatest(…, 0): an empty doc must yield one ''-key segment
            # (filtered below), NOT sequence(0, -1) — Spark's sequence
            # DESCENDS when start > stop, which would emit a bogus idx -1
            f"transform(sequence(0, greatest(CAST(ceil(size(_wo) / {k}.0) AS INT) - 1, 0)), "
            f"i -> struct(CAST(i AS BIGINT) AS idx, "
            f"concat_ws(' ', slice(transform(_wo, w -> lower(w)), i * {k} + 1, {k})) AS key, "
            f"concat_ws(' ', slice(_wo, i * {k} + 1, {k})) AS orig))"
        )
        joiner = " "
    else:
        base = docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), sep_regex).alias("_wo"),
        )
        # raw split keeps every line; blank/whitespace-only lines get key
        # '' and are filtered below (CCNet drops them with the hot lines)
        segs_expr = F.expr(
            "transform(_wo, (line, i) -> struct(CAST(i AS BIGINT) AS idx, "
            "trim(lower(line)) AS key, line AS orig))"
        )
        joiner = "\n"
    seg = (
        base.select("doc_id", F.explode(segs_expr).alias("_s"))
        .select("doc_id", "_s.idx", "_s.key", "_s.orig")
        .filter(F.col("key") != "")
    )
    hot = (
        seg.groupBy("key")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("key")
    )
    kept = (
        seg.join(hot, "key", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                joiner,
                F.expr(
                    "transform(array_sort(collect_list(struct(idx, orig)))"
                    ", s -> s.orig)"
                ),
            ).alias("_clean"),
            F.count(F.lit(1)).alias("_kept"),
        )
    )
    totals = seg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n0"))
    return (
        base.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_clean", F.lit("")).alias("clean_text"),
            F.coalesce("_n0", F.lit(0)).alias("n_segments"),
            (F.coalesce("_n0", F.lit(0)) - F.coalesce("_kept", F.lit(0)))
            .alias("n_removed"),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    alpha_micros: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """E5: CCNet-style quality scoring by bigram language-model negative
    log-likelihood. CCNet filters documents whose perplexity under a
    reference LM is an outlier; with no external model in the container,
    the reference LM is the CORPUS ITSELF (self-scoring flags the same
    outliers: rare constructions score high, boilerplate scores low).

    Model: add-alpha-smoothed bigram LM over the shared tokenizer's
    words,  P(w|v) = (c(v,w) + a) / (c(v,·) + a·V),  a = alpha_micros/1e6,
    V = corpus vocabulary size. Per document: mean NLL over its bigrams,
    in the exact integer micros domain — the per-bigram-TYPE nll rounds
    once (one double log per distinct bigram, same on both engines),
    then documents integer-sum, so the result hash-matches the SQL twin
    bit-for-bit like text_char_entropy.

    Output: (doc_id, n_bigrams, avg_nll_micros) — docs with < 2 tokens
    carry no bigrams and report NULL avg (no DIVIDE_BY_ZERO under ANSI).

    Scale shape: bigram counts are one token-pass groupBy (map-side
    combined); docs join the count table on the bigram key — a plain
    shuffled equi-join whose build side is the MODEL (vocab², but only
    observed bigrams), never all-pairs. V and the total rows are two
    tiny aggregates.
    """
    w = docs.select(
        F.col(id_col).alias("doc_id"), _words(text_col).alias("_w")
    )
    bigrams = (
        w.filter(F.size("_w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_w) - 1), "
                    "i -> struct(_w[i-1] AS v, _w[i] AS t))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.v").alias("v"), F.col("bg.t").alias("t"))
    )
    from pyspark.sql.window import Window

    # ONE exchange for the whole model build: repartition on v alone —
    # HashPartitioning([v]) satisfies the (v,t) aggregate's clustered
    # distribution (subset rule) AND the context-total window's, so
    # neither inserts a second shuffle. (groupBy(v,t) directly would
    # hash-partition on (v,t), which does NOT satisfy the window's
    # requirement on [v], costing an extra exchange + sort.) Partial
    # aggregation still combines map-side, so the shuffle payload is
    # distinct-bigram-sized either way; per-partition skew is bounded
    # by distinct continuations of a context word, not token count.
    pair_counts = bigrams.repartition("v").groupBy("v", "t").agg(
        F.count(F.lit(1)).alias("c_vt")
    )
    # context totals as a window over the same partitioning — no
    # self-join (which trips AMBIGUOUS_REFERENCE on the shared lineage)
    c_v = F.sum("c_vt").over(Window.partitionBy("v"))
    # named _vsz, not V: Spark's default case-insensitive resolution
    # makes a column V ambiguous with the bigram context column v
    vocab = (
        w.select(F.explode("_w").alias("tok")).agg(
            F.countDistinct("tok").alias("_vsz")
        )
    )
    alpha = alpha_micros / 1_000_000.0
    model = (
        pair_counts.withColumn("c_v", c_v)
        .crossJoin(F.broadcast(vocab))
        .select(
            "v", "t",
            F.round(
                -F.log(
                    (F.col("c_vt") + F.lit(alpha))
                    / (F.col("c_v") + F.lit(alpha) * F.col("_vsz"))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("nll_micros"),
        )
    )
    # model DERIVES from bigrams, so this is a self-join: alias both
    # sides so the shared-lineage attributes resolve unambiguously
    scored = (
        bigrams.alias("b")
        .join(
            model.alias("m"),
            (F.col("b.v") == F.col("m.v")) & (F.col("b.t") == F.col("m.t")),
        )
        .select(F.col("b.doc_id").alias("doc_id"), F.col("m.nll_micros").alias("nll_micros"))
    )
    return (
        w.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.sum("nll_micros").alias("_sum"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("_sum") / F.col("n_bigrams")).cast("long"),
            ).alias("avg_nll_micros"),
        )
    )


# The Gopher rule set's required common-English words (Rae et al. 2021,
# Appendix A: "contains at least two of ..."). A module constant so the
# DuckDB oracle builds its CASE terms from the SAME inventory.
GOPHER_REQUIRED_WORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """E5: the full Gopher quality-filter rule set (Rae et al. 2021,
    Appendix A) — the standard pre-training document gate — as one
    zero-shuffle per-row projection. Seven rules, each reported as its
    raw signal (exact integer micros for ratios, determinism policy of
    plans/base.py) plus the final ``keep`` verdict:

    1. 50 <= word count <= 100,000
    2. 3 <= mean word length <= 10 (non-whitespace chars / words —
       a "word" is a whitespace-delimited token, matching token_stats)
    3. symbol-to-word ratio <= 0.1 (symbols: '#' and non-overlapping
       '...' runs, the paper's hash/ellipsis proxy)
    4. <= 90% of non-empty lines start with a bullet ('-', '*', U+2022)
    5. <= 30% of non-empty lines end with an ellipsis ('...' or U+2026)
    6. >= 80% of words contain at least one alphabetic character
    7. the text contains >= 2 distinct words from
       GOPHER_REQUIRED_WORDS (the, be, to, of, and, that, have, with)

    Empty/whitespace-only documents report NULL ratios (no ANSI
    DIVIDE_BY_ZERO) and fail rule 1, so ``keep`` is false — NULL rule
    columns never make a NULL verdict.

    Scale shape: pure column expressions over one scan — no shuffle, no
    Python; at 100 TB this is the cheapest possible operator class
    (scan-bound, trivially partition-parallel). STAGED projections
    (r15, guide §1.6 — the pq_encode pattern): the word and line arrays
    are interpreted higher-order expressions with no cross-column
    subexpression elimination, and the single-Project form re-evaluated
    the word split ~11× per row (size, alpha filter, 8 required-word
    probes) and the line split 3×; materializing each array once in an
    intermediate projection measured 1.6 → 0.95 s at sf0.1 with
    identical output. The reference has no text path; mandated by
    BASELINE.json north_star.

    Output: (doc_id, n_words, mean_word_len_micros, symbol_ratio_micros,
    bullet_line_frac_micros, ellipsis_line_frac_micros,
    alpha_word_frac_micros, n_required_words, keep).
    """
    lt = F.lower(F.col(text_col))
    words = F.filter(F.split(lt, WS_REGEX), lambda w: w != "")
    # lines: newline split, trimmed of horizontal whitespace, empties
    # dropped from BOTH numerator and denominator
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), r"\r?\n"),
            lambda l: F.regexp_replace(l, r"^[ \t]+|[ \t]+$", ""),
        ),
        lambda l: l != "",
    )
    # stage 1: arrays + text-level counts, each evaluated once per row.
    # n_nonws is one regexp_replace, same formulation as token_stats'
    # avg_word_len; hash/ellipsis are the paper's symbol proxies.
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.regexp_replace(F.col(text_col), WS_REGEX, "")).alias("_nn"),
        _count_matches(F.col(text_col), r"#").alias("_nh"),
        _count_matches(F.col(text_col), r"\.\.\.").alias("_nel"),
        words.alias("_w"),
        lines.alias("_l"),
    )
    # stage 2: per-array counts (each reads the materialized array)
    counts = staged.select(
        "doc_id",
        "_nn",
        "_nh",
        "_nel",
        F.size("_w").alias("_nw"),
        F.size(F.col("_l")).alias("_nl"),
        F.size(F.filter(F.col("_l"), lambda l: l.rlike(r"^[-*•]"))).alias("_nb"),
        F.size(
            F.filter(F.col("_l"), lambda l: l.rlike(r"(\.\.\.|…)$"))
        ).alias("_nee"),
        F.size(F.filter(F.col("_w"), lambda w: w.rlike("[a-z]"))).alias("_na"),
        sum(
            F.array_contains(F.col("_w"), w).cast("int")
            for w in GOPHER_REQUIRED_WORDS
        ).alias("_nr"),
    )
    n_words = F.col("_nw")
    n_lines = F.col("_nl")
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den * MICROS, 0).cast("long")
    )
    mean_wl = ratio(F.col("_nn"), n_words)
    sym = ratio(F.col("_nh") + F.col("_nel"), n_words)
    bullet = ratio(F.col("_nb"), n_lines)
    ell = ratio(F.col("_nee"), n_lines)
    alpha = ratio(F.col("_na"), n_words)
    keep = (
        n_words.between(50, 100_000)
        & mean_wl.between(3 * MICROS, 10 * MICROS)
        & (sym <= int(0.1 * MICROS))
        & (bullet <= int(0.9 * MICROS))
        & (ell <= int(0.3 * MICROS))
        & (alpha >= int(0.8 * MICROS))
        & (F.col("_nr") >= 2)
    )
    return counts.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len_micros"),
        sym.alias("symbol_ratio_micros"),
        bullet.alias("bullet_line_frac_micros"),
        ell.alias("ellipsis_line_frac_micros"),
        alpha.alias("alpha_word_frac_micros"),
        F.col("_nr").cast("int").alias("n_required_words"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def lm_perplexity_cross(
    train_docs: DataFrame,
    score_docs: DataFrame,
    alpha_micros: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """E5: CCNet's ACTUAL recipe — score a target corpus under a
    reference LM trained on a DIFFERENT corpus (CCNet trains on
    Wikipedia and filters CommonCrawl by the resulting perplexity;
    :func:`lm_perplexity` is the self-scoring fallback).

    Same add-alpha bigram model, with the out-of-domain cases the
    self-LM never hits handled by the SAME formula at zero counts:
    an unseen bigram under a seen context scores
    −log(α/(c(v,·)+αV)), and a wholly unseen context collapses to
    −log(1/V) = log V (the uniform prior over the train vocabulary).
    Exact integer micros per bigram TYPE (one double log each, rounded
    once), integer-summed per document — hash-reproducible in SQL.

    Output: (doc_id, n_bigrams, avg_nll_micros) for ``score_docs``;
    docs with < 2 tokens report NULL avg.

    Scale shape: the model is one token pass over the TRAIN corpus
    (repartition-on-context + window, one exchange); scoring is two
    left equi-joins of the target's distinct bigram types against the
    model tables — never all-pairs, and the per-type nll computes once
    no matter how often a bigram repeats in the target. The plan's
    BroadcastNestedLoopJoin is the ONE-ROW vocab-size crossJoin
    (output-bounded re-attach, same benign class as the zonal
    result-universe join), not a per-row nested loop.
    """
    from pyspark.sql.window import Window

    def bigrams_of(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        w = docs.select(
            F.col(id_col).alias("doc_id"), _words(text_col).alias("_w")
        )
        bg = (
            w.filter(F.size("_w") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(_w) - 1), "
                        "i -> struct(_w[i-1] AS v, _w[i] AS t))"
                    )
                ).alias("bg"),
            )
            .select("doc_id", F.col("bg.v").alias("v"), F.col("bg.t").alias("t"))
        )
        return w, bg

    _, train_bg = bigrams_of(train_docs)
    score_w, score_bg = bigrams_of(score_docs)
    pair_counts = train_bg.repartition("v").groupBy("v", "t").agg(
        F.count(F.lit(1)).alias("c_vt")
    )
    pair_counts = pair_counts.withColumn(
        "c_v", F.sum("c_vt").over(Window.partitionBy("v"))
    )
    ctx = pair_counts.groupBy("v").agg(F.max("c_v").alias("c_v"))
    vocab = (
        train_docs.select(F.explode(_words(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("_raw_vsz"))
        # an empty train vocabulary makes the add-alpha denominator 0 and
        # every nll a NULL via log(x/0) — fail loudly instead (the guard
        # is woven into _vsz itself, mirroring standardize_crs's in-plan
        # raise, so it survives column pruning and stays lazy)
        .select(
            F.when(F.col("_raw_vsz") > 0, F.col("_raw_vsz"))
            .otherwise(
                F.raise_error(
                    F.lit(
                        "lm_perplexity_cross: train corpus has an empty "
                        "vocabulary (no document yields a token) — the "
                        "add-alpha model is undefined"
                    )
                ).cast("long")
            )
            .alias("_vsz")
        )
    )
    alpha = alpha_micros / 1_000_000.0
    types = (
        score_bg.select("v", "t").distinct().alias("s")
        .join(
            pair_counts.select("v", "t", "c_vt").alias("p"),
            (F.col("s.v") == F.col("p.v")) & (F.col("s.t") == F.col("p.t")),
            "left",
        )
        .join(
            ctx.alias("c"), F.col("s.v") == F.col("c.v"), "left"
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("s.v").alias("v"),
            F.col("s.t").alias("t"),
            F.round(
                -F.log(
                    (F.coalesce(F.col("c_vt"), F.lit(0)) + F.lit(alpha))
                    / (
                        F.coalesce(F.col("c.c_v"), F.lit(0))
                        + F.lit(alpha) * F.col("_vsz")
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("nll_micros"),
        )
    )
    scored = (
        score_bg.alias("b")
        .join(
            types.alias("m"),
            (F.col("b.v") == F.col("m.v")) & (F.col("b.t") == F.col("m.t")),
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("m.nll_micros").alias("nll_micros"),
        )
    )
    return (
        score_w.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.sum("nll_micros").alias("_sum"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("_sum") / F.col("n_bigrams")).cast("long"),
            ).alias("avg_nll_micros"),
        )
    )
