"""Dataset splitting and shard packing (EXT — training-data pipeline).

Two operators every corpus-preparation pipeline needs downstream of
dedup/filtering, both deterministic (hash- and order-based, never RNG
state) so results are identical under AQE re-planning, retries, and
re-runs at 100 TB — and SQL-reproducible for the correctness gate:

- :func:`hash_split` — train/eval/test assignment by content hash of a
  key column. A document's split NEVER depends on partitioning or on
  other rows (unlike ``randomSplit``), so adding data later cannot move
  existing documents across splits — the property that prevents
  train/eval leakage between dataset versions.
- :func:`pack_shards` — assign documents to fixed-token-budget output
  shards in a deterministic key order via an exclusive running sum.
  Shard boundaries are a pure function of the sorted prefix, so a
  re-run yields byte-identical shards.

No reference counterpart (the reference has no dataset-prep surface);
mandated by the BASELINE.json north star's training-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions.hashing import token_hash32
from sids_data_pipeline_spark.lifecycle import track

_HASH_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign each row a split label by hashing ``salt || key``.

    ``weights`` maps label → fraction (must sum to ≤ 1; any remainder
    falls into the last label). The hash bucket is
    ``token_hash32(salt || key) % 10000``; cumulative weight ranges over
    buckets give each label its fraction in expectation while keeping
    assignment a pure per-row function — rows never move between splits
    when the corpus grows, shrinks, or repartitions.
    """
    _validate_weights(weights)
    bucket = token_hash32(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ) % _HASH_BUCKETS
    out = df.withColumn("_bucket", bucket)
    expr = None
    cum = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        cum += w
        cond = F.col("_bucket") < int(round(cum * _HASH_BUCKETS))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return out.withColumn("split", expr).drop("_bucket")


def _validate_weights(weights: dict[str, float]) -> None:
    """Shared contract for split weights: non-empty, positive, sum ≤ 1
    (the remainder falls to the last label). A sum over 1 would make the
    later labels unreachable SILENTLY — a whole split vanishing from a
    curation run with no error is worse than rejecting the dict."""
    if not weights:
        raise ValueError("weights must be a non-empty {label: fraction} dict")
    bad = {k: v for k, v in weights.items() if not v > 0}
    if bad:
        raise ValueError(f"split weights must be positive, got {bad}")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(
            f"split weights sum to {total} > 1; later labels would "
            "silently receive zero rows"
        )


def o_hash_split(key_expr: str, weights: dict[str, float], salt: str = "split") -> str:
    """DuckDB CASE expression twin of :func:`hash_split`'s label column.
    The key casts to VARCHAR explicitly (matching the engine's
    ``cast('string')``) so non-integer key types render identically in
    both engines before hashing."""
    _validate_weights(weights)
    parts = []
    cum = 0.0
    labels = list(weights.items())
    bucket = (
        f"((('0x' || substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT) % {_HASH_BUCKETS})"
    )
    for label, w in labels[:-1]:
        cum += w
        parts.append(f"WHEN {bucket} < {int(round(cum * _HASH_BUCKETS))} THEN '{label}'")
    if not parts:  # single label: hash_split likewise emits a constant
        return f"'{labels[-1][0]}'"
    return "CASE " + " ".join(parts) + f" ELSE '{labels[-1][0]}' END"


def exclusive_prefix_sum(
    df: DataFrame,
    size_expr,
    order_cols: list[str],
    partitions: int | None = None,
    out_col: str = "_excl",
) -> DataFrame:
    """Global exclusive running sum of ``size_expr`` in ``order_cols``
    order, computed scalably in two passes — the classic distributed
    scan: range-partition on the order key (one shuffle, no
    single-partition window), take a per-partition running sum, then add
    each partition's starting offset — the cumulative total of all
    earlier ranges, a partition-count-sized list collected to the driver
    and folded into a literal map. The result depends only on the sorted
    prefix (range boundaries cancel out), so it is identical across
    re-runs and partition counts. Returns the range-partitioned,
    persisted frame with ``out_col`` added.
    """
    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    order = [F.col(c).asc() for c in order_cols]
    ranged = df.repartitionByRange(n_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = track(ranged.withColumn("_sz", size_expr).persist())
    totals = ranged.groupBy("_pid").agg(F.sum("_sz").alias("_t")).collect()
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(totals, key=lambda r: r._pid):
        offsets[r._pid] = run
        run += r._t or 0
    off_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            ),
            F.col("_pid"),
        )
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("_sz").over(w), F.lit(0)) + F.coalesce(
        off_expr, F.lit(0)
    )
    return ranged.withColumn(out_col, excl).drop("_pid", "_sz")


def pack_shards(
    df: DataFrame,
    max_tokens: int,
    size_col: str = "n_tokens",
    order_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Assign each document a ``shard_id`` so consecutive documents (in
    ``order_col`` order — use a unique key) accumulate into
    ~``max_tokens``-token shards:
    ``shard_id = floor(exclusive_running_sum / max_tokens)``.

    A shard may exceed the budget by at most one document (the streaming-
    friendly rule: a document is never split). The global running sum is
    the two-pass distributed scan (:func:`exclusive_prefix_sum`).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    ranged = exclusive_prefix_sum(
        df, F.col(size_col), [order_col], partitions
    )
    # `div` keeps the arithmetic INTEGRAL end to end: floor(a / b) routes
    # through a double and loses exactness past 2^53 tokens, and an INT
    # shard_id would overflow at max_tokens·2^31 total tokens — both
    # inside the 100 TB regime this module targets.
    return ranged.withColumn(
        "shard_id", F.expr(f"_excl div {int(max_tokens)}").cast("long")
    ).drop("_excl")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    size_col: str = "n_tokens",
    order_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style pretraining
    layout): documents are conceptually concatenated in ``order_col``
    order and the token stream is cut every ``seq_len`` tokens, so a
    document may span sequence boundaries. Emits, per document:

    - ``tok_start`` — its offset in the concatenated token stream (the
      exclusive running sum of sizes);
    - ``first_seq`` / ``last_seq`` — the first and last sequence index it
      occupies (``floor(tok_start/L)`` … ``floor((tok_start+n-1)/L)``);
    - ``n_seqs`` — how many sequences it touches (0 for an empty doc,
      whose ``last_seq`` is NULL).

    All integer arithmetic on the distributed scan's prefix sums — no
    float division, no data movement beyond the one range shuffle, and
    the writer that materializes physical sequences needs only an
    equi-join on ``first_seq…last_seq`` buckets.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    ranged = exclusive_prefix_sum(
        df, F.col(size_col).cast("long"), [order_col], partitions
    )
    n = F.col(size_col).cast("long")
    start = F.col("_excl")
    # `div`, not floor(a/b): the double route loses exactness past 2^53
    # tokens (multi-epoch concatenated streams) — the oracle twin's //
    # is integer division and the docstring promises the same here
    ranged = ranged.withColumn("_last_tok", start + n - F.lit(1))
    first = F.expr(f"_excl div {int(seq_len)}").cast("long")
    last = F.expr(f"_last_tok div {int(seq_len)}").cast("long")
    return (
        ranged.withColumn("tok_start", start.cast("long"))
        .withColumn("first_seq", first)
        .withColumn(
            "last_seq", F.when(n > 0, last).otherwise(F.lit(None).cast("long"))
        )
        .withColumn(
            "n_seqs",
            F.when(n > 0, (last - first + F.lit(1))).otherwise(F.lit(0)).cast("long"),
        )
        .drop("_excl", "_last_tok")
    )


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "shuffle",
    epoch: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Seed-stable global training-order permutation: every row gets an
    ``epoch_pos`` — its 0-based position in a pseudo-random but fully
    deterministic global shuffle of the corpus. The order key is the
    content hash of ``salt:epoch:key``, so each epoch is a fresh
    permutation, re-runs (and the SQL oracle) reproduce it exactly, and
    a grown corpus only interleaves new rows rather than reshuffling
    old positions arbitrarily.

    Scale shape: the permutation is realized as a range-partitioned sort
    on (hash, key) — no global window. Positions come from the same
    two-pass distributed scan as shard packing, counting 1 per row.
    """
    h = token_hash32(
        F.concat(F.lit(f"{salt}:{epoch}:"), F.col(key_col).cast("string"))
    )
    hashed = df.withColumn("_h", h)
    ranged = exclusive_prefix_sum(
        hashed, F.lit(1).cast("long"), ["_h", key_col], partitions
    )
    return ranged.withColumn("epoch_pos", F.col("_excl").cast("long")).drop(
        "_excl", "_h"
    )


def length_buckets(
    df: DataFrame,
    size_col: str = "n_tokens",
    batch_tokens: int = 256,
) -> DataFrame:
    """Power-of-two sequence-length histogram — the batch-planning view
    of a training corpus (how many docs/tokens per length class, and a
    lower bound on the batch count at a given token budget).

    ``bucket`` is the bit length of the size (floor(log2)+1) computed by
    integer base conversion, NOT float log2 — a float log within one ulp
    of an integer would bucket boundary sizes differently across
    engines. ``n_batches_lb`` is ceil(sum/batch) in pure integer
    arithmetic. One map-side-combined aggregation; no shuffle beyond the
    bucket-count-sized exchange.
    """
    if batch_tokens <= 0:
        raise ValueError(f"batch_tokens must be positive, got {batch_tokens}")
    s = F.col(size_col).cast("long")
    bucket = F.length(F.conv(s.cast("string"), 10, 2)).alias("bucket")
    return (
        df.select(bucket, s.alias("_s"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_s").alias("sum_tokens"),
            F.min("_s").alias("min_tokens"),
            F.max("_s").alias("max_tokens"),
            # integer ceil-div (DIV, not /): float division would round
            # wrong past 2^53 total tokens
            F.expr(f"(sum(_s) + {batch_tokens - 1}) div {batch_tokens}")
            .cast("long")
            .alias("n_batches_lb"),
        )
        .orderBy("bucket")
    )


def hash_threshold_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-row sampler: keep rows whose content-hash bucket
    falls under ``fraction``. A pure row-local predicate — no shuffle, no
    window, no RNG state — so it costs a scan at any scale, is stable
    under AQE/retries, and a document's membership never changes when the
    corpus grows (the same leakage-stability property as hash_split).
    Sample SIZE is binomial around fraction*N, not exact."""
    bucket = token_hash32(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ) % _HASH_BUCKETS
    return df.filter(bucket < int(round(fraction * _HASH_BUCKETS)))


_HASH_SPACE = 2**32  # token_hash32 range


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_col: str = "doc_id",
    salt: str = "sample",
    prethin_threshold: int | None = 10_000_000,
    oversample: float = 8.0,
) -> DataFrame:
    """EXACTLY min(k, N_s) rows per stratum, chosen in deterministic
    content-hash order (hash ties broken by key), so the sample is
    reproducible across runs, partitionings, and engines.

    Plan shape: one shuffle on the strata columns + a per-stratum
    row_number window. A stratum is ranked in a single task, so for
    strata above ``prethin_threshold`` rows the operator AUTO-COMPOSES a
    hash pre-thin: since the ranking orders by the hash ascending,
    keeping only rows with ``hash < oversample·k/N_s · 2³²`` provably
    preserves the top-k as long as ≥ k rows survive — which a driver-side
    guard on a tiny per-stratum aggregate verifies, restoring the full
    stratum in the (≈2^-k·ln(oversample)-unlikely) shortfall case. Result
    is therefore IDENTICAL with and without thinning (property-tested);
    the window task sees ~oversample·k rows instead of N_s.
    Set ``prethin_threshold=None`` to disable."""
    h = token_hash32(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    # no k-vs-threshold guard: k (a sample size) and the threshold (a
    # stratum row count) have different units, and the cut formula
    # self-neutralizes anyway — when oversample·k ≥ N_s the cut reaches
    # the full hash space and nothing is thinned
    if prethin_threshold is not None:
        df = _prethin_for_rank(
            df, list(strata_cols), k, h, prethin_threshold, oversample
        )
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _prethin_for_rank(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    h,
    threshold: int,
    oversample: float,
) -> DataFrame:
    """Thin oversized strata to their smallest-hash rows ahead of the
    row_number ranking (driver sees only stratum-count-sized aggregates).

    All joins key on a NULL-SAFE digest of the strata columns
    (dedup.exact_key_digest): a plain equi-join never matches a NULL
    stratum, which would have skipped thinning for exactly the kind of
    degenerate stratum (lang NULL) most likely to be oversized, and then
    unconditionally fired the improbable restore path. The tiny
    aggregate frames persist so the full-corpus groupBy computes once,
    not once per downstream reference."""
    from sids_data_pipeline_spark.operators.dedup import exact_key_digest

    df = df.withColumn("_sk", exact_key_digest(strata_cols, df))
    sizes = df.groupBy("_sk").agg(F.count("*").alias("_n"))
    big = track(sizes.filter(F.col("_n") > threshold).persist())
    if not big.take(1):
        return df.drop("_sk")
    cut = F.least(
        F.lit(float(_HASH_SPACE)),
        F.ceil(F.lit(oversample * k) / F.col("_n") * F.lit(float(_HASH_SPACE))),
    ).cast("long")
    big_cut = big.select("_sk", cut.alias("_cut"))
    thinned = (
        df.join(F.broadcast(big_cut), "_sk", "left")
        .filter(F.col("_cut").isNull() | (h < F.col("_cut")))
        .drop("_cut")
    )
    # exactness guard: every thinned stratum must keep ≥ k = min(k, N_s)
    kept = (
        thinned.join(F.broadcast(big.select("_sk")), "_sk", "left_semi")
        .groupBy("_sk")
        .agg(F.count("*").alias("_kept"))
    )
    short = track(
        big.join(kept, "_sk", "left")
        .filter(F.coalesce(F.col("_kept"), F.lit(0)) < k)
        .select("_sk")
        .persist()
    )
    if short.take(1):  # pragma: no cover - probability ≈ e^(-k·oversample)
        restore = df.join(F.broadcast(short), "_sk", "left_semi")
        thinned = thinned.join(
            F.broadcast(short), "_sk", "left_anti"
        ).unionByName(restore)
    return thinned.drop("_sk")


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str,
    key_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Resample each domain at its own rate to hit a target data mixture
    (the training-corpus "mixing" step: upweight rare/high-quality
    domains, downweight bulk ones). ``rates`` maps a ``domain_col`` value
    to a sampling rate; rate > 1 upsamples by emitting ``floor(rate)``
    full copies plus one hash-gated fractional copy, rate < 1 downsamples
    by the same hash gate, absent domains get ``default_rate``. The
    output carries a 1-based ``copy_id`` distinguishing duplicates.

    Determinism: the gate is the same content-hash-bucket predicate as
    :func:`hash_threshold_sample` (row-local, leakage-stable), and each
    rate is converted to (whole copies, fractional basis points) ONCE in
    the driver — no float arithmetic happens per-row or per-engine, so
    the SQL oracle reproduces membership exactly.

    Scale shape: zero shuffles — a broadcast-literal map lookup, a
    filter, and an explode, all row-local; cost is a scan at any volume.
    """
    whole_entries: list = []
    frac_entries: list = []
    for domain, rate in rates.items():
        if rate < 0:
            raise ValueError(f"negative rate for {domain!r}: {rate}")
        whole_entries += [F.lit(domain), F.lit(int(rate))]
        frac_entries += [
            F.lit(domain),
            F.lit(int(round((rate - int(rate)) * _HASH_BUCKETS))),
        ]
    d_whole = F.lit(int(default_rate))
    d_frac = F.lit(int(round((default_rate - int(default_rate)) * _HASH_BUCKETS)))
    dom = F.col(domain_col)
    whole = F.coalesce(F.create_map(*whole_entries)[dom], d_whole) if rates else d_whole
    frac_bp = F.coalesce(F.create_map(*frac_entries)[dom], d_frac) if rates else d_frac
    bucket = token_hash32(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ) % _HASH_BUCKETS
    # when/otherwise, not a bare boolean cast: a NULL key makes the
    # bucket NULL and NULL.cast('int') would NULL the whole copy count
    # (silently dropping the row even at rate 5.0) while the SQL twin's
    # CASE ... ELSE 0 keeps the whole copies — align on the CASE form
    n_copies = (
        whole + F.when(bucket < frac_bp, F.lit(1)).otherwise(F.lit(0))
    ).alias("_n")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def o_mixture_sample(
    table_sql: str,
    rates: dict[str, float],
    domain_col: str,
    select_cols: str,
    key_expr: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
) -> str:
    """DuckDB SQL twin of :func:`mixture_sample` — identical
    driver-precomputed (whole, basis-point) thresholds, identical md5
    bucket, ``copy_id`` from ``range(1, n+1)``."""
    from sids_data_pipeline_spark.functions.hashing import o_token_hash32

    def arms(f) -> str:
        return " ".join(
            f"WHEN '{d}' THEN {f(r)}" for d, r in rates.items()
        )

    whole_case = (
        f"CASE {domain_col} {arms(lambda r: int(r))} ELSE {int(default_rate)} END"
    )
    frac_case = (
        f"CASE {domain_col} "
        f"{arms(lambda r: int(round((r - int(r)) * _HASH_BUCKETS)))} "
        f"ELSE {int(round((default_rate - int(default_rate)) * _HASH_BUCKETS))} END"
    )
    hashed = o_token_hash32(f"'{salt}' || CAST({key_expr} AS VARCHAR)")
    bucket = f"({hashed} % {_HASH_BUCKETS})"
    return f"""
WITH src AS ({table_sql}),
n_of AS (
  SELECT *,
         ({whole_case})
           + (CASE WHEN {bucket} < ({frac_case}) THEN 1 ELSE 0 END) AS _n
  FROM src
)
SELECT {select_cols}, CAST(t.x AS INT) AS copy_id
FROM n_of, unnest(range(1, _n + 1)) AS t(x)
WHERE _n > 0
"""


def dsir_weights(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha_micros: int = 100_000,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed n-gram features are under the TARGET
    distribution (rows matching ``target_pred`` — e.g. a trusted
    high-quality slice) than under the RAW corpus. Downstream selection
    is then a deterministic top-k or :func:`hash_threshold_sample` over
    the weight column — this operator computes the weights.

    Features are the paper's hashed bag of unigrams + bigrams over the
    shared tokenizer's words, bucketed by the portable md5 hash family
    (``token_hash32 % n_buckets``) so the DuckDB twin reproduces every
    bucket. Both feature models are add-alpha smoothed categorical
    distributions (a = alpha_micros/1e6):

        log w(doc) = sum_b c_b(doc) * [ln p_target(b) - ln p_raw(b)]

    Determinism: the per-bucket log-ratio rounds ONCE to exact integer
    micros (one double ln per side, bit-identical across engines); the
    per-document sum is then an order-free BIGINT dot product — the same
    policy as lm_perplexity / text_char_entropy (plans/base.py).

    Output: (doc_id, is_target, n_grams, dsir_logw_micros); documents
    with no words carry n_grams = 0 and a NULL weight.

    Scale shape: ONE gram-sized exchange (repartition on doc_id feeds
    both the per-(doc,bucket) aggregate and — via the broadcast bucket
    model — the per-doc dot product under the subset rule, like
    lm_perplexity's model build), plus one narrow (doc_id, is_target)
    shuffle on the left-join that restores zero-word documents. The
    bucket model is an ``n_buckets``-row aggregate of the persisted
    doc-bucket table, broadcast back. Nothing all-pairs, nothing on the
    driver; the persisted intermediate is
    O(docs x distinct buckets per doc), bounded by total gram count.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if isinstance(target_pred, str):
        target_pred = F.expr(target_pred)
    w = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("boolean").alias("is_target"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\x0B\f\r]+"),
            lambda t: t != "",
        ).alias("_w"),
    )
    grams = w.select(
        "doc_id",
        "is_target",
        F.explode(
            F.concat(
                F.col("_w"),
                # guarded: sequence(1, 0) would be the DESCENDING [1, 0]
                # and emit null bigrams for single-word docs
                F.expr(
                    "CASE WHEN size(_w) >= 2 THEN "
                    "transform(sequence(1, size(_w) - 1), "
                    "i -> concat(_w[i-1], ' ', _w[i])) "
                    "ELSE array() END"
                ),
            )
        ).alias("gram"),
    ).select(
        "doc_id",
        "is_target",
        (token_hash32("gram") % n_buckets).alias("bucket"),
    )
    db = track(
        grams.repartition("doc_id")
        .groupBy("doc_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    model = db.groupBy("bucket").agg(
        F.sum("c").alias("c_raw"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias(
            "c_tgt"
        ),
    )
    totals = model.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    alpha = alpha_micros / 1_000_000.0
    ab = alpha * n_buckets
    llr = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            (
                F.log((F.col("c_tgt") + F.lit(alpha)) / (F.col("n_tgt") + F.lit(ab)))
                - F.log((F.col("c_raw") + F.lit(alpha)) / (F.col("n_raw") + F.lit(ab)))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("llr_micros"),
    )
    scored = (
        db.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("llr_micros")).alias("dsir_logw_micros"),
        )
    )
    return (
        w.select("doc_id", "is_target")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            "dsir_logw_micros",
        )
    )


def temperature_rates(
    df: DataFrame,
    domain_col: str,
    temperature: float,
    target_total: int | None = None,
) -> dict[str, float]:
    """Temperature-based mixture rates (the GPT-3/PaLM multilingual
    recipe): sampling probability p_d ∝ n_d^(1/T), so T=1 reproduces the
    natural distribution and T→∞ approaches uniform over domains.
    Returns the per-domain rates to feed :func:`mixture_sample`, scaled
    so the EXPECTED output size is ``target_total`` (default: the input
    size — pure re-balancing).

    Driver math on a dimension-sized aggregate (one groupBy collect of
    |domains| rows); the distributed resample stays the zero-shuffle
    hash-gated :func:`mixture_sample`.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return {}
    total = sum(counts.values())
    n_out = target_total if target_total is not None else total
    w = {d: n ** (1.0 / temperature) for d, n in counts.items()}
    z = sum(w.values())
    return {d: (w[d] / z) * n_out / counts[d] for d in counts}
