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


def o_hash_split(key_expr: str, weights: dict[str, float], salt: str = "split") -> str:
    """DuckDB CASE expression twin of :func:`hash_split`'s label column."""
    parts = []
    cum = 0.0
    labels = list(weights.items())
    bucket = f"((('0x' || substr(md5('{salt}' || {key_expr}), 1, 8))::BIGINT) % {_HASH_BUCKETS})"
    for label, w in labels[:-1]:
        cum += w
        parts.append(f"WHEN {bucket} < {int(round(cum * _HASH_BUCKETS))} THEN '{label}'")
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
    return ranged.withColumn(
        "shard_id", F.floor(F.col("_excl") / F.lit(max_tokens)).cast("int")
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
    first = F.floor(start / F.lit(seq_len)).cast("long")
    last = F.floor((start + n - F.lit(1)) / F.lit(seq_len)).cast("long")
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
        .drop("_excl")
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
    if prethin_threshold is not None and k < prethin_threshold:
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
    row_number ranking (driver sees only stratum-count-sized aggregates)."""
    sizes = df.groupBy(*strata_cols).agg(F.count("*").alias("_n"))
    big = sizes.filter(F.col("_n") > threshold)
    if not big.take(1):
        return df
    cut = F.least(
        F.lit(float(_HASH_SPACE)),
        F.ceil(F.lit(oversample * k) / F.col("_n") * F.lit(float(_HASH_SPACE))),
    ).cast("long")
    big = big.select(*strata_cols, cut.alias("_cut"))
    thinned = (
        df.join(F.broadcast(big), strata_cols, "left")
        .filter(F.col("_cut").isNull() | (h < F.col("_cut")))
        .drop("_cut")
    )
    # exactness guard: every thinned stratum must keep ≥ k = min(k, N_s)
    kept = (
        thinned.join(F.broadcast(big.select(*strata_cols)), strata_cols, "left_semi")
        .groupBy(*strata_cols)
        .agg(F.count("*").alias("_kept"))
    )
    short = (
        big.join(kept, strata_cols, "left")
        .filter(F.coalesce(F.col("_kept"), F.lit(0)) < k)
        .select(*strata_cols)
    )
    if short.take(1):  # pragma: no cover - probability ≈ e^(-k·oversample)
        restore = df.join(F.broadcast(short), strata_cols, "left_semi")
        thinned = thinned.join(
            F.broadcast(short), strata_cols, "left_anti"
        ).unionByName(restore)
    return thinned


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
    n_copies = (whole + (bucket < frac_bp).cast("int")).alias("_n")
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
