"""Similarity search over embedding columns (EXT E3 — SURVEY.md §2b).

Two paths, mirroring the dedup family's correctness/scale split:

- :func:`topk_bruteforce` — exact top-k cosine neighbors. The (small)
  query set is collected once and broadcast as an int64 numpy matrix;
  candidates stream through an Arrow-batched matmul scorer that keeps
  only per-batch top-k per query, so the final exact window sees
  O(batches·k·|Q|) rows no matter how many candidates streamed past.
  Vectors transform element-wise to an exact integer micros domain
  JVM-side first (plans/base.py determinism policy), so the cosine is
  the same IEEE-754 division the SQL oracle evaluates — bit-identical
  across engines and partitionings.
- :func:`ann_lsh` — the scale path: random-hyperplane bucketing
  (BucketedRandomProjectionLSH) restricts candidates to nearby buckets,
  then the exact kernel re-ranks. Bucketed candidates only — never
  all-pairs.
- :func:`cosine_pairs` — embedding-cosine near-duplicate pairs (feeds the
  dedup family, VERDICT "embedding-cosine near-dup").

No reference counterpart exists (the reference has no vector data);
mandated by BASELINE.json north_star.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sids_data_pipeline_spark.lifecycle import track

MICROS = 1_000_000


def _int_vec(col: str | Column) -> Column:
    """array<float> → array<bigint> of micros: exact element-wise domain."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.round(x.cast("double") * MICROS, 0).cast("long")
    )


def _dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two micros vectors (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the integer self-dot (squared norm in micros² domain)."""
    iv = _int_vec(vec_col)
    return df.withColumn("_iv", iv).withColumn("_norm2", _dot(F.col("_iv"), F.col("_iv")))


def cosine(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """Cosine from exact integers: one deterministic double division."""
    return dot.cast("double") / (
        F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double"))
    )


QUERY_COLLECT_LIMIT = 100_000  # ~100k × (id + few-hundred-dim int64) rows


def _require_integral_ids(op: str, id_col: str, **frames: DataFrame) -> None:
    """The broadcast matrices and output schemas are int64: refuse
    string ids up front with the documented remedy rather than crashing
    deep in a numpy/py4j conversion."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    for side, df in frames.items():
        idt = df.schema[id_col].dataType
        if not isinstance(idt, (ByteType, ShortType, IntegerType, LongType)):
            raise ValueError(
                f"{op}: {side}.{id_col} must be integral "
                f"(got {idt.simpleString()}); map string ids to int64 "
                "first (e.g. xxhash64 or a dictionary join)"
            )


def topk_bruteforce(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_limit: int = QUERY_COLLECT_LIMIT,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The query side is a small dimension set, so it is collected once and
    broadcast as a numpy matrix (same pattern as the zonal broadcast
    path); candidates stream through an Arrow-batched numpy scorer that
    computes ALL query dots per batch with one int64 matmul and keeps only
    the per-batch top-k per query (map-side partial top-k — each executor
    emits ≤ batches×k×|Q| rows, so the final exact window sees thousands
    of rows no matter how many candidates streamed past). The integer
    micros domain is computed JVM-side by :func:`with_norm` and carried
    into the batch, so the cosine is the same IEEE-754 division the SQL
    oracle evaluates — bit-identical, hash-verified.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken
    by neighbor_id so results are total-order deterministic.

    ``id_col`` must be an integral column (the broadcast matrix and the
    output schema are int64); string ids would crash deep in the numpy
    conversion, so they are rejected up front. The query broadcast lives
    until the SparkContext ends (it cannot be destroyed before the lazy
    result is consumed) — in a long evaluation loop, re-use one call's
    result rather than re-invoking per experiment.

    The query-side collect is BOUNDED (``query_limit``, same limit-probe
    idiom as the zonal broadcast path): brute-force with a corpus-sized
    query side is O(|Q|·|C|) work no matter how it is scheduled, so a
    query frame over the cap raises with a pointer to :func:`ann_lsh`
    (bucketed candidates, both sides distributed) instead of OOMing the
    driver. The limit doubles as the oversize probe — no separate count
    job.
    """
    import numpy as np
    import pandas as pd

    _require_integral_ids(
        "topk_bruteforce", id_col, queries=queries, candidates=candidates
    )

    q_rows = (
        with_norm(queries, vec_col)
        .select(F.col(id_col).alias("query_id"), "_iv", "_norm2")
        .limit(query_limit + 1)
        .collect()
    )
    if len(q_rows) > query_limit:
        raise ValueError(
            f"topk_bruteforce: queries exceed query_limit={query_limit}; "
            "a corpus-sized query side makes exact brute force O(|Q|·|C|) "
            "— use ann_lsh (bucketed candidates, fully distributed) or "
            "raise query_limit explicitly if the driver can hold it"
        )
    spark = candidates.sparkSession
    if not q_rows:  # empty query set -> empty result, same schema
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qid = np.array([r.query_id for r in q_rows], dtype=np.int64)
    qmat = np.array([r._iv for r in q_rows], dtype=np.int64)  # (m, d)
    qsqrt = np.sqrt(np.array([r._norm2 for r in q_rows], dtype=np.float64))

    q_bc = spark.sparkContext.broadcast((qid, qmat, qsqrt))

    def score(batches):
        bqid, bqmat, bqsqrt = q_bc.value
        m = bqid.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            nbr = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cmat = np.stack(pdf["_iv"].to_numpy()).astype(np.int64)  # (b, d)
            csqrt = np.sqrt(pdf["_norm2"].to_numpy(dtype=np.float64))
            # exact int64 dot, then the oracle's own sqrt(q)*sqrt(c) division
            cos = (cmat @ bqmat.T) / (bqsqrt[None, :] * csqrt[:, None])
            out_q, out_n, out_c = [], [], []
            for j in range(m):
                col = cos[:, j]
                keep = nbr != bqid[j]
                # total order (cosine desc, neighbor_id asc): any global
                # top-k row is also in its batch's top-k under this order.
                # NaN (zero-norm vectors) maps to +inf so the batch cut
                # ranks it FIRST — matching Spark's window ORDER BY DESC,
                # where NaN is the largest double.
                sort_col = np.where(np.isnan(col[keep]), np.inf, col[keep])
                order = np.lexsort((nbr[keep], -sort_col))[:k]
                sel_n = nbr[keep][order]
                out_q.append(np.full(sel_n.shape[0], bqid[j], dtype=np.int64))
                out_n.append(sel_n)
                out_c.append(col[keep][order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "_iv", "_norm2"
    )
    partial = c.mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    # pandas→Arrow turns float NaN into NULL; restore NaN (cosine is
    # never legitimately NULL here) so the window ranks zero-norm
    # vectors first under DESC — Spark/DuckDB NaN-is-largest semantics,
    # identical to the JVM 0/0 division the oracle evaluates.
    partial = partial.withColumn(
        "cosine",
        F.when(F.col("cosine").isNull(), F.lit(float("nan"))).otherwise(
            F.col("cosine")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


QUANT_LEVELS = 127  # symmetric int8 range


def quantized_vec(col: str | Column) -> Column:
    """Symmetric int8 quantization over the exact micros domain:
    ``q_i = round(iv_i · 127 / max|iv|)`` ∈ [−127, 127].

    The max-abs is an exact integer (micros domain), so the per-element
    double expression is identical on both engines — the quantized store
    is 4× smaller than float32 (the 100 TB lever: an embedding corpus
    that doesn't fit as float32 often fits as int8) and stays fully
    SQL-mirrorable. Zero vectors quantize to zero."""
    iv = _int_vec(col)
    maxabs = F.array_max(F.transform(iv, lambda x: F.abs(x)))
    return F.when(
        maxabs == 0, F.transform(iv, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(
            iv,
            lambda x: F.round(
                x.cast("double") * float(QUANT_LEVELS) / maxabs.cast("double"), 0
            ).cast("long"),
        )
    )


def _quantize_col(
    df: DataFrame, vec_col: str, out_col: str, nonzero_only: bool = False
) -> DataFrame:
    """:func:`quantized_vec`'s math with ``_int_vec`` and the max-abs
    materialized ONCE as columns — the hot-path form. Higher-order-
    function lambdas get no common-subexpression elimination, so
    embedding the maxabs expression inside the per-element lambda (as
    the expression-building variant must) re-evaluates an O(d) max per
    element: O(d²) work per row, ~d× the quantization cost on real
    embedding widths. Bound column references are slot reads.

    ``nonzero_only=True`` drops zero vectors HERE, on ``_ma > 0`` — the
    exact equivalent of filtering the quantized self-dot (the max-abs
    element quantizes to ±QUANT_LEVELS ≠ 0, so ``dot(q,q) > 0 ⟺
    _ma > 0``) and the oracle's own ``maxabs > 0`` guard. Filtering the
    self-dot downstream instead lets predicate pushdown substitute the
    whole quantize+zip_with tree into an interpreted per-row Filter
    below these projections (r14 plan read: the doubled CASE tree
    evaluated the quantization ~8× per candidate row)."""
    df = df.withColumn("_ivq", _int_vec(vec_col)).withColumn(
        "_ma", F.array_max(F.transform(F.col("_ivq"), lambda x: F.abs(x)))
    )
    if nonzero_only:
        df = df.filter(F.col("_ma") > 0)
    quant = F.when(
        F.col("_ma") == 0,
        F.transform(F.col("_ivq"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("_ivq"),
            lambda x: F.round(
                x.cast("double") * float(QUANT_LEVELS) / F.col("_ma").cast("double"),
                0,
            ).cast("long"),
        )
    )
    return df.withColumn(out_col, quant).drop("_ivq", "_ma")


def topk_quantized(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine over int8-QUANTIZED vectors — the memory-bound
    regime's answer shape (quantize once at ingest, scan 4× less).

    Entirely JVM-side: the (small) query set broadcasts through a
    BroadcastNestedLoopJoin (output-bounded: |Q|·N rows), the dot is an
    integer fold in whole-stage codegen, and one window ranks per query.
    Deterministic ties via neighbor_id. Output: (query_id, neighbor_id,
    cosine, rank) where cosine is the quantized-domain cosine.
    """
    # Zero vectors have no direction: drop them on both sides (cosine is
    # undefined; the SQL oracle's maxabs > 0 guard makes the same cut).
    q = (
        _quantize_col(queries, vec_col, "_qv", nonzero_only=True)
        .select(F.col(id_col).alias("query_id"), "_qv")
        .withColumn("_qn", _dot(F.col("_qv"), F.col("_qv")))
    )
    c = (
        _quantize_col(candidates, vec_col, "_cv", nonzero_only=True)
        .select(F.col(id_col).alias("neighbor_id"), "_cv")
        .withColumn("_cn", _dot(F.col("_cv"), F.col("_cv")))
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cosine", cosine(_dot(F.col("_qv"), F.col("_cv")), F.col("_qn"), F.col("_cn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


ALL_PAIRS_LIMIT = 100_000


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id1, id2, cosine ≥ threshold).

    ``block_col`` restricts pairs to equal-key blocks (equi-join, the
    scale-safe shape); pass None for exact all-pairs semantics on small
    inputs. Pairs are id1 < id2.

    The ``block_col=None`` path is an explicit crossJoin — quadratic by
    definition — so it refuses inputs above ``ALL_PAIRS_LIMIT`` rows
    (bounded limit probe, no full count) rather than silently launching
    an O(n²) job at corpus scale; block on a coarse key (IVF label, LSH
    bucket, language, …) instead.

    Zero-norm vectors are DROPPED: their cosine with everything is
    0/0 = NaN, and Spark compares NaN larger than any double, so without
    the guard one all-zero embedding (OOV/padding row) would emit a
    bogus "near-duplicate" pair with EVERY vector in its block and the
    downstream dedup would delete those documents.
    """
    if block_col is None:
        probe = embeddings.limit(ALL_PAIRS_LIMIT + 1).count()
        if probe > ALL_PAIRS_LIMIT:
            raise ValueError(
                f"cosine_pairs(block_col=None) is all-pairs (O(n²)) and the "
                f"input exceeds {ALL_PAIRS_LIMIT} rows; pass a block_col "
                "(IVF/LSH bucket, label) for the scale-safe equi-join path"
            )
    # exists(x ≠ 0) ⟺ _norm2 > 0 exactly (sum of squares over integers),
    # but survives predicate pushdown as ONE short-circuit pass instead
    # of substituting the whole zip_with self-dot below the projections
    e = with_norm(embeddings, vec_col).filter(
        F.exists(F.col("_iv"), lambda x: x != F.lit(0))
    )
    l = e.select(
        F.col(id_col).alias("id1"),
        F.col("_iv").alias("_v1"),
        F.col("_norm2").alias("_n1"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    r = e.select(
        F.col(id_col).alias("id2"),
        F.col("_iv").alias("_v2"),
        F.col("_norm2").alias("_n2"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    joined = (
        l.join(r, "_blk") if block_col else l.crossJoin(r)
    ).filter(F.col("id1") < F.col("id2"))
    return (
        joined.withColumn("_dot", _dot(F.col("_v1"), F.col("_v2")))
        .withColumn("cosine", cosine(F.col("_dot"), F.col("_n1"), F.col("_n2")))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", F.round("cosine", 6).alias("cosine"))
    )


def topk_ivf(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: search only the query's coarse bucket, exact re-rank
    inside it.

    ``bucket_col`` plays the role of the IVF centroid assignment (here the
    pre-computed cluster label; a production build assigns it by nearest
    centroid at ingest). The probe is a bucket equi-join — candidates
    outside the query's bucket are never scored, which is the inverted-file
    property that makes the search sub-linear. Deterministic bucket rule ⇒
    SQL-reproducible ⇒ full-hash oracle (unlike the seeded LSH variant).
    Output: (query_id, neighbor_id, cosine, rank).
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(bucket_col).alias("_bkt"),
        F.col("_iv").alias("_qv"),
        F.col("_norm2").alias("_qn"),
    )
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(bucket_col).alias("_bkt"),
        "_iv",
        "_norm2",
    )
    scored = (
        c.join(F.broadcast(q), "_bkt")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_dot", _dot(F.col("_iv"), F.col("_qv")))
        .withColumn("cosine", cosine(F.col("_dot"), F.col("_qn"), F.col("_norm2")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ann_lsh(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_distance: float = 10.0,
) -> DataFrame:
    """Approximate top-k via random-hyperplane bucketing + exact re-rank.

    BucketedRandomProjectionLSH generates candidates from matching
    buckets only; the exact integer-domain cosine re-ranks them. Recall
    is spot-checked against :func:`topk_bruteforce` in tests. Seeded —
    deterministic run-to-run — but not SQL-reproducible, so the driver
    records the weaker rows-only check for this one.

    ``max_distance`` is the euclidean candidate cutoff fed to
    approxSimilarityJoin — the knob that can silently zero out recall:
    embeddings whose pairwise distances exceed it (un-normalized raw
    activations, large scales) produce NO candidates. Raise it (or
    normalize the vectors) when recall collapses versus bruteforce.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    if not candidates.take(1):
        # fit() infers dimensionality from the first row and crashes
        # opaquely on an empty frame; return the contract schema instead
        return candidates.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )

    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_arr"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qarr"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(cand)
    # approxSimilarityJoin on euclidean distance → candidate set; exact
    # cosine re-rank in the integer domain.
    joined = model.approxSimilarityJoin(
        model.transform(cand), model.transform(q), max_distance, distCol="_dist"
    ).select(
        # long ids regardless of the inputs' integral id dtype, matching
        # the empty-candidates branch's hardcoded schema (same fix as
        # topk_pq/topk_ivf_pq, r14)
        F.col("datasetB.query_id").cast("long").alias("query_id"),
        F.col("datasetA.neighbor_id").cast("long").alias("neighbor_id"),
        F.col("datasetA._arr").alias("_arr"),
        F.col("datasetB._qarr").alias("_qarr"),
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    a, b = _int_vec("_arr"), _int_vec("_qarr")
    scored = joined.withColumn(
        "cosine", cosine(_dot(a, b), _dot(a, a), _dot(b, b))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _coarse_assign(x, cent):
    """Vectorized nearest-centroid (cluster labels, min dist2) for an
    int64 (B, d) matrix against an int64 (k, d) centroid matrix, via the
    exact expanded form |x|² − 2x·c + |c|²; argmin ties to the lowest
    index — the module's tie rule."""
    d2 = (
        (x * x).sum(axis=1)[:, None]
        + (cent * cent).sum(axis=1)[None, :]
        - 2 * (x @ cent.T)
    )
    return d2.argmin(axis=1), d2.min(axis=1)


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Deterministic k-means ASSIGNMENT step: each vector goes to its
    nearest centroid by exact integer squared-L2 in the micros domain
    (ties break to the lowest centroid index). Default centroids are the
    ``k`` vectors with the smallest ids — a fixed, engine-independent
    init — or pass ``centroids`` (micros vectors) from a previous
    :func:`kmeans_fit` round.

    Scale shape: micros vector JVM-side (exact domain), then one
    Arrow-batched int64 kernel labels the whole batch (r14, guide
    §4.2 — the interpreted k×dim literal-HOF projection this replaced
    cost ~0.5 ms/row and re-planned a literal tree per call); no join,
    no shuffle; the only action is the bounded k-row init collect.
    Labels and dist2 are bit-identical (exact integers, first-minimum
    ties)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    if centroids is None:
        centroids = _default_centroids(embeddings, k, id_col, vec_col)
    cent = np.asarray(centroids, dtype=np.int64)
    d = cent.shape[1]
    iv_df = embeddings.select(id_col, _int_vec(vec_col).alias("_iv"))
    id_field = iv_df.schema[0]

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _stack_int_vecs("kmeans_assign", pdf["_iv"], d)
            cl, d2 = _coarse_assign(x, cent)
            yield pd.DataFrame(
                {
                    id_field.name: pdf[id_field.name],
                    "cluster": cl.astype(np.int32),
                    "dist2": d2,
                }
            )

    schema = StructType(
        [
            id_field,
            StructField("cluster", IntegerType()),
            StructField("dist2", LongType()),
        ]
    )
    return iv_df.mapInPandas(assign, schema)


def _default_centroids(
    embeddings: DataFrame, k: int, id_col: str, vec_col: str
) -> list[list[int]]:
    """The shared init rule: the ``k`` smallest-id vectors, as micros
    integers (fixed, engine-independent — one definition for assign AND
    fit so the two paths cannot drift)."""
    rows = (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(_int_vec(vec_col).alias("_iv"))
        .collect()
    )
    return [list(r._iv) for r in rows]


def _dist2_array(iv: Column, centroids: list[list[int]]) -> Column:
    """Per-centroid exact integer squared-L2 distances as one array
    expression (k×dim literals folded into whole-stage codegen)."""
    dists = [
        F.aggregate(
            F.zip_with(
                iv,
                F.array(*[F.lit(int(x)).cast("long") for x in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    return F.array(*dists)


def _round_half_away_ratio(s: int, n: int) -> int:
    """Half-away-from-zero rounding of the exact ratio s/n in pure
    integer arithmetic — the module's micros convention (Spark F.round /
    DuckDB ROUND). Python's round() is half-to-even and float division
    loses precision past 2^53, so neither belongs in centroid state."""
    sign = -1 if s < 0 else 1
    return sign * ((2 * abs(s) + n) // (2 * n))


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[int]], DataFrame]:
    """Full Lloyd iteration on top of :func:`kmeans_assign`: recompute
    centroids as per-cluster element-wise means (exact-integer
    half-away rounding, so the state stays integral, precision-safe
    past 2^53, and engine-independent), reassign, repeat. Returns
    (final centroids, assignment UNDER those final centroids — the
    returned pair is self-consistent; re-running kmeans_assign with the
    returned centroids reproduces it).

    Scale shape per round: ONE pass over embeddings — the cluster
    label is a pure codegen projection (the same distance-array
    expression kmeans_assign plans), so the per-round aggregate needs
    no join back on the id; the groupBy's map-side partial collapses to
    ≤ k×num_partitions rows and only the k×dim centroid matrix ever
    reaches the driver. Empty clusters keep their previous centroid
    (standard Lloyd fallback).
    """
    centroids = _default_centroids(embeddings, k, id_col, vec_col)
    if len(centroids) < k:
        raise ValueError(
            f"kmeans_fit: k={k} but the input has only {len(centroids)} "
            "rows; lower k or add data"
        )
    import numpy as np
    import pandas as pd

    dim = len(centroids[0])
    iv_df = embeddings.select(_int_vec(vec_col).alias("_iv"))
    for _ in range(iters):
        # One Arrow-batched pass per round (r14): each task labels its
        # batches with the vectorized integer kernel and pre-reduces to
        # per-cluster (count, element-wise sum) partials — ≤ k rows per
        # task, the same bounded driver transfer as the previous
        # groupBy+collect, without the dim-wide aggregate or the
        # interpreted k×dim literal-HOF distance projection.
        cent = np.asarray(centroids, dtype=np.int64)

        def partials(batches, cent=cent):
            acc_n = np.zeros(k, dtype=np.int64)
            acc_s = np.zeros((k, dim), dtype=np.int64)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _stack_int_vecs("kmeans_fit", pdf["_iv"], dim)
                cl, _ = _coarse_assign(x, cent)
                acc_n += np.bincount(cl, minlength=k)
                for j in np.unique(cl):
                    acc_s[j] += x[cl == j].sum(axis=0)
                seen = True
            if seen:
                yield pd.DataFrame(
                    {
                        "cluster": np.arange(k, dtype=np.int32),
                        "n": acc_n,
                        "sums": list(acc_s),
                    }
                )

        rows = iv_df.mapInPandas(
            partials, "cluster int, n long, sums array<bigint>"
        ).collect()
        tot_n = np.zeros(k, dtype=np.int64)
        tot_s = np.zeros((k, dim), dtype=np.int64)
        for r in rows:
            tot_n[r.cluster] += r.n
            tot_s[r.cluster] += np.asarray(r.sums, dtype=np.int64)
        centroids = [
            [
                _round_half_away_ratio(int(tot_s[j, i]), int(tot_n[j]))
                for i in range(dim)
            ]
            if tot_n[j]
            else centroids[j]
            for j in range(k)
        ]
    assigned = kmeans_assign(
        embeddings, k=k, id_col=id_col, vec_col=vec_col, centroids=centroids
    )
    return centroids, assigned


def pq_fit(
    embeddings: DataFrame,
    m: int = 4,
    kc: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Product-quantization codebooks (Jégou et al., "Product
    quantization for nearest neighbor search", TPAMI 2011): the d-dim
    embedding splits into m contiguous subspaces of d/m dims and the
    exact-integer Lloyd kmeans (:func:`kmeans_fit`) runs independently
    in each. Returns m codebooks of kc centroids in the micros domain
    — the whole model is m·kc·(d/m) integers, deterministic and
    engine-independent like every trained artifact in this module.

    Scale shape (r14, guide §1.2 — remove passes): the m per-subspace
    Lloyd fits are FUSED — one bounded init collect (the kc smallest-id
    vectors, sliced driver-side; round(x·1e6) is element-wise so the
    slice commutes with :func:`_int_vec`) and then ONE Arrow-batched
    pass over the embeddings per iteration that pre-reduces every
    subspace's per-cluster (count, element-wise sum) partials in-task —
    ≤ m·kc rows per task to the driver, and the corpus is scanned
    iters times total instead of m·iters times (the r13 shape ran m
    sequential :func:`kmeans_fit` jobs = m corpus passes per
    iteration). Codebooks are bit-identical: the same exact-integer
    assignment kernel (argmin first-minimum ties), the same half-away
    centroid rounding, and integer sums are order-independent."""
    import numpy as np
    import pandas as pd

    # width comes from the init collect itself (r15): a separate
    # first() was one more driver job per fit — and every E3 gate,
    # bench search row and streaming-ANN entry pays each fit job
    init_rows = (
        embeddings.orderBy(id_col)
        .limit(kc)
        .select(_int_vec(vec_col).alias("_iv"))
        .collect()
    )
    if not init_rows:
        raise ValueError("pq_fit: empty embeddings")
    d = len(init_rows[0]._iv)
    if m < 1 or d % m:
        raise ValueError(f"pq_fit: dim {d} not divisible by m={m}")
    sub = d // m
    if len(init_rows) < kc:
        raise ValueError(
            f"pq_fit: kc={kc} but the input has only {len(init_rows)} "
            "rows; lower kc or add data"
        )
    # (m, kc, sub): subspace s's init codebook is each init vector's
    # s-th slice — identical to the per-subspace _default_centroids
    cent = (
        np.stack([np.asarray(r._iv, dtype=np.int64) for r in init_rows])
        .reshape(kc, m, sub)
        .transpose(1, 0, 2)
        .copy()
    )
    iv_df = embeddings.select(_int_vec(vec_col).alias("_iv"))
    for _ in range(iters):
        cb = cent.copy()

        def partials(batches, cb=cb):
            acc_n = np.zeros((m, kc), dtype=np.int64)
            acc_s = np.zeros((m, kc, sub), dtype=np.int64)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                x3 = _stack_int_vecs("pq_fit", pdf["_iv"], d).reshape(
                    -1, m, sub
                )
                codes = _subspace_codes(x3, cb)  # (B, m)
                for s in range(m):
                    cl = codes[:, s]
                    acc_n[s] += np.bincount(cl, minlength=kc)
                    for j in np.unique(cl):
                        acc_s[s, j] += x3[cl == j, s].sum(axis=0)
                seen = True
            if seen:
                yield pd.DataFrame(
                    {
                        "s": np.repeat(np.arange(m, dtype=np.int32), kc),
                        "cluster": np.tile(np.arange(kc, dtype=np.int32), m),
                        "n": acc_n.ravel(),
                        "sums": list(acc_s.reshape(m * kc, sub)),
                    }
                )

        rows = iv_df.mapInPandas(
            partials, "s int, cluster int, n long, sums array<bigint>"
        ).collect()
        tot_n = np.zeros((m, kc), dtype=np.int64)
        tot_s = np.zeros((m, kc, sub), dtype=np.int64)
        for r in rows:
            tot_n[r.s, r.cluster] += r.n
            tot_s[r.s, r.cluster] += np.asarray(r.sums, dtype=np.int64)
        for s in range(m):
            for j in range(kc):
                if tot_n[s, j]:
                    cent[s, j] = [
                        _round_half_away_ratio(
                            int(tot_s[s, j, i]), int(tot_n[s, j])
                        )
                        for i in range(sub)
                    ]
    return [[[int(v) for v in cw] for cw in cent[s]] for s in range(m)]


def _subspace_codes(x3, cb):
    """Vectorized nearest-codeword index per subspace: ``x3`` is the
    int64 (batch, m, sub) micros tensor, ``cb`` the int64 (m, kc, sub)
    codebooks. Exact integer arithmetic via the expanded form
    |x|² − 2x·c + |c|² (no (batch, m, kc, sub) temporary), ties to the
    lowest index — argmin's first-minimum rule, identical to the JVM
    ``array_position(array_min(...))`` tie-break this replaced."""
    import numpy as np

    xx = (x3 * x3).sum(axis=2)  # (B, m)
    cc = (cb * cb).sum(axis=2)  # (m, kc)
    xc = np.einsum("bms,mks->bmk", x3, cb)  # exact int64, C loop not BLAS
    dist = xx[:, :, None] + cc[None, :, :] - 2 * xc  # (B, m, kc)
    return dist.argmin(axis=2).astype(np.int32)


def _stack_int_vecs(op: str, series, d: int):
    """(B, d) int64 matrix from a pandas Series of micros arrays, with
    the loud width refusal both encode entry points share."""
    import numpy as np

    ivs = series.to_numpy()
    for v in ivs:
        if v is None:
            # the named refusal the pre-r14 raise_error projection had:
            # len(None) would surface as an opaque TypeError (ADVICE r14)
            raise ValueError(f"{op}: NULL embedding")
        if len(v) != d:
            raise ValueError(
                f"{op}: embedding width {len(v)} != codebook width {d}"
            )
    return np.stack(ivs).astype(np.int64)


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per-subspace nearest-codeword index; the
    m-int code replaces the d-dim vector downstream (the compression
    that lets a 100 TB embedding corpus fit a scan). A vector whose
    width differs from the codebooks' m·(d/m) raises executor-side by
    name — slicing past a short array would otherwise emit silent null
    codes.

    Vectorized encode (r14, guide §4.2): the micros vector is computed
    JVM-side (:func:`_int_vec` — the exact element-wise domain, so no
    float rounding ever happens in Python) and whole Arrow batches hit
    one int64 einsum + argmin in numpy. The r13 staged-projection HOF
    form evaluated interpreted at ~0.5 ms/row AND re-planned a
    literal-heavy Catalyst tree per invocation (~1.8 s at m=4·kc=8);
    the batch kernel is ~1000× cheaper per row at ingest scale and the
    plan is one Project + one MapInPandas node. Codes are bit-identical
    (exact integers, argmin first-minimum tie-break = the old
    array_position(array_min) rule, pinned by
    test_pq_encode_matches_numpy_argmin)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m = len(codebooks)
    sub = len(codebooks[0][0])
    d = m * sub
    cb = np.asarray(codebooks, dtype=np.int64)  # (m, kc, sub)
    iv_df = embeddings.select(id_col, _int_vec(vec_col).alias("_iv"))
    id_field = iv_df.schema[0]

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x3 = _stack_int_vecs("pq_encode", pdf["_iv"], d).reshape(-1, m, sub)
            codes = _subspace_codes(x3, cb)
            yield pd.DataFrame(
                {id_field.name: pdf[id_field.name], "codes": list(codes)}
            )

    schema = StructType(
        [id_field, StructField("codes", ArrayType(IntegerType()))]
    )
    return iv_df.mapInPandas(encode, schema)


def pq_reconstruct(
    encoded: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Decompress (id, codes) back to an approximate embedding: the
    concatenation of each subspace's selected codeword (PQ's decoder).
    One JVM projection — the codebooks fold in as nested array
    literals, m element_at lookups + concat per row. The output is the
    micros codewords divided back to the float domain, so it round
    trips exactly through the module's ×1e6 quantization (|micros| ≪
    2⁵², so round(x/1e6·1e6) recovers the integer). By construction
    ‖q − reconstruct(x)‖² equals :func:`topk_pq`'s ADC distance — the
    identity the PQ gate pins."""
    parts = []
    for s, cb in enumerate(codebooks):
        lit_cb = F.array(*[F.array(*[F.lit(v) for v in cw]) for cw in cb])
        parts.append(
            F.element_at(lit_cb, F.element_at("codes", s + 1) + 1)
        )
    recon = F.transform(
        F.concat(*parts), lambda x: x.cast("double") / MICROS
    )
    return encoded.select(id_col, recon.alias(out_col))


def topk_l2(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by squared Euclidean distance in the integer micros
    domain — the exact counterpart of :func:`topk_pq`'s asymmetric
    approximation (PQ approximates L2, NOT cosine; gating PQ against a
    cosine ranking mixes metrics and fails on norm outliers). Entirely
    JVM-side: broadcast-NLJ over the (small) query set, integer fold
    distance, one window per query — the :func:`topk_quantized` shape.
    Output: (query_id, neighbor_id, dist2, rank), ties by neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _int_vec(vec_col).alias("_qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _int_vec(vec_col).alias("_cv")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist2", "rank")
    )


def topk_pq(
    candidates: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[int]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_limit: int = QUERY_COLLECT_LIMIT,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC): candidates
    carry only their m-int codes (:func:`pq_encode`, a projection);
    each query's m×kc table of EXACT integer sub-distances to every
    codeword is computed once from the bounded query collect (same cap
    + loud fallback posture as :func:`topk_bruteforce`) and broadcast
    as a flat array column; the approximate distance is an m-term JVM
    fold of table lookups — zero Python in the candidate path — and
    one window ranks per query (output-bounded |Q|·N broadcast-NLJ,
    the :func:`topk_quantized` shape).

    Output: (query_id, neighbor_id, dist2, rank) — dist2 the exact
    integer ADC distance in micros², rank 1..k, ties by neighbor_id.
    """
    import numpy as np

    _require_integral_ids(
        "topk_pq", id_col, queries=queries, candidates=candidates
    )
    m, kc = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _int_vec(vec_col).alias("_iv")
        )
        .limit(query_limit + 1)
        .collect()
    )
    if len(q_rows) > query_limit:
        raise ValueError(
            f"topk_pq: queries exceed query_limit={query_limit}; a "
            "corpus-sized query side is O(|Q|·|C|) however scheduled — "
            "use ann_lsh or raise query_limit explicitly"
        )
    spark = candidates.sparkSession
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, dist2 long, rank int"
        )
    cb = np.asarray(codebooks, dtype=np.int64)  # (m, kc, sub)
    qdf = spark.createDataFrame(
        [
            (
                int(r.query_id),
                [
                    int(v)
                    for v in (
                        (
                            np.asarray(r._iv, dtype=np.int64).reshape(m, sub)[
                                :, None, :
                            ]
                            - cb
                        )
                        ** 2
                    )
                    .sum(axis=2)
                    .ravel()
                ],
            )
            for r in q_rows
        ],
        "query_id long, _tbl array<bigint>",
    )
    enc = pq_encode(candidates, codebooks, id_col, vec_col).select(
        # long neighbor_id regardless of the candidates' integral id
        # dtype, so the empty-query branch's hardcoded schema and this
        # path agree (ADVICE r14; _require_integral_ids makes the cast
        # lossless)
        F.col(id_col).cast("long").alias("neighbor_id"),
        "codes",
    )
    joined = enc.crossJoin(F.broadcast(qdf)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    dist2 = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at(
            F.col("_tbl"),
            (s * kc + F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist2", "rank")
    )


def _centroid_literal(centroids: list[list[int]]) -> Column:
    """The coarse-centroid matrix as one nested array literal (kcoarse×d
    ints folded into whole-stage codegen — the same shape
    :func:`_dist2_array` plans, reused by every IVF-PQ projection)."""
    return F.array(
        *[F.array(*[F.lit(int(x)).cast("long") for x in c]) for c in centroids]
    )


def ivf_pq_fit(
    embeddings: DataFrame,
    kcoarse: int = 8,
    m: int = 4,
    kc: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[int]], list[list[list[int]]]]:
    """Train the IVF-ADC index of Jégou et al. (TPAMI 2011 §V): a coarse
    quantizer (:func:`kmeans_fit`, kcoarse cells) plus PQ codebooks
    trained on the RESIDUALS x − centroid[cell(x)] — residual energy is
    what the sub-quantizers should spend their codewords on, not the
    coarse structure the inverted file already captures. Returns
    (centroids, codebooks), both exact-integer micros artifacts.

    Scale shape: one Lloyd job for the coarse quantizer + m Lloyd jobs
    over a residual PROJECTION (cell assignment and subtraction fold
    into the scan — no join, no shuffle, no materialized residual
    corpus); only k×d-int matrices ever reach the driver."""
    centroids, _assigned = kmeans_fit(
        embeddings, k=kcoarse, iters=iters, id_col=id_col, vec_col=vec_col
    )
    # hand pq_fit the residuals in the float domain: |micros| ≪ 2⁵², so
    # its own ×1e6 quantization round-trips the integers exactly.
    # Staged (see pq_encode): the micros vector and the coarse distance
    # array each land in their own projection, and the residual itself
    # becomes a produced column — pq_fit's Lloyd expressions reference
    # vec_col many times per row, and an inlined residual tree would
    # re-derive the coarse assignment on every reference.
    df = embeddings.select(id_col, _int_vec(vec_col).alias("_iv"))
    df = df.select(
        id_col, "_iv", _dist2_array(F.col("_iv"), centroids).alias("_cd")
    )
    df = df.select(
        id_col,
        "_iv",
        (F.array_position("_cd", F.array_min("_cd")) - 1)
        .cast("int")
        .alias("_cell"),
    )
    resid = F.zip_with(
        F.col("_iv"),
        F.element_at(_centroid_literal(centroids), F.col("_cell") + 1),
        lambda a, b: a - b,
    )
    resid_df = df.select(
        id_col,
        F.transform(resid, lambda x: x.cast("double") / MICROS).alias(vec_col),
    )
    # persist for the duration of the residual fit (r15, guide §5):
    # pq_fit scans its input iters+1 times (init collect + one pass per
    # Lloyd iteration) and each scan would otherwise re-evaluate the
    # coarse-assignment + residual projection chain above; released
    # before returning — fits must not leak cached blocks
    resid_df = resid_df.persist()
    try:
        books = pq_fit(
            resid_df, m=m, kc=kc, iters=iters, id_col=id_col, vec_col=vec_col
        )
    finally:
        resid_df.unpersist()
    return centroids, books


def ivf_pq_encode(
    embeddings: DataFrame,
    centroids: list[list[int]],
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell int, codes array<int>): the inverted-list assignment and
    the residual PQ codes in a shuffle-free projection pipeline — the
    index a 100 TB embedding corpus stores instead of its vectors
    (4 + m ints per row). Width mismatches raise by name (the
    :func:`pq_encode` posture).

    Vectorized like :func:`pq_encode` (r14, guide §4.2): micros vector
    JVM-side, then one Arrow-batched int64 kernel does coarse argmin →
    residual → per-subspace argmin for the whole batch. Cell and codes
    are bit-identical to the r13 staged-HOF form (exact integers,
    first-minimum ties; pinned by test_ivf_pq_encode_matches_numpy),
    at ~1000× lower per-row cost and a literal-free plan."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m = len(codebooks)
    sub = len(codebooks[0][0])
    d = m * sub
    cent = np.asarray(centroids, dtype=np.int64)  # (kcoarse, d)
    cb = np.asarray(codebooks, dtype=np.int64)  # (m, kc, sub)
    iv_df = embeddings.select(id_col, _int_vec(vec_col).alias("_iv"))
    id_field = iv_df.schema[0]

    def encode(batches):
        cc = (cent * cent).sum(axis=1)  # (kcoarse,)
        for pdf in batches:
            if not len(pdf):
                continue
            x = _stack_int_vecs("ivf_pq_encode", pdf["_iv"], d)  # (B, d)
            # coarse assign via |x|² − 2x·c + |c|² (exact int64)
            d2 = (x * x).sum(axis=1)[:, None] + cc[None, :] - 2 * (x @ cent.T)
            cell = d2.argmin(axis=1)  # ties → lowest cell
            r3 = (x - cent[cell]).reshape(-1, m, sub)
            codes = _subspace_codes(r3, cb)
            yield pd.DataFrame(
                {
                    id_field.name: pdf[id_field.name],
                    "cell": cell.astype(np.int32),
                    "codes": list(codes),
                }
            )

    schema = StructType(
        [
            id_field,
            StructField("cell", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )
    return iv_df.mapInPandas(encode, schema)


def ivf_pq_reconstruct(
    encoded: DataFrame,
    centroids: list[list[int]],
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Decompress (id, cell, codes) to the IVF-ADC approximation
    x̂ = centroid[cell] + concat(codewords[codes]) — back in the float
    domain via the exact ×1e6 round trip. By construction
    ‖q − x̂‖² equals :func:`topk_ivf_pq`'s ADC distance (the residual
    form of the :func:`pq_reconstruct` identity), which is what the
    similarity_ivf_pq gate pins. Output keeps ``cell`` so the exact
    twin can replay the probe restriction."""
    parts = []
    for s, cb in enumerate(codebooks):
        lit_cb = F.array(*[F.array(*[F.lit(v) for v in cw]) for cw in cb])
        parts.append(F.element_at(lit_cb, F.element_at("codes", s + 1) + 1))
    recon = F.zip_with(
        F.element_at(_centroid_literal(centroids), F.col("cell") + 1),
        F.concat(*parts),
        lambda c, r: c + r,
    )
    return encoded.select(
        id_col,
        "cell",
        F.transform(recon, lambda x: x.cast("double") / MICROS).alias(out_col),
    )


def ivf_probe(
    queries: DataFrame,
    centroids: list[list[int]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cell, probe_rank): each query's ``nprobe`` nearest
    coarse cells by exact integer L2, ties to the lowest cell — the
    Spark-side statement of the probe rule :func:`topk_ivf_pq` applies
    driver-side, so the gate can replay probe selection through an
    independent engine path (posexplode + window over the same
    distance-array expression)."""
    arr = _dist2_array(_int_vec(vec_col), centroids)
    ex = queries.select(
        F.col(id_col).alias("query_id"), F.posexplode(arr).alias("cell", "_d2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d2").asc(), F.col("cell").asc()
    )
    return (
        ex.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", F.col("cell").cast("int").alias("cell"), "probe_rank")
    )


def topk_ivf_pq(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    codebooks: list[list[list[int]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_limit: int = QUERY_COLLECT_LIMIT,
    candidates_encoded: bool = False,
) -> DataFrame:
    """IVF-ADC search — the billion-scale composition of the inverted
    file and product quantization (Jégou et al. TPAMI 2011 §V, the
    FAISS ``IVFPQ`` shape): candidates carry (cell, codes) only
    (:func:`ivf_pq_encode`); each query probes its ``nprobe`` nearest
    coarse cells and gets ONE m×kc table of exact integer sub-distances
    per probed cell, built from the query RESIDUAL q − centroid[cell]
    (asymmetric distance, computed driver-side from the bounded query
    collect — same cap + loud posture as :func:`topk_pq`); the scan is
    a broadcast EQUI-join on ``cell`` — candidates outside the probed
    cells are never read, the inverted-file property that makes the
    search sub-linear — followed by the same zero-Python m-term ADC
    fold and one window per query.

    vs :func:`topk_pq`: the crossJoin over ALL candidates becomes an
    equi-join over ~nprobe/kcoarse of them; vs :func:`topk_ivf`: the
    probed candidates are m-int codes, not d-dim vectors. Output:
    (query_id, neighbor_id, dist2, rank) — dist2 the exact integer ADC
    distance in micros², ties by neighbor_id. Approximate by design:
    neighbors outside the probed cells are unreachable (raise nprobe
    to trade scan for recall).

    ``candidates_encoded=True`` takes ``candidates`` as the
    (id, cell, codes) output of :func:`ivf_pq_encode` instead of raw
    vectors — the production shape, where the index is computed once
    at ingest and searches scan 4+m ints per row, never the
    embeddings."""
    import numpy as np

    _require_integral_ids(
        "topk_ivf_pq", id_col, queries=queries, candidates=candidates
    )
    m, kc = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _int_vec(vec_col).alias("_iv")
        )
        .limit(query_limit + 1)
        .collect()
    )
    if len(q_rows) > query_limit:
        raise ValueError(
            f"topk_ivf_pq: queries exceed query_limit={query_limit}; a "
            "corpus-sized query side is O(|Q|·nprobe) probe tables "
            "however scheduled — use ann_lsh or raise query_limit "
            "explicitly"
        )
    spark = candidates.sparkSession
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, dist2 long, rank int"
        )
    cent = np.asarray(centroids, dtype=np.int64)  # (kcoarse, d)
    cb = np.asarray(codebooks, dtype=np.int64)  # (m, kc, sub)
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r._iv, dtype=np.int64)
        d2 = ((qv[None, :] - cent) ** 2).sum(axis=1)
        # ties to the lowest cell — the ivf_probe / kmeans_assign rule
        order = np.lexsort((np.arange(d2.shape[0]), d2))[:nprobe]
        for cell in order:
            rq = (qv - cent[cell]).reshape(m, 1, sub)
            tbl = ((rq - cb) ** 2).sum(axis=2).ravel()
            probe_rows.append(
                (int(r.query_id), int(cell), [int(v) for v in tbl])
            )
    qdf = spark.createDataFrame(
        probe_rows, "query_id long, cell int, _tbl array<bigint>"
    )
    if candidates_encoded:
        enc = candidates.select(id_col, "cell", "codes")
    else:
        enc = ivf_pq_encode(candidates, centroids, codebooks, id_col, vec_col)
    # long neighbor_id regardless of the candidates' integral id dtype,
    # so the empty-query branch's hardcoded schema and this path agree
    # (ADVICE r14; _require_integral_ids makes the cast lossless)
    enc = enc.select(
        F.col(id_col).cast("long").alias("neighbor_id"), "cell", "codes"
    )
    joined = enc.join(F.broadcast(qdf), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    dist2 = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at(
            F.col("_tbl"),
            (s * kc + F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist2", "rank")
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal by
    clustering embeddings and pruning within-cluster cosine neighbors —
    the method's point is that the cluster step bounds the quadratic
    pair search to cluster-sized blocks. Composition of this module's
    verified kernels: :func:`kmeans_assign` labels (deterministic
    smallest-id init unless ``centroids`` is passed, e.g. from
    :func:`kmeans_fit`), then :func:`cosine_pairs` with
    ``block_col="cluster"`` — the scale-safe equi-join path, never
    all-pairs — and the house drop rule (curation.py): a vector is
    ``dropped`` iff it has a >= threshold neighbor with a SMALLER id in
    its cluster, so the minimum-id representative always survives.

    Output: (vec_id, cluster, dropped) for EVERY input vector.
    Zero-norm vectors inherit cosine_pairs' guard: they never pair, so
    they are kept, never mass-dropped by NaN cosines.

    Scale shape: the centroid matrix folds into one codegen projection
    (no join for assignment); pairs come only from cluster blocks —
    pick ``k`` so clusters stay ~10^3-10^4 at the target corpus (the
    paper runs k in the tens of thousands at web scale); the drop list
    joins back WITHOUT a broadcast hint (it can be corpus-sized on a
    boilerplate-heavy corpus — AQE broadcasts it when it is small).
    """
    if centroids is None:
        centroids = _default_centroids(embeddings, k, id_col, vec_col)
    # staged (see pq_encode): the distance array in its own projection so
    # the two argmin references evaluate it once per row
    staged = embeddings.select(
        id_col,
        vec_col,
        _dist2_array(_int_vec(vec_col), centroids).alias("_d2a"),
    )
    clustered = track(
        staged.select(
            id_col,
            vec_col,
            (F.array_position("_d2a", F.array_min("_d2a")) - 1)
            .cast("int")
            .alias("cluster"),
        ).persist()
    )
    pairs = cosine_pairs(
        clustered, threshold, id_col, vec_col, block_col="cluster"
    )
    drop = pairs.select(F.col("id2").alias(id_col)).distinct()
    return (
        clustered.select(id_col, "cluster")
        .join(drop.withColumn("_d", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce("_d", F.lit(False)).alias("dropped"),
        )
    )


# --- PCA for embedding columns (E3 dimensionality reduction) -------------------


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> dict:
    """Deterministic PCA fit over an embedding column.

    The distributed work is ONE pass: per-partition numpy accumulates
    (n, Σv, Σ v·vᵀ) and the driver reduces partition-count-sized partial
    moments — the covariance is d×d (d = embedding width, here 64), so
    the driver-side eigendecomposition is microseconds and the shuffle
    ships d² doubles per partition, independent of row count (the same
    driver-traffic bound as kmeans_fit's k×d centroids).

    Determinism: the input moments are integer-free float sums computed
    in a FIXED partition-then-index order via float64 numpy (pairwise
    summation within a partition is deterministic for a fixed split);
    eigh on the fixed matrix is deterministic on one platform, and each
    component's sign is pinned (largest-|entry| coordinate positive),
    so repeated fits emit identical models.

    Returns {"mean": [d], "components": [k][d] (rows = top components,
    eigenvalue-descending), "explained": [k], "total_var": float}.
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partials(iterator):
        import numpy as np
        import pandas as pd

        for pdf in iterator:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0).tolist()],
                    "ss": [(m.T @ m).ravel().tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        # NULL vectors carry no moments (np.stack would die on None);
        # mixed-width vectors still fail loudly inside the stack
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r.n for r in rows)
    d = len(rows[0].s)
    if not 1 <= k <= d:
        raise ValueError(f"k={k} outside [1, {d}]")
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r.s)
        ss += np.asarray(r.ss).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: the largest-|entry| coordinate of each component
    # is positive (eigh's signs are arbitrary)
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained": evals[order].tolist(),
        "total_var": float(evals.sum()),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pc",
    whiten: bool = False,
) -> DataFrame:
    """Project embeddings onto the fitted components via one
    Arrow-batched kernel (r14, guide §4.2): an arrow-serialized
    pandas_udf over JUST the vector column — all other columns stay
    JVM-side — whose per-batch fold reproduces the r13 JVM HOF
    expression BIT-FOR-BIT: center (exact float→double widening, one
    elementwise subtract), then for each component a left-to-right
    j-ascending multiply-add chain (``for j: acc += c[i,j]·ctr[j]``,
    no BLAS matmul — pairwise/FMA reordering would drift the floats),
    then the optional whiten scale as one trailing multiply each.

    Why not the JVM expression: interpreted higher-order functions over
    a d×d literal matrix cost ~2 ms/row at d=64 (measured r14:
    4.3 s to rotate 2 000 rows — the dominant term of opq_fit, which
    materializes the rotation per alternation) and re-plan a
    4 096-literal Catalyst tree per invocation; the kernel is ~1000×
    cheaper per row and the plan is one ArrowEvalPython node. At-ingest
    only — searches never call this per candidate.

    ``whiten=True`` scales each output by 1/√eigenvalue (unit variance
    per component); components with eigenvalue ≤ 0 (numerical zeros
    past the data's rank) pass through unscaled rather than exploding.

    Null/width semantics match the old expression: a NULL vector or a
    width-mismatched vector yields an all-null projection array (the
    zip_with null-propagation result). A null ELEMENT inside a vector
    ALSO yields the all-null array, exactly like the JVM fold: numpy
    maps the null to NaN, the multiply-add chain poisons every
    component, and Arrow's NaN→null conversion on the return path
    restores SQL NULL (pinned by test_pca_transform_null_semantics)."""
    import numpy as np
    import pandas as pd

    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    explained = model.get("explained", [])
    k, d = comps.shape
    scales = np.asarray(
        [
            1.0 / math.sqrt(explained[ci])
            if whiten and ci < len(explained) and explained[ci] > 0
            else 1.0
            for ci in range(k)
        ],
        dtype=np.float64,
    )
    do_scale = bool((scales != 1.0).any())

    def _project(vs):
        vals = vs.to_numpy()
        ok = np.array(
            [v is not None and len(v) == d for v in vals], dtype=bool
        )
        out: list = [None] * len(vals)
        if ok.any():
            x = np.stack(
                [np.asarray(vals[i], dtype=np.float64) for i in np.flatnonzero(ok)]
            )
            ctr = x - mean[None, :]
            acc = np.zeros((x.shape[0], k), dtype=np.float64)
            for j in range(d):
                # j-ascending multiply-add — the JVM fold's exact order
                acc += comps[:, j][None, :] * ctr[:, j][:, None]
            if do_scale:
                acc = acc * scales[None, :]
            for row_i, flat_i in enumerate(np.flatnonzero(ok)):
                out[flat_i] = acc[row_i]
        for i in np.flatnonzero(~ok):
            # NULL vector or width mismatch → all-null array, the old
            # expression's zip_with null-propagation result
            out[i] = [None] * k
        return pd.Series(out)

    # typed wrapper from a non-PEP563 module (ADVICE r14): pandas_udf
    # needs resolved annotation objects for eval-type inference, and this
    # module's string annotations can't provide them
    from sids_data_pipeline_spark.functions.arrowudf import series_udf

    project = series_udf(_project, "array<double>")
    return df.withColumn(out_col, project(F.col(vec_col)))


def opq_rotate(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "embedding_rot",
) -> DataFrame:
    """Apply a d×d orthogonal rotation to an embedding column — the
    transform half of :func:`opq_fit`, and the at-ingest step of an
    OPQ deployment (rotate once when a vector arrives; all PQ encode/
    search runs in the rotated domain).

    Plan shape: :func:`pca_transform`'s Arrow-batched kernel with a
    ZERO mean — OPQ learns the rotation on raw vectors (any offset is
    absorbed by the codewords), so no centering; one ArrowEvalPython
    node, bit-identical to the r13 JVM HOF fold (see pca_transform)."""
    d = len(rotation)
    model = {
        "mean": [0.0] * d,
        "components": [[float(v) for v in row] for row in rotation],
        "explained": [],
    }
    return pca_transform(df, model, vec_col=vec_col, out_col=out_col)


def opq_fit(
    embeddings: DataFrame,
    m: int = 4,
    kc: int = 16,
    iters: int = 2,
    opq_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Optimized product quantization, non-parametric form (Ge et al.,
    "Optimized Product Quantization", CVPR 2013 §4): learn an
    orthogonal rotation R jointly with the PQ codebooks by alternating
    minimization of the quantization objective Σ‖R·x − q(R·x)‖² —

    * fix R → :func:`pq_fit` + :func:`pq_encode` in the rotated domain
      (exact sub-step: Lloyd + nearest-codeword both lower the SSE);
    * fix the codes → orthogonal Procrustes: with X the raw vectors and
      Y their reconstructed rotated codewords, the R minimizing
      ‖R·X − Y‖²_F is U·Vᵀ from the SVD of the d×d cross-covariance
      M = Y·Xᵀ (Schönemann 1966) — the closed form that distributes:
      executors reduce M and the SSE in one mapInPandas pass
      (d² doubles per partition, row-count-independent, the
      :func:`pca_fit` shuffle bound), the driver does one d×d SVD.

    Init is the paper's parametric solution (OPQ-P, §5): the full-rank
    PCA basis with EIGENVALUE ALLOCATION — principal directions are
    dealt to subspaces greedily so each subspace's variance PRODUCT
    balances (assign each eigenvalue, descending, to the non-full
    subspace with the smallest log-product). This is the step that
    fixes the failure mode a plain PCA rotation creates for PQ: energy
    piled into the first subspace starves the rest (on the gate's
    sharp-anisotropy fixture allocation alone cuts distortion ~14×);
    the NP iterations then refine from a sane start.

    Returns {"rotation": d×d floats, "codebooks": m×kc×(d/m) micros
    ints (trained in the FINAL rotated domain), "sse_trace": one
    micros² objective value per outer iteration plus the final refit —
    non-increasing up to Lloyd's finite-iteration tolerance; the OPQ
    gate pins final ≤ init}. Deterministic on one platform for a fixed
    input split (pca_fit/kmeans_fit conventions; LAPACK SVD on a fixed
    d×d matrix).

    Scale shape: every outer iteration is one rotate projection (staged
    literal matrix), one pq_fit (m sequential Lloyd jobs, bounded
    driver traffic), one encode+reconstruct projection, one equi-join
    on the id, and one moment pass — nothing corpus-sized reaches the
    driver; the rotated frame is persisted per iteration and released
    before the next (lifecycle.track/release)."""
    import numpy as np

    from sids_data_pipeline_spark import lifecycle

    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("opq_fit: empty embeddings")
    d = len(first[0])
    if m < 1 or d % m:
        raise ValueError(f"opq_fit: dim {d} not divisible by m={m}")
    if opq_iters < 1:
        raise ValueError(f"opq_fit: opq_iters must be >= 1, got {opq_iters}")

    raw = embeddings.select(id_col, vec_col).where(F.col(vec_col).isNotNull())
    pca = pca_fit(raw, k=d, vec_col=vec_col)
    comps = np.asarray(pca["components"], dtype=np.float64)
    evals = np.asarray(pca["explained"], dtype=np.float64)
    # eigenvalue allocation (OPQ-P): deal principal directions to the
    # m subspaces balancing each subspace's log-variance product; a
    # row permutation of an orthonormal basis stays orthonormal
    sub = d // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for idx in np.argsort(evals)[::-1]:
        b = min(
            (bb for bb in range(m) if len(buckets[bb]) < sub),
            key=lambda bb: (logs[bb], bb),
        )
        buckets[b].append(int(idx))
        logs[b] += float(np.log(max(evals[idx], 1e-300)))
    perm = [i for bucket in buckets for i in bucket]
    R = comps[perm]

    def fit_books(rot_df):
        return pq_fit(
            rot_df, m=m, kc=kc, iters=iters, id_col=id_col, vec_col=vec_col
        )

    def rotated(Rm):
        rot = (
            opq_rotate(raw, Rm.tolist(), vec_col=vec_col, out_col="_opq")
            .select(id_col, F.col("_opq").alias(vec_col))
            .persist()
        )
        return lifecycle.track(rot)

    def moments(rot, Rm, books):
        """One distributed pass: M = Σ y·xᵀ and SSE = Σ‖R·x − y‖² with
        y the reconstructed rotated codeword of x. ``rot`` is the
        already-persisted rotated frame for ``Rm`` (r14: reused from
        the fit step instead of re-materializing the rotation)."""
        yrec = pq_reconstruct(
            pq_encode(rot, books, id_col, vec_col), books,
            id_col=id_col, out_col="_y",
        )
        pair = raw.join(yrec, id_col).select(vec_col, "_y")
        Rl = Rm.copy()

        def partials(iterator):
            import numpy as np
            import pandas as pd

            for pdf in iterator:
                if not len(pdf):
                    continue
                X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                Y = np.stack(pdf["_y"].to_numpy()).astype(np.float64)
                yield pd.DataFrame(
                    {
                        "m": [(Y.T @ X).ravel().tolist()],
                        "sse": [float(((X @ Rl.T - Y) ** 2).sum())],
                    }
                )

        rows = pair.mapInPandas(
            partials, "m array<double>, sse double"
        ).collect()
        if not rows:
            raise ValueError("opq_fit: empty join of vectors and codes")
        M = np.zeros((d, d))
        sse = 0.0
        for r in rows:
            M += np.asarray(r.m).reshape(d, d)
            sse += r.sse
        # the SSE is measured on float reconstructions of micros
        # codewords vs float-rotated raw vectors: scale to micros² so
        # the trace reads in the module's integer distance domain
        return M, sse * MICROS * MICROS

    trace: list[float] = []
    books = None
    for _ in range(opq_iters):
        # one persisted rotation per alternation, shared by the fit and
        # the moment pass (r14 — the r13 shape materialized it twice)
        rot = rotated(R)
        books = fit_books(rot)
        M, sse = moments(rot, R, books)
        lifecycle.release(rot)
        trace.append(sse)
        U, _s, Vt = np.linalg.svd(M)
        R = U @ Vt
    # final refit under the last rotation so the returned pair is
    # self-consistent, plus its objective for the trace
    rot = rotated(R)
    books = fit_books(rot)
    _M, sse = moments(rot, R, books)
    lifecycle.release(rot)
    trace.append(sse)
    return {
        "rotation": R.tolist(),
        "codebooks": books,
        "sse_trace": trace,
    }


def topk_ivf_pq_refine(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    codebooks: list[list[list[int]]],
    k: int = 10,
    kprime: int = 100,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_limit: int = QUERY_COLLECT_LIMIT,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Two-stage retrieval — IVF-ADC shortlist, exact re-rank (the
    production refine pattern, e.g. FAISS ``IndexRefineFlat`` over
    ``IVFPQ``): :func:`topk_ivf_pq` retrieves ``kprime`` approximate
    neighbors per query from the code-only index, then the true
    integer squared-L2 is recomputed for ONLY those |Q|·k' pairs
    against the raw vectors and the top ``k`` re-ranked exactly.

    This attacks the miss regime the SCALECHECK recall sweep isolates:
    at production density quantization misses dominate (ADC cannot
    rank the true top-10 inside a probed cell) and raising nprobe buys
    nothing — but the true neighbors ARE in the shortlist at k' ≫ k,
    so an exact pass over k' rows recovers them. Recall becomes
    probe-limited only; distortion drops out entirely (returned dist2
    is the EXACT integer L2, bit-identical to :func:`topk_l2` for the
    same pairs — the identity the refine gate pins with k' = |corpus|,
    nprobe = kcoarse, where this operator must equal topk_l2 exactly).

    Scale shape: the shortlist (|Q|·k' ids) broadcasts against the raw
    vector table — a broadcast semi-gather, no shuffle of the big side;
    the query vectors broadcast next (bounded by ``query_limit``, the
    same cap the shortlist stage enforces); the exact distance is one
    zip_with/aggregate fold per surviving row and one window per query.
    The big side is scanned once per query batch reading (id, vec)
    only; co-locate or bucket the vector table by id to turn the
    gather into a pruned scan on a real lake.

    ``encoded`` passes the pre-encoded (id, cell, codes) index (the
    at-ingest shape) so ``candidates`` supplies only the raw vectors
    for the re-rank."""
    if k > kprime:
        raise ValueError(
            f"topk_ivf_pq_refine: k={k} > kprime={kprime}; the refine "
            "stage can only re-rank what the shortlist stage retrieved"
        )
    _require_integral_ids(
        "topk_ivf_pq_refine", id_col, queries=queries, candidates=candidates
    )
    enc = (
        encoded
        if encoded is not None
        else ivf_pq_encode(candidates, centroids, codebooks, id_col, vec_col)
    )
    short = topk_ivf_pq(
        enc, queries, centroids, codebooks, k=kprime, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, query_limit=query_limit,
        candidates_encoded=True,
    )
    cvec = candidates.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        _int_vec(vec_col).alias("_cv"),
    )
    qvec = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        _int_vec(vec_col).alias("_qv"),
    )
    gathered = cvec.join(
        F.broadcast(short.select("query_id", "neighbor_id")), "neighbor_id"
    ).join(F.broadcast(qvec), "query_id")
    dist2 = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    staged = gathered.select("query_id", "neighbor_id", dist2.alias("dist2"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        staged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist2", "rank")
    )
