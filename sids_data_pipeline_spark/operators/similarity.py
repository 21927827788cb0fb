"""Similarity search over embedding columns (EXT E3 — SURVEY.md §2b).

Two paths, mirroring the dedup family's correctness/scale split:

- :func:`topk_bruteforce` — exact top-k cosine neighbors. The dot product
  runs JVM-side with array higher-order functions (``zip_with`` +
  ``aggregate``) in an exact integer domain (each component is rounded to
  micros first — see plans/base.py determinism policy), so the score is
  bit-identical across engines and partitionings. The query side is
  broadcast: at 100 TB the candidate table streams past a small query set
  with no shuffle until the final per-query top-k window.
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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

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


def topk_bruteforce(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken
    by neighbor_id so results are total-order deterministic.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_iv").alias("_qv"),
        F.col("_norm2").alias("_qn"),
    )
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "_iv", "_norm2"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
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
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


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
    """
    e = with_norm(embeddings, vec_col)
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
) -> DataFrame:
    """Approximate top-k via random-hyperplane bucketing + exact re-rank.

    BucketedRandomProjectionLSH generates candidates from matching
    buckets only; the exact integer-domain cosine re-ranks them. Recall
    is spot-checked against :func:`topk_bruteforce` in tests. Seeded —
    deterministic run-to-run — but not SQL-reproducible, so the driver
    records the weaker rows-only check for this one.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

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
        model.transform(cand), model.transform(q), 10.0, distCol="_dist"
    ).select(
        F.col("datasetB.query_id").alias("query_id"),
        F.col("datasetA.neighbor_id").alias("neighbor_id"),
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
