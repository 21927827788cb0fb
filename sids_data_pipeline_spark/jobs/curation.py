"""Corpus curation — the LLM-training-data flagship pipeline.

Composes the EXT operators into the shape every large-scale text
pipeline runs (BASELINE.json north star; no reference counterpart):

    quality filter → exact dedup (keep-first) → MinHash-LSH near-dup
    removal (drop the higher-id member of each near-duplicate pair)

Each stage is the already-verified operator; the composition is itself
registered as a catalog query whose DuckDB oracle mirrors the whole
chain value-for-value — so the gate checks the pipeline, not just its
pieces. At corpus scale the plan is: one filter (pushed to the scan),
one sha2 shuffle, the banded-LSH shuffles, and one final anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    near_duplicates_minhash,
)

DEFAULT_MIN_CHARS = 20
DEFAULT_JACCARD = 0.2


def curate_corpus(
    docs: DataFrame,
    min_chars: int = DEFAULT_MIN_CHARS,
    jaccard_threshold: float = DEFAULT_JACCARD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return the curated document set (all input columns).

    Near-dup removal keeps the LOWER id of each pair (consistent with
    exact dedup's keep-first), dropping every id that appears as the
    higher member of any surviving near-duplicate pair.
    """
    quality = docs.filter(F.length(text_col) >= min_chars)
    survivors = exact_dedup(quality, [text_col], id_col)
    pairs = near_duplicates_minhash(
        survivors, threshold=jaccard_threshold, text_col=text_col, id_col=id_col
    )
    drop = pairs.select(F.col("id2").alias(id_col)).distinct()
    return survivors.join(drop, id_col, "left_anti")


def curation_report(docs: DataFrame, curated: DataFrame) -> DataFrame:
    """One-row summary: input/output counts and removal ratio (micros)."""
    n_in = docs.count()
    n_out = curated.count()
    ratio = round((n_in - n_out) / n_in * 1_000_000) if n_in else 0
    return docs.sparkSession.createDataFrame(
        [(n_in, n_out, ratio)],
        "n_input long, n_kept long, removed_ratio_micros long",
    )
