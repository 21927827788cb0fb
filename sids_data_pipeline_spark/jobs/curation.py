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
    remove_span_grams: int | None = None,
) -> DataFrame:
    """Return the curated document set (all input columns).

    Near-dup removal keeps the LOWER id of each pair (consistent with
    exact dedup's keep-first), dropping every id that appears as the
    higher member of ANY near-duplicate pair — including pairs whose
    lower member was itself dropped, so transitive chains (0~2, 2~9)
    remove the whole tail. This is standard LSH-dedup practice (the
    alternative — re-admitting 9 because its only match was removed —
    needs the connected-components pass ``operators.graph`` provides for
    callers that want cluster-representative semantics).

    ``remove_span_grams=N`` (opt-in; default off so the driver-verified
    pipeline shape is unchanged) appends the Lee-et-al substring-dedup
    stage AFTER document-level dedup: repeated N-token spans are cut
    from the surviving texts (text.remove_duplicate_spans), replacing
    the ``text_col`` with the cleaned form (original casing preserved;
    only whitespace is normalized). Because cutting can shrink a doc
    below the quality bar — a fully-boilerplate doc becomes empty — the
    ``min_chars`` filter is re-applied to the cleaned text, so the
    curated output never contains documents the quality gate was meant
    to exclude. The survivor set is persisted for the span stage: its
    lineage (quality filter + sha2 dedup + banded LSH + anti-join) is
    consumed several times by the gram/token/rebuild branches, and
    without a persist the LSH shuffles would re-execute per branch.
    """
    quality = docs.filter(F.length(text_col) >= min_chars)
    survivors = exact_dedup(quality, [text_col], id_col)
    pairs = near_duplicates_minhash(
        survivors, threshold=jaccard_threshold, text_col=text_col, id_col=id_col
    )
    drop = pairs.select(F.col("id2").alias(id_col)).distinct()
    # NOT F.broadcast(drop): at corpus scale the drop list can be a
    # large fraction of all doc ids (dedup rates of 10-30% are normal),
    # far past any broadcast bound. The static plan shows a sort-merge
    # anti-join; AQE converts it to a broadcast join at runtime whenever
    # the materialized drop side is actually small — the right call on
    # BOTH ends of the scale without hard-coding either.
    kept = survivors.join(drop, id_col, "left_anti")
    if remove_span_grams is not None:
        from sids_data_pipeline_spark import lifecycle
        from sids_data_pipeline_spark.operators.text import (
            remove_duplicate_spans,
        )

        # The span stage fans `kept` out into several branches (gram
        # table, token table, rebuild base, outer join side); persist
        # once so the expensive dedup lineage runs once, not per branch.
        kept = lifecycle.track(kept.persist())
        cleaned = remove_duplicate_spans(
            kept, n=remove_span_grams, text_col=text_col, id_col=id_col
        )
        kept = (
            kept.drop(text_col)
            .join(
                cleaned.select(
                    F.col("doc_id").alias(id_col),
                    F.col("clean_text").alias(text_col),
                ),
                id_col,
            )
            # cutting spans can drop a doc below the quality bar (a
            # fully-duplicated doc becomes ''): re-apply the gate
            .filter(F.length(text_col) >= min_chars)
        )
    return kept


def curation_report(docs: DataFrame, curated: DataFrame) -> DataFrame:
    """One-row summary: input/output counts and removal ratio (micros)."""
    n_in = docs.count()
    n_out = curated.count()
    ratio = round((n_in - n_out) / n_in * 1_000_000) if n_in else 0
    return docs.sparkSession.createDataFrame(
        [(n_in, n_out, ratio)],
        "n_input long, n_kept long, removed_ratio_micros long",
    )


def run_curation_job(
    spark,
    docs: DataFrame,
    out_dir: str,
    benchmark: DataFrame | None = None,
    splits: dict[str, float] | None = None,
    shard_tokens: int = 50_000,
    min_chars: int = DEFAULT_MIN_CHARS,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> dict:
    """The full training-data preparation lifecycle as ONE job — the
    LLM-side twin of jobs/pipeline.run_pipeline:

        PII scrub → quality filter + exact dedup + near-dup removal
        (curate_corpus) → optional benchmark decontamination →
        leakage-stable train/val/test hash split → token-budget shard
        packing per split → parquet partitioned by (split, shard_id)

    Every stage is an already-oracle-verified operator; the job adds
    orchestration, materialization, and idempotency: a ledger file keyed
    by the config records completion, and a re-run with the same config
    does zero work (the reference's file-exists signature behavior,
    data.py:26-40, applied to corpus prep). Returns the manifest dict
    with per-stage counts.
    """
    import json
    import os

    from sids_data_pipeline_spark.sources.storage import (
        fs_delete,
        fs_read_text,
        fs_write_text,
    )

    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    config_key = json.dumps(
        {
            "min_chars": min_chars,
            "jaccard": jaccard_threshold,
            # ORDER-PRESERVING: hash_split assignment depends on label
            # order (cumulative thresholds, remainder to the last label),
            # so {'a':.5,'b':.5} and {'b':.5,'a':.5} are DIFFERENT
            # configs and must not share a ledger entry
            "splits": list(splits.items()),
            "shard_tokens": shard_tokens,
            "decontaminate": benchmark is not None,
        },
        sort_keys=True,
    )
    # Input signature: the ledger must not declare "done" for DIFFERENT
    # data under the same config (the reference keys its skip on the
    # input file's existence/signature, data.py:26-40). The logical-plan
    # hash pins the source identity (paths/plan shape); the row count is
    # one cheap metadata-aggregate action and catches in-place rewrites.
    n_input = docs.count()
    input_sig = f"{docs.semanticHash()}:{n_input}"
    # ledger IO goes through the Hadoop FS helpers so a remote out_dir
    # (s3a://, hdfs://) gets a working skip loop, not a local stray file
    ledger = os.path.join(out_dir, "_curation_ledger.json")
    prior_txt = fs_read_text(spark, ledger)
    if prior_txt is not None:
        prior = json.loads(prior_txt)
        if prior.get("config") == config_key and prior.get("input_sig") == input_sig:
            return {**prior["manifest"], "skipped": True}

    from sids_data_pipeline_spark import lifecycle
    from sids_data_pipeline_spark.operators.dedup import decontaminate
    from sids_data_pipeline_spark.operators.sampling import hash_split, pack_shards
    from sids_data_pipeline_spark.operators.text import scrub_pii, token_stats

    scrubbed = scrub_pii(docs).join(
        docs.drop("text"), "doc_id"
    )  # scrubbed text + original metadata columns
    curated = curate_corpus(
        scrubbed, min_chars=min_chars, jaccard_threshold=jaccard_threshold
    )
    if benchmark is not None:
        curated = decontaminate(curated, benchmark)

    labeled = hash_split(curated, splits)
    with_tokens = labeled.join(
        token_stats(labeled).select("doc_id", "n_words"), "doc_id"
    )
    # persist ONCE above the per-split fan-out: the token join reads
    # `labeled` twice and each split filter is another branch, so without
    # this the scrub → dedup → LSH → anti-join chain would re-execute up
    # to 2 × len(splits) times inside the single write job
    with_tokens = lifecycle.track(with_tokens.persist())
    # shards are per-split (a shard never mixes train/val/test rows);
    # pack_shards is a global scan per call, so pack each split and union
    per_split = [
        pack_shards(
            with_tokens.filter(F.col("split") == label),
            max_tokens=shard_tokens,
            size_col="n_words",
            order_col="doc_id",
        )
        for label in splits
    ]
    from functools import reduce

    sharded = reduce(lambda a, b: a.unionByName(b), per_split)
    data_dir = os.path.join(out_dir, "data")
    shard_stats: dict = {}
    if with_tokens.take(1):
        sharded.write.mode("overwrite").partitionBy("split", "shard_id").parquet(
            data_dir
        )
        # ONE aggregate over the written output serves the whole report —
        # n_curated included (split/shard assignment drops no rows), so
        # the curation chain executes exactly once (the write) instead of
        # once per report count.
        written = spark.read.parquet(data_dir)
        shard_stats = {
            r.split: {"docs": r.docs, "shards": r.shards}
            for r in written.groupBy("split")
            .agg(
                F.count("*").alias("docs"),
                F.countDistinct("shard_id").alias("shards"),
            )
            .collect()
        }
    else:
        # curation removed every document — a partitioned write of an
        # empty frame emits no data files and the read-back would abort
        # with UNABLE_TO_INFER_SCHEMA, so record the empty manifest; ALSO
        # clear any stale parquet a previous run (different config) left
        # at data_dir, or a reader following the manifest would see the
        # old corpus next to n_curated=0
        fs_delete(spark, data_dir)
    lifecycle.release(with_tokens)
    n_curated = sum(v["docs"] for v in shard_stats.values())
    manifest_out = {
        "n_input": n_input,
        "n_curated": n_curated,
        "splits": shard_stats,
        "out": data_dir,
    }
    fs_write_text(
        spark,
        ledger,
        json.dumps(
            {"config": config_key, "input_sig": input_sig, "manifest": manifest_out}
        ),
    )
    return {**manifest_out, "skipped": False}
