"""A/B harness for the dedup_minhash_lsh / corpus_curation persist layouts.

Round-7 regression: commit a867624 removed the bucket-cap skip probe and
the token-table persist without measuring; steady-state went +73%/+69%.
This script measures each candidate layout in a fresh SparkSession using
the bench.py methodology (cold pass then timed steady-state pass).

Run: python tools/ab_dedup.py [variant ...]   (default: all four)
Variants: r7 (current), probe, probe_tok, window_cap
Each variant runs in its own child process so the monkeypatches never
stack.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANTS = ("r7", "probe", "probe_tok", "window_cap")


def apply_variant(name: str):
    """Monkeypatch dedup internals to the candidate layout."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sids_data_pipeline_spark.operators import dedup as D
    from sids_data_pipeline_spark.lifecycle import track

    if name == "r7":
        return

    if name in ("probe", "probe_tok"):
        def ndm(docs, threshold=0.2, num_hashes=D.DEFAULT_NUM_HASHES,
                bands=D.DEFAULT_BANDS, shingle_n=3, text_col="text",
                id_col="doc_id", max_bucket=D.DEFAULT_MAX_BUCKET):
            tok = (
                D.shingles(docs, shingle_n, text_col, id_col)
                .withColumnRenamed("shingle", "token")
                if shingle_n is not None
                else D.tokens(docs, text_col, id_col)
            )
            if name == "probe_tok":
                tok = track(tok.persist(StorageLevel.MEMORY_AND_DISK))
            sig = track(
                D.minhash_signature(tok, num_hashes, with_tokens=True)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            if max_bucket is not None and sig.limit(max_bucket + 1).count() <= max_bucket:
                max_bucket = None
            cand = D.lsh_candidate_pairs(sig.drop("_toks"), num_hashes, bands, max_bucket)
            scored = D.jaccard_on_pairs(
                tok, cand,
                sizes=sig.select("doc_id", "_toks", F.col("set_size").alias("_sz")),
            )
            return scored.filter(F.col("jaccard") >= threshold).select(
                "id1", "id2", F.round("jaccard", 6).alias("jaccard")
            )
        D.near_duplicates_minhash = ndm
    elif name == "window_cap":
        orig_lsh = D.lsh_candidate_pairs

        def lsh(sig, num_hashes=D.DEFAULT_NUM_HASHES, bands=D.DEFAULT_BANDS,
                max_bucket=None):
            if num_hashes % bands != 0:
                raise ValueError("bands")
            rows = num_hashes // bands
            stack_args = ", ".join(
                f"{b}, concat_ws(',', {', '.join(f'mh{b * rows + r}' for r in range(rows))})"
                for b in range(bands)
            )
            banded = sig.select(
                "doc_id",
                F.expr(f"stack({bands}, {stack_args}) AS (band_idx, band_val)"),
            )
            if max_bucket is not None:
                w = Window.partitionBy("band_idx", "band_val")
                banded = (
                    banded.withColumn("_n", F.count("*").over(w))
                    .filter(F.col("_n") <= max_bucket)
                    .drop("_n")
                )
            left = banded.alias("l")
            right = banded.alias("r")
            return (
                left.join(
                    right,
                    (F.col("l.band_idx") == F.col("r.band_idx"))
                    & (F.col("l.band_val") == F.col("r.band_val"))
                    & (F.col("l.doc_id") < F.col("r.doc_id")),
                )
                .select(F.col("l.doc_id").alias("id1"), F.col("r.doc_id").alias("id2"))
                .distinct()
            )
        D.lsh_candidate_pairs = lsh
    else:
        raise SystemExit(f"unknown variant {name}")

    # rebind in modules that imported the symbol directly (ext_queries
    # calls through the dedup module object, already patched)
    import sids_data_pipeline_spark.jobs.curation as cur
    if hasattr(cur, "near_duplicates_minhash"):
        cur.near_duplicates_minhash = D.near_duplicates_minhash


def run_variant(name: str) -> dict:
    apply_variant(name)
    from sids_data_pipeline_spark.plans.catalog import all_queries
    from sids_data_pipeline_spark.session import get_spark

    # EXACT bench.py methodology: one cold pass, then 5 passes with NO
    # cache release between them (CacheManager plan-matching means later
    # passes reuse persisted subtrees — that's what the driver measures).
    spark = get_spark("ab_dedup")
    qs = all_queries()
    out = {}
    for qname in ("dedup_minhash_lsh", "corpus_curation"):
        fn = qs[qname].spark
        fn(spark, SF_DIR).count()  # cold
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            times.append(time.perf_counter() - t0)
        out[qname] = round(min(times), 3)
        out[qname + "_med"] = round(sorted(times)[2], 3)
    spark.stop()
    return out


if __name__ == "__main__":
    import json
    import subprocess

    if os.environ.get("AB_DEDUP_CHILD") == "1":
        # child mode: one variant, fresh process (monkeypatches don't stack)
        (v,) = sys.argv[1:]
        print(json.dumps({v: run_variant(v)}), flush=True)
    else:
        requested = sys.argv[1:] or list(VARIANTS)
        unknown = [v for v in requested if v not in VARIANTS]
        if unknown:
            raise SystemExit(f"unknown variants {unknown}; choose from {VARIANTS}")
        for v in requested:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), v],
                capture_output=True, text=True,
                env={**os.environ, "AB_DEDUP_CHILD": "1"},
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            print(line[-1] if line else f"{v}: FAILED\n{p.stderr[-500:]}",
                  flush=True)
